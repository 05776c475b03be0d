"""Ragged contiguous segment-sum as a Pallas kernel.

Reduces per-key gradient rows (in ORIGINAL key order, where each point's
keys are contiguous: lanes [offsets[p], offsets[p] + counts[p])) to
per-point rows. Replaces the reference backward's atomic adds into
per-point buffers (GaussianPointCloudRasterisation.py:674-696).

Why a kernel: XLA's scatter-add / segment_sum on TPU measured ~170-200 ms
for 2M x 12 rows; a prefix-sum + boundary-gather alternative is fast but
numerically unsafe (cancellation against the global prefix magnitude).
This kernel streams the rows once per point-block (sequential grid) and
resolves key->point ownership with a boolean membership matrix contracted
on the MXU:
  out_block (PB, R) += member (PB, WINDOW) @ rows_window (R, WINDOW)^T.

The grid is ~N/PB tiny sequential steps, so DMA latency (not bandwidth or
compute) is the cost driver: the kernel keeps a 3-slot DMA ring whose issue
counter lives in SMEM scratch and persists across grid steps — each block
issues the NEXT block's first window before it finishes, so every wait hits
an already-in-flight copy.

The caller needs NO padding and NO masking of the rows:
- windows are clamped to the array end; the membership mask additionally
  restricts each window to its unclamped [w*WINDOW, (w+1)*WINDOW) span so
  clamp-induced overlaps never double count (segments end <= cols anyway);
- lanes beyond the written prefix must be ZEROS, not garbage (0 * NaN
  poisons the matmul) — the blend backward guarantees this by aliasing a
  zero-filled buffer as its output.

Input rows are struct-of-arrays (R, cols) like the blend kernels' output;
DMA windows are (R, WINDOW) at WINDOW-aligned lane offsets (membership
masking makes the extra lanes harmless).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dot_bf16x3(exact_bf16_lhs, rows_f32, dims):
    """f32-exact matmul in 3 native MXU passes instead of HIGHEST's 6+.

    Requires the lhs to be EXACTLY representable in bf16 (0/1 membership
    matrices here). The f32 rhs splits into three bf16 terms whose sum
    reconstructs every f32 exactly (Dekker splitting: 3 x 8 mantissa bits
    cover the 24-bit significand), each accumulated in f32 on the MXU.
    """
    lhs = exact_bf16_lhs.astype(jnp.bfloat16)
    hi = rows_f32.astype(jnp.bfloat16)
    r1 = rows_f32 - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    out = None
    for part in (hi, mid, lo):
        # precision=DEFAULT: operands are intentionally bf16; an ambient
        # "highest" default would stamp contract_precision<fp32> onto a
        # bf16 matmul, which Mosaic rejects ("Bad lhs type")
        t = jax.lax.dot_general(lhs, part, dims,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        out = t if out is None else out + t
    return out


def dot_bf16x3_fused(member, rows_f32):
    """dot_bf16x3 for (PB, win) @ (R, win)^T with the three Dekker terms
    CONCATENATED along R into ONE matmul: the MXU schedules 128-lane
    output tiles, so three passes at R=16 each waste 7/8 of the array —
    one pass at 3R=48 columns does the same flops-that-matter in a third
    of the array time. Each per-term product is identical to dot_bf16x3's;
    only the f32 sum order changes (terms combine before the window
    accumulator instead of interleaved with it) — a <= 1-ulp-class
    reassociation, well inside the gradient tests' tolerances.
    """
    r = rows_f32.shape[0]
    lhs = member.astype(jnp.bfloat16)
    hi = rows_f32.astype(jnp.bfloat16)
    r1 = rows_f32 - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    stacked = jnp.concatenate([hi, mid, lo], axis=0)        # (3R, win)
    out = jax.lax.dot_general(
        lhs, stacked, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)                 # (PB, 3R)
    return (out[:, 0:r] + out[:, r:2 * r]) + out[:, 2 * r:3 * r]

WINDOW = 1024        # lanes per DMA/matmul step
POINT_BLOCK = 512    # points per grid step (swept on-chip at bench shapes:
                     # 512/1024 = 2.09 ms vs 1024/1024 = 2.55 ms vs
                     # 2048/1024 = 3.76 ms — smaller blocks cut the
                     # per-window matmul/mask cost faster than the extra
                     # grid steps add overhead; scripts/segreduce_tune.py)


def _kernel(
    # scalar prefetch
    block_lo_ref, block_hi_ref,
    # inputs
    offsets_ref,   # (1, PB, 2) block slice of [seg_lo, seg_hi], in VMEM
    rows_hbm,      # (R, cols) per-key rows, HBM
    # outputs
    out_ref,       # (1, PB, R) per-point sums
    # scratch
    row_ref, first_ref, sem,
    *, cols: int, win: int,
):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    def lo_aligned(blk):
        return (block_lo_ref[blk] // win) * win

    def win_base(blk, w):
        # clamp so the DMA never reads past the array: segments end at
        # <= total <= cols, so lanes the clamp drops belong to no segment
        base = jnp.minimum(lo_aligned(blk) + w * win, cols - win)
        return pl.multiple_of(base, win)

    def nwin_of(blk):
        # always >= 1: a degenerate block still processes one (fully
        # membership-masked) window so the DMA ring stays uniform — every
        # issued copy is waited exactly once
        return jnp.maximum(
            pl.cdiv(block_hi_ref[blk] - lo_aligned(blk), win), 1)

    def issue(blk, w, slot):
        pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(win_base(blk, w), win)],
            row_ref.at[slot], sem.at[slot],
        ).start()

    @pl.when(b == 0)
    def _():
        first_ref[0] = 0
        issue(0, 0, 0)

    first = first_ref[0]
    nwin = nwin_of(b)
    lo_al = lo_aligned(b)

    off_lo = offsets_ref[0, :, 0:1]   # (PB, 1) segment starts
    off_hi = offsets_ref[0, :, 1:2]   # (PB, 1) segment ends

    def body(w, acc):
        # keep the ring full: issue the next window (this block's w+1, or
        # the next block's first) before waiting on the current one
        @pl.when(w + 1 < nwin)
        def _():
            issue(b, w + 1, (first + w + 1) % 3)

        @pl.when(jnp.logical_and(w + 1 >= nwin, b + 1 < nb))
        def _():
            issue(b + 1, 0, (first + w + 1) % 3)

        slot = (first + w) % 3
        pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(win_base(b, w), win)],
            row_ref.at[slot], sem.at[slot],
        ).wait()
        gid = win_base(b, w) + jax.lax.broadcasted_iota(
            jnp.int32, (offsets_ref.shape[1], win), 1
        )  # ABSOLUTE key index per loaded lane, broadcast over points
        # intersect each segment with this window's unclamped span at the
        # (PB, 1) bounds instead of AND-ing a second (PB, win) span mask
        # (exclusivity under end-of-array clamping: re-read lanes must
        # contribute only in their own window) — halves the mask VPU work,
        # which dominates this kernel
        lo_w = jnp.maximum(off_lo, lo_al + w * win)
        hi_w = jnp.minimum(off_hi, lo_al + (w + 1) * win)
        member = jnp.logical_and(gid >= lo_w, gid < hi_w)
        return acc + dot_bf16x3_fused(member, row_ref[slot])

    out_ref[0] = jax.lax.fori_loop(
        0, nwin, body,
        jnp.zeros((offsets_ref.shape[1], rows_hbm.shape[0]), jnp.float32),
    )

    first_ref[0] = (first + nwin) % 3


def segment_reduce(
    rows: jnp.ndarray,      # (R, cols) per-key rows, original order (SoA)
    offsets: jnp.ndarray,   # (N,) exclusive cumsum of counts
    counts: jnp.ndarray,    # (N,)
    *, interpret: bool = False,
) -> jnp.ndarray:
    """Per-point sums (N_padded_to_block, R).

    ``rows`` lanes not covered by any segment must be zero (not NaN);
    segment ends must be <= cols. Sublane count R and the lane count are
    padded internally (8-multiple / WINDOW-multiple respectively).
    """
    r_in = rows.shape[0]
    r = ((r_in + 7) // 8) * 8  # Mosaic DMAs need 8-multiple sublane counts
    if r != r_in:
        rows = jnp.concatenate(
            [rows, jnp.zeros((r - r_in, rows.shape[1]), rows.dtype)], axis=0)
    cols = rows.shape[1]
    win = min(WINDOW, cols)
    if cols % win != 0:
        # small eighth-octave key caps (< 2^15) need not divide the window;
        # the pad lanes are zero and outside every segment
        rows = jnp.pad(rows, ((0, 0), (0, win - cols % win)))
        cols = rows.shape[1]
    n = offsets.shape[0]
    pb = min(POINT_BLOCK, max(((n + 127) // 128) * 128, 128))
    nb = (n + pb - 1) // pb
    n_pad = nb * pb
    seg_lo = jnp.pad(offsets, (0, n_pad - n))
    seg_hi = jnp.pad(offsets + counts, (0, n_pad - n))
    block_lo = seg_lo[::pb].astype(jnp.int32)
    block_hi = jnp.maximum(
        seg_hi.reshape(nb, pb).max(axis=1), block_lo
    ).astype(jnp.int32)
    off_pair = jnp.stack([seg_lo, seg_hi], axis=-1).reshape(nb, pb, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, pb, 2), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, pb, r), lambda b, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, r, win), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, cols=cols, win=win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, pb, r), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(block_lo, block_hi, off_pair.astype(jnp.int32), rows)
    return out.reshape(n_pad, r)[:, :r_in]
