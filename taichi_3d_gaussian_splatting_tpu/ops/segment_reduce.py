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
on the MXU, in the SoA-rows orientation (keys on sublanes, points on
lanes — both the bounds input and the output then avoid 1-D <-> tiled
relayouts on the caller, ~4 ms/step at 428k):
  out_block (R, PB) += rows_window (R, WINDOW) @ member_T (WINDOW, PB).

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


def dot_bf16x3_rows(rows_f32, member_t):
    """Per-point sums as SoA ROWS: (R, win) @ (win, PB) -> (R, PB), with
    the three Dekker bf16 terms CONCATENATED along R into ONE matmul (the
    MXU schedules 128-lane output tiles, so three passes at R=16 each
    waste 7/8 of the array). Each per-term product is exact (0/1
    membership rhs); only the f32 sum order differs from a HIGHEST
    matmul — a <= 1-ulp-class reassociation, inside every gradient gate.
    """
    r = rows_f32.shape[0]
    rhs = member_t.astype(jnp.bfloat16)
    hi = rows_f32.astype(jnp.bfloat16)
    r1 = rows_f32 - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    stacked = jnp.concatenate([hi, mid, lo], axis=0)        # (3R, win)
    out = jax.lax.dot_general(
        stacked, rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)                 # (3R, PB)
    return (out[0:r] + out[r:2 * r]) + out[2 * r:3 * r]

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
    bounds_ref,    # (2, PB) block slice of [seg_lo; seg_hi] f32, in VMEM
                   # (points on LANES: the host passes plain (2, N) rows,
                   # avoiding the 1-D -> (nb, PB, 2) relayout that cost
                   # ~2.3 ms/step at 428k points — profiled r4)
    rows_hbm,      # (R, cols) per-key rows, HBM
    # outputs
    out_ref,       # (R, PB) per-point sums (SoA rows, matching rows_hbm)
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

    off_lo = bounds_ref[0:1, :]   # (1, PB) segment starts, f32 exact ints
    off_hi = bounds_ref[1:2, :]   # (1, PB) segment ends

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
        # TRANSPOSED membership: keys on SUBLANES, points on LANES, so
        # the reduction is rows (3R, win) @ member_T (win, PB) -> (3R, PB)
        # and the kernel emits SoA rows directly (row slices downstream
        # are contiguous; the old (PB, R) orientation forced ~2 ms of
        # column-slice relayouts on the caller)
        # integer iota (tpu.iota requires int results), then f32 compare
        gid = (win_base(b, w).astype(jnp.float32)
               + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
               .astype(jnp.float32))
        # intersect each segment with this window's unclamped span at the
        # (1, PB) bounds instead of AND-ing a second (win, PB) span mask
        # (exclusivity under end-of-array clamping: re-read lanes must
        # contribute only in their own window) — halves the mask VPU work,
        # which dominates this kernel
        lo_w = jnp.maximum(off_lo, (lo_al + w * win).astype(jnp.float32))
        hi_w = jnp.minimum(off_hi,
                           (lo_al + (w + 1) * win).astype(jnp.float32))
        member_t = jnp.logical_and(gid >= lo_w, gid < hi_w)  # (win, PB)
        return acc + dot_bf16x3_rows(row_ref[slot], member_t)

    out_ref[:] = jax.lax.fori_loop(
        0, nwin, body,
        jnp.zeros((rows_hbm.shape[0], bounds_ref.shape[1]), jnp.float32),
    )

    first_ref[0] = (first + nwin) % 3


def segment_reduce(
    rows: jnp.ndarray,      # (R, cols) per-key rows, original order (SoA)
    offsets: jnp.ndarray,   # (N,) exclusive cumsum of counts
    counts: jnp.ndarray,    # (N,)
    *, interpret: bool = False,
) -> jnp.ndarray:
    """Per-point sums as SoA rows (R, N_padded_to_block) — same
    orientation as ``rows``, so downstream per-field extraction is
    contiguous row slicing (the old (N, R) orientation forced ~2 ms of
    column-slice relayouts at 428k points).

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
    # exactness precondition for the f32 bounds/iota below: fail loudly
    # instead of silently corrupting membership intervals (mirrors
    # bucket_histogram's guard; fit_key_cap is otherwise unbounded)
    assert cols < 2 ** 24, (
        f"segment_reduce: {cols} key lanes exceed the f32-exact bound 2^24")
    n = offsets.shape[0]
    pb = min(POINT_BLOCK, max(((n + 127) // 128) * 128, 128))
    nb = (n + pb - 1) // pb
    n_pad = nb * pb
    # segment bounds ride as TWO (n_pad,) f32 lane rows (exact for key
    # totals < 2^24, the pipeline-wide bound): plain 1-D -> (2, n_pad)
    # stacking, no (nb, PB, 2) tiled relayout
    seg_lo = jnp.pad(offsets, (0, n_pad - n)).astype(jnp.float32)
    seg_hi = jnp.pad(offsets + counts, (0, n_pad - n)).astype(jnp.float32)
    block_lo = seg_lo[::pb].astype(jnp.int32)
    block_hi = jnp.maximum(
        seg_hi.reshape(nb, pb).max(axis=1).astype(jnp.int32), block_lo)
    bounds = jnp.stack([seg_lo, seg_hi], axis=0)  # (2, n_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((2, pb), lambda b, *_: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (r, pb), lambda b, *_: (0, b),
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
        out_shape=jax.ShapeDtypeStruct((r, n_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(block_lo, block_hi, bounds, rows)
    return out[:r_in]
