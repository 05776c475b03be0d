"""Pallas key-expansion kernel: per-point rows -> per-key rows + sort keys.

Behavioral reference: GaussianPointCloudRasterisation.py:131-172 (K3,
generate_point_sort_key_by_num_overlap_tiles) — each visible splat emits one
key per covered tile at slots [offset, offset + count). The reference
scatters from a point-parallel CUDA kernel; XLA's scatter lowering makes the
equivalent diff-scatter + cumsum broadcast cost ~19 ms at 2M key slots
(see the tpu-v5e cost notes in ops/tiling.py).

TPU-native design: the expansion is a one-hot MATMUL. Key slots are tiled
into windows; for each window the kernel loads the candidate point columns
(points are intervals in key-slot space, so a window's candidates are one
contiguous run of at most `window+1` points once zero-count points are
partitioned out) and broadcasts every per-point column to its key slots with

    E (16, SUBKEYS) = cand_cols (16, CSUB) @ member (SUBKEYS, CSUB)^T

where member[k, i] = (off_i <= k < off_i + cnt_i). Each key column has
EXACTLY ONE nonzero, so the f32 HIGHEST matmul is bit-exact (the bf16x3
decomposition of an f32 reconstructs it exactly; products are x 1.0).

From the expanded meta columns the kernel decodes the covered-tile id
(u-major within the bbox, matching reference :152-157), fuses it with the
fixed-point depth key into one int32 sort key, converts splat centers to
tile-local coordinates, and emits the (16, key_cap) blend attribute table
in pre-sort key order — every column then rides `lax.sort` as payloads,
which measure ~free, replacing a 15 ms post-sort row gather.

With ``exact_cull`` the kernel additionally retires (point, tile) pairs
whose Gaussian never reaches the 1/255 alpha threshold anywhere in the
tile (exact convex-quadratic minimum over the tile's pixel-center rect,
with a small margin so fp jitter between this test and the blend kernel's
per-pixel alpha test can never disagree): the rectangular bbox enumeration
emits keys for corner tiles the ellipse misses, and sending them to the
sentinel shrinks every tile's blend range (~15-25% of live keys on
typical scenes) with output-identical results.

Candidate layout (16, n_pad) f32 SoA (minor dim = points: Mosaic requires
128-lane-aligned slices, so the point axis must be the lane axis). The
kernel's actual invariant is only that real lanes' offsets are
NON-DECREASING and zero-count lanes are inert (empty membership interval;
lanes excluded from window-start counting carry PAD_OFF). Partition mode
satisfies it with a count>0 prefix (original relative order preserved);
direct candidate mode keeps original point order, interleaving zero-count
lanes into the runs (see tiling.py) — do not assume PAD_OFF on every
cnt==0 lane. Rows:
  row 0 off (first key slot)   1 cnt (covered tiles)  2 dkey (depth key)
  row 3 base (first tile id)   4 h (bbox tile height) 5 pidx (pool slot)
  rows 6..15: u, v, conic_a, conic_b, conic_c, log(rescale*opacity),
              r, g, b, depth  (pre-sanitized, global pixel coords)
All integer rows are exact in f32 (requires total keys < 2^24, the same
bound the f32 offset cumsum already imposes).

Output table rows (16, key_cap), pre-sort key order:
  0..9 u_local, v_local, a, b, c, logro, r, g, b, depth   10 pidx
  11..15 zero — matching blend_pallas's table contract after sorting.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST

WKEYS = 4096     # key slots per grid step (fewer, fatter steps: the DMA
                 # and scalar-prefetch overheads halved vs 2048 at equal
                 # matmul work)
SUBKEYS = 512    # key slots per inner matmul tile
CAND_CAP = 4352  # candidate lanes DMA'd per step (>= WKEYS + 1 + 128 align)
CSUB = 640       # candidate lanes per inner matmul tile (>= SUBKEYS+1+128)
MAX_CAND_SCALE = 8  # direct-mode window-scale ceiling: VMEM scratch grows
                 # (2, 16, CAND_CAP*scale) f32 (~557 KB/step); above this,
                 # callers fall back to partition mode
ALIGN = 128      # lane alignment of every dynamic slice
PAD_OFF = float(1 << 30)  # off value of non-key-owning candidate lanes
LOG255 = 5.541263545158426  # log(255): the 1/255 alpha-skip in log space


def window_size(key_cap: int) -> int:
    """Key slots per grid step: largest power-of-two divisor of key_cap,
    capped at WKEYS. fit_key_cap produces (m/8)*2^k caps, which below 2^15
    can be odd multiples of 512 (e.g. 6144) that WKEYS does not divide."""
    return min(WKEYS, key_cap & (-key_cap))
CULL_MARGIN = 1e-3  # keep pairs within fp jitter of the alpha threshold:
                    # the cull and the blend evaluate the quadratic with
                    # different fp expressions, so an exactly-threshold
                    # alpha could otherwise flip between them


def _expand_kernel(
    # scalar prefetch
    lo_ref,        # (nw,) int32 first candidate lane per window (128-aligned)
    lim_ref,       # (2,) int32: [min(total, cap), sentinel_key]
    # inputs
    cand_hbm,      # (16, n_pad) f32 candidate columns
    # outputs
    fused_ref,     # (1, wk) int32 fused sort keys
    tbl_ref,       # (16, wk) f32 attribute table (pre-sort order)
    # scratch
    cand_ref, sem,
    *, wk: int, sub: int, cand_cap: int, csub: int, nw: int,
    tiles_u: int, tile_w: int, tile_h: int, dbits: int, num_tiles: int,
    exact_cull: bool,
):
    w = pl.program_id(0)
    lim = lim_ref[0]
    sentinel = lim_ref[1]

    def get_dma(slot, widx):
        # lo values are host-aligned to ALIGN; re-derive so Mosaic can prove
        # lane-tile divisibility of the slice offset
        lo = pl.multiple_of((lo_ref[widx] // ALIGN) * ALIGN, ALIGN)
        return pltpu.make_async_copy(
            cand_hbm.at[:, pl.ds(lo, cand_cap)],
            cand_ref.at[slot], sem.at[slot],
        )

    @pl.when(w == 0)
    def _():
        get_dma(0, 0).start()

    get_dma(w % 2, w).wait()

    @pl.when(w + 1 < nw)
    def _():
        get_dma((w + 1) % 2, w + 1).start()

    off_full = cand_ref[w % 2, 0:1, :]  # (1, cand_cap)

    nsub = wk // sub
    for s in range(nsub):
        sub_base = w * wk + s * sub
        if csub < cand_cap:
            # candidates of this sub-window: one contiguous run starting at
            # (#cands with off < sub_base) - 1; find it with one reduction.
            # (csub covers the run: <= sub+1 candidates plus <= 127 lanes of
            # alignment/clamp slack.)
            n_lt = jnp.sum((off_full < jnp.float32(sub_base)).astype(
                jnp.float32)).astype(jnp.int32)
            start = jnp.maximum(n_lt - 1, 0)
            start = jnp.minimum((start // ALIGN) * ALIGN, cand_cap - csub)
            start = pl.multiple_of(start, ALIGN)
            cs = cand_ref[w % 2, :, pl.ds(start, csub)]  # (16, csub)
        else:
            cs = cand_ref[w % 2]
        off = cs[0:1, :]
        cnt = cs[1:2, :]
        gidc = (jnp.float32(sub_base)
                + jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
                .astype(jnp.float32))  # (sub, 1) key slot ids, f32 exact
        member = jnp.logical_and(off <= gidc, gidc < off + cnt).astype(
            jnp.bfloat16)  # (sub, csub); 0/1 is exact in bf16
        # Exact expansion (one nonzero per key column): split the f32
        # candidate values into three bf16 terms (Dekker splitting covers
        # all 24 mantissa bits) and accumulate in f32 — CONCATENATED into
        # ONE matmul (48 rows still fit a 128-sublane MXU tile; three
        # separate M=16 passes each waste 7/8 of the array). With one
        # nonzero per key column the per-term products are exact, so the
        # hi+mid+lo sum reconstructs the f32 value exactly either way.
        hi = cs.astype(jnp.bfloat16)
        r1 = cs - hi.astype(jnp.float32)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        stacked = jnp.concatenate([hi, mid, lo], axis=0)  # (48, csub)
        # precision pinned to DEFAULT: these operands are INTENTIONALLY
        # bf16 (the Dekker split makes the sum exact), and an ambient
        # jax_default_matmul_precision="highest" (tests/conftest.py sets it
        # for the f32 oracle matmuls) would stamp contract_precision<fp32>
        # onto a bf16 matmul — which Mosaic rejects ("Bad lhs type").
        t3 = jax.lax.dot_general(
            stacked, member, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (48, sub)
        nr = cs.shape[0]
        E = (t3[0:nr, :] + t3[nr:2 * nr, :]) + t3[2 * nr:3 * nr, :]
        # (16, sub)

        gid = (jnp.int32(sub_base)
               + jax.lax.broadcasted_iota(jnp.int32, (1, sub), 1))
        off_i = E[0:1, :].astype(jnp.int32)
        dkey = E[2:3, :].astype(jnp.int32)
        base = E[3:4, :].astype(jnp.int32)
        hh = jnp.maximum(E[4:5, :].astype(jnp.int32), 1)
        # u-major local tile decode (reference K3 :152-157)
        j = gid - off_i
        du = j // hh
        dv = j - du * hh
        tid = base + du + dv * tiles_u
        valid = gid < lim
        # a key whose owning candidate was clipped out of the DMA window
        # (span overflow in direct candidate mode) has an all-zero one-hot
        # column; its h would decode as 0 where real owners have h >= 1 —
        # retire it to the sentinel (dropped-key semantics, like key_cap
        # overflow) instead of emitting a garbage tile-0 key
        valid = jnp.logical_and(valid, E[4:5, :] >= 0.5)

        # tile-local splat centers (blend kernels need small exact coords)
        cx = (tid - (tid // tiles_u) * tiles_u).astype(jnp.float32) * tile_w
        cy = (tid // tiles_u).astype(jnp.float32) * tile_h
        u_raw = E[6:7, :] - cx
        v_raw = E[7:8, :] - cy

        if exact_cull:
            # Exact (point, tile) cull: the pair is dead iff the blend
            # quadratic q(dx,dy) = 0.5(a dx^2 + c dy^2) + b dx dy exceeds
            # logro + log(255) (+ CULL_MARGIN against fp jitter) at EVERY
            # pixel center of the tile — the blend kernel's 1/255 alpha
            # test then skips all of them, so retiring the key to the
            # sentinel is output-identical while shrinking every tile's
            # blend range. q is convex, so
            # its min over the pixel-center rect is 0 if the center is
            # inside, else the min over the four edges (per-edge 1-D
            # minimizer clamped to the edge — exact for convex). The
            # continuous-rect min lower-bounds the discrete-center min,
            # keeping the cull conservative. Degenerate/zero conics give
            # NaN qmin and NaN > tau is False: such pairs are kept.
            ca, cb, cc = E[8:9, :], E[9:10, :], E[10:11, :]
            logro = E[11:12, :]
            x0 = 0.5 - u_raw
            x1 = (tile_w - 0.5) - u_raw
            y0 = 0.5 - v_raw
            y1 = (tile_h - 0.5) - v_raw

            def q_at(xx, yy):
                return 0.5 * (ca * xx * xx + cc * yy * yy) + cb * xx * yy

            def edge_x(xx):  # min over dy in [y0, y1] at fixed dx
                ys = jnp.clip(-cb * xx / cc, y0, y1)
                return q_at(xx, ys)

            def edge_y(yy):  # min over dx in [x0, x1] at fixed dy
                xs = jnp.clip(-cb * yy / ca, x0, x1)
                return q_at(xs, yy)

            inside = ((x0 <= 0.0) & (0.0 <= x1)
                      & (y0 <= 0.0) & (0.0 <= y1))
            qmin = jnp.minimum(
                jnp.minimum(edge_x(x0), edge_x(x1)),
                jnp.minimum(edge_y(y0), edge_y(y1)),
            )
            qmin = jnp.where(inside, 0.0, qmin)
            valid = jnp.logical_and(
                valid,
                jnp.logical_not(qmin > logro + (LOG255 + CULL_MARGIN)))

        # tid << dbits via shift, not `tid * 2**dbits`: Mosaic's int32
        # multiply-by-large-power-of-two miscompiles at dbits >= 21 on
        # small-shape kernels ("Bad lhs type" on an unrelated matmul /
        # pathological compile hang, v5e libtpu 2026-08); the shift lowers
        # cleanly at every shape. dkey < 2^dbits (tiling pre-clips), so
        # shift+add is the same fused key.
        fused = jnp.where(
            valid, jax.lax.shift_left(tid, dbits) + dkey, sentinel)
        fused_ref[0:1, s * sub:(s + 1) * sub] = fused

        u_l = jnp.where(valid, u_raw, 0.0)
        v_l = jnp.where(valid, v_raw, 0.0)
        zero = jnp.zeros((1, sub), jnp.float32)
        tbl_ref[:, s * sub:(s + 1) * sub] = jnp.concatenate(
            [u_l, v_l, E[8:16, :], E[5:6, :],  # rows 0..9 attrs, 10 pidx
             zero, zero, zero, zero, zero],
            axis=0,
        )


def expand_keys(
    cand: jnp.ndarray,     # (16, n_pad) f32 candidate columns (real lanes'
                           # offsets non-decreasing, zero-count lanes
                           # inert — see module header)
    lo: jnp.ndarray,       # (nw,) int32 128-aligned window candidate starts
    lim: jnp.ndarray,      # (2,) int32 [min(total, cap), sentinel]
    *, key_cap: int, tiles_u: int, tile_w: int, tile_h: int, dbits: int,
    num_tiles: int,
    exact_cull: bool = True, cand_scale: int = 1, interpret: bool = False,
):
    """Returns (fused (key_cap,) int32, table (16, key_cap) f32).

    ``cand_scale`` multiplies the candidate window sizes (CAND_CAP, CSUB):
    direct candidate mode (no host-side partition) interleaves zero-count
    lanes into the runs, so windows must span proportionally more lanes —
    the caller fits the scale from the span diagnostic (tiling.py)."""
    n_pad = cand.shape[1]
    assert 1 <= cand_scale <= MAX_CAND_SCALE, cand_scale
    wk = window_size(key_cap)
    sub = min(SUBKEYS, wk)
    cand_cap = min(CAND_CAP * cand_scale, n_pad)
    csub = min(CSUB * cand_scale, cand_cap)
    nw = key_cap // wk
    assert key_cap % wk == 0 and wk % sub == 0
    assert n_pad % ALIGN == 0 and cand_cap % ALIGN == 0
    assert lo.shape == (nw,)

    kernel = functools.partial(
        _expand_kernel, wk=wk, sub=sub, cand_cap=cand_cap, csub=csub, nw=nw,
        tiles_u=tiles_u, tile_w=tile_w, tile_h=tile_h, dbits=dbits,
        num_tiles=num_tiles, exact_cull=exact_cull,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=(
            pl.BlockSpec((1, wk), lambda w, *_: (0, w),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, wk), lambda w, *_: (0, w),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, cand_cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fused, tbl = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, key_cap), jnp.int32),
            jax.ShapeDtypeStruct((16, key_cap), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lo, lim, cand)
    return fused[0], tbl
