"""Pallas TPU tile-blend kernels (forward + backward).

These replace the reference's CUDA tile-cooperative kernels
(GaussianPointCloudRasterisation.py:318-485 forward, :488-705 backward
phase 1). The design is TPU-native rather than a translation:

- grid = (num_tiles,); per tile the kernel streams 128-key chunks of the
  depth-sorted key table from HBM into VMEM with async DMA. The table is
  struct-of-arrays (16 attribute rows x cap_pad key lanes) and every tile's
  range starts at a 128-aligned lane offset (tiling.py pads the layout), so
  each DMA is a (16, 128) window at an aligned offset — the only slice
  shape Mosaic accepts for narrow attribute data.
- The Gaussian exponent is evaluated on the VPU in exact f32:
  alpha = exp(-0.5 (a dx^2 + c dy^2) - b dx dy + log(rescale * opacity))
  with dx, dy the (pixel, key) offset broadcasts in TILE-LOCAL coordinates.
  (An earlier design used an MXU monomial matmul, but its K=8 contraction
  is 6%-utilized on the MXU AND the default bf16 MXU input rounding of the
  expanded-quadratic coefficients produced exponent errors of O(100) at
  1000-px image widths — VPU f32 is both faster and exact.)
- The per-pixel sequential transmittance recurrence is re-expressed in
  LOG space as a prefix sum of log(1 - a) along the 128-lane key axis —
  one MXU triangular matmul per chunk (a roll-based product scan was ~60%
  of the kernel's VPU ops) — with a per-pixel carry between chunks;
  semantics identical to the reference's front-to-back loop, including
  the 1/255 skip, the 0.99 clamp and the sticky T < 1e-4 saturation.
- Color/depth accumulation is one MXU matmul acc += w @ [r,g,b,d]^T with
  precision=HIGHEST (K=128 f32; every MXU op in these kernels pins HIGHEST
  — bf16 rounding fails the 1e-4 oracle gates).
- The backward recomputes the forward chunk state (only the final image is
  saved), uses the prefix identity S_i = g.C_final - g.A_i (A_i inclusive
  prefix of (g.c_j) w_j) to get dL/dalpha_i in a single front-to-back
  sweep — same algebra as the reference's back-to-front "division trick"
  (:561-565, :643-657) — and reduces every per-key gradient over the pixel
  axis with one MXU matmul De = monomials^T @ de (K=1024, HIGHEST), from
  which all six conic/position gradients follow by exact central-moment
  algebra in tile-local coordinates.

Table layout: (16, cap_pad) f32, one lane per key slot:
  rows 0..5  u_local, v_local, conic_a, conic_b, conic_c,
             log(rescale * opacity)
  rows 6..9  r, g, b, depth;  rows 10..15 zero

Backward output (16, cap_pad): rows
  0 d_u, 1 d_v, 2 d_conic_a, 3 d_conic_b, 4 d_conic_c,
  5 d_log(rescale*opacity), 6 d_r, 7 d_g, 8 d_b, 9 zero,
  10 |grad_uv| magnitude (densify stat), 11 affected-pixel count,
  12..15 zero.
(conic gradients are EXACT; the conic -> cov2d chain, incl. the +0.3
low-pass and the rescale factor, is differentiated by JAX autodiff outside
the kernel — an accuracy improvement over the reference, which approximates
d_cov2d by the filtered conic, utils.py:335-348.)
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_SKIP_EPS = 1.0 / 255.0
ALPHA_CLAMP = 0.99
T_SATURATION_EPS = 1e-4

CHUNK = 128  # key-chunk = lane width; tiling.CHUNK must match


HIGHEST = jax.lax.Precision.HIGHEST


def _pixel_coords(tile_w: int, tile_h: int):
    """((PX, 1) x, (PX, 1) y) tile-local pixel centers (+0.5, reference
    :444-447), row-major over a tile_w x tile_h tile."""
    px_count = tile_w * tile_h
    i = jax.lax.broadcasted_iota(jnp.int32, (px_count, 1), 0)
    x = (i % tile_w).astype(jnp.float32) + 0.5
    y = (i // tile_w).astype(jnp.float32) + 0.5
    return x, y


def _pixel_monomials(tile_w: int, tile_h: int):
    """(tile_w*tile_h, 8) tile-LOCAL monomials [x^2, y^2, xy, x, y, 1, 0, 0];
    used by the backward's moment matmul (K=PX reduction on the MXU)."""
    x, y = _pixel_coords(tile_w, tile_h)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    return jnp.concatenate([x * x, y * y, x * y, x, y, one, zero, zero], axis=1)


def _tri_incl(n: int):
    """(n, n) inclusive lower-triangular ones: (x @ tri)[:, k] = cumsum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r <= c).astype(jnp.bfloat16)


def _cumsum_mxu(x: jnp.ndarray, terms: int = 3) -> jnp.ndarray:
    """f32 inclusive prefix sum along the 128-lane axis on the MXU.

    ``terms`` native bf16 passes instead of HIGHEST's 6+: the triangular
    ones matrix is bf16-exact and the Dekker bf16 split of the f32 operand
    is accumulated in f32. terms=3 reconstructs the full 24-bit significand
    (exact); terms=2 drops the third term, bounded by half-ulp bf16
    rounding of the second: <= sum|x_i| * 2^-17. For the forward's
    log(1-a) operand the saturation cutoff bounds sum|log| by ~9.2, so the
    worst-case transmittance relative error is ~7e-5 — under the 1e-4
    oracle gates (with little margin in the adversarial worst case, but
    real scenes sit orders of magnitude below the saturation-sum bound)
    and ~50x below display quantization. The backward keeps terms=3: its
    prefix feeds the cancellation-prone g.C_final - g.A subtraction.
    """
    tri = _tri_incl(x.shape[-1])
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    parts = [hi, mid]
    if terms >= 3:
        parts.append((r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16))
    # all terms ride ONE matmul, stacked along the sublane (pixel) dim —
    # same MACs as per-term passes but a single triangular weight load.
    # precision=DEFAULT: operands are intentionally bf16; an ambient
    # "highest" default would stamp contract_precision<fp32> onto a bf16
    # matmul, which Mosaic rejects ("Bad lhs type")
    stacked = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    t = jax.lax.dot_general(
        stacked, tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    px = x.shape[0]
    out = t[:px]
    for i in range(1, len(parts)):
        out = out + t[i * px:(i + 1) * px]
    return out


def _dot_dekker3(a, b, dims):
    """f32 x f32 matmul as ONE native bf16 MXU pass over STACKED 2-term
    Dekker splits of both 2-D operands.

    hi = bf16(x), lo = bf16(x - hi); stacking [hi, lo] along each
    operand's non-contracted dim yields all four cross products
    (hi.hi, hi.lo, lo.hi, lo.lo) as blocks of one (2M, 2N) matmul, summed
    in f32 — the product of the truncated operands is EXACT (vs dropping
    lo.lo), so the only error is the 2-term representation itself,
    ~2^-17 relative, two orders under every oracle gate. One stacked pass
    costs fewer effective MXU tiles than 3 separate passes when M or N
    underfills the 128-wide tile (the acc matmul's N=4, dcol's M=3), and
    loads the weights once. HIGHEST (~6 passes) measured 1.8 ms/frame
    slower across the blend forward at 428k; DEFAULT's single unsplit
    pass rounds to 8 mantissa bits (~4e-3, at the edge of the on-chip
    gates). precision=DEFAULT keeps an ambient highest-precision default
    from re-expanding the bf16 pass.
    """
    ((ac,), (bc,)) = dims[0]
    an, bn = 1 - ac, 1 - bc  # non-contracted dim of each 2-D operand
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sa = jnp.concatenate([a_hi, a_lo], axis=an)
    sb = jnp.concatenate([b_hi, b_lo], axis=bn)
    out = jax.lax.dot_general(
        sa, sb, dims, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)  # (2M, 2N)
    m = a.shape[an]
    n = b.shape[bn]
    return (out[:m, :n] + out[:m, n:]) + (out[m:, :n] + out[m:, n:])


def _chunk_state(tab, xy, lane_lo, lane_hi, t_run, rgb_only=False):
    """Shared fwd/bwd per-chunk recompute: alphas, masks, transmittances.

    tab: (16, CHUNK) SoA chunk; xy: ((PX, 1), (PX, 1)) tile-local pixel
    centers; lanes in [lane_lo, lane_hi) are real keys of the current tile
    (ranges are NOT chunk-aligned — the window may straddle neighboring
    tiles' keys); t_run: (PX, 1) carried transmittance. All math on the
    VPU, exact f32. rgb_only skips the `include` mask (returned as None).
    """
    x, y = xy
    dx = x - tab[0:1, :]   # (PX, CHUNK)
    dy = y - tab[1:2, :]
    ca, cb, cc = tab[2:3, :], tab[3:4, :], tab[4:5, :]
    # the range mask depends only on the LANE: fold it into the (1, CHUNK)
    # log-opacity row (exp underflows to exactly 0) instead of OR-ing a
    # (PX, CHUNK) mask — out-of-range lanes then skip via the alpha test,
    # NaN lanes via the not(>=) form
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tab.shape[1]), 1)
    out_of_range = jnp.logical_or(lane < lane_lo, lane >= lane_hi)
    logro = jnp.where(out_of_range, jnp.float32(-1e4), tab[5:6, :])
    power = (-0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
             + logro)
    alpha_u = jnp.exp(power)
    skip = jnp.logical_not(alpha_u >= ALPHA_SKIP_EPS)  # catches NaN too
    a = jnp.where(skip, 0.0, jnp.minimum(alpha_u, ALPHA_CLAMP))
    om = 1.0 - a
    # cumulative transmittance in LOG space: the per-lane cumprod becomes
    # one MXU triangular matmul (the roll-based product scan was ~60% of
    # the kernel's VPU ops). Skipped lanes have om=1 -> log 0, an exact
    # identity; om >= 0.01 (the 0.99 alpha clamp) keeps log well away from
    # the log(1-x) cancellation regime. f32 HIGHEST keeps the rel error
    # ~1e-6 per 128-lane chunk, far inside the 1e-4 oracle gates.
    log_om = jnp.log(om)
    # terms=2 keeps fwd and bwd-recompute transmittances identical while
    # saving an MXU pass (error bound in _cumsum_mxu's docstring); the
    # bound scales with the per-matmul extent, so wider chunks need the
    # exact 3-term reconstruction to hold the 1e-4 oracle gates
    s_incl = _cumsum_mxu(log_om, terms=2 if tab.shape[1] <= 128 else 3)
    # exclusive form first: one exp + one mul instead of exp + divide
    t_excl = t_run * jnp.exp(s_incl - log_om)
    p_incl = t_excl * om  # (PX, CHUNK)
    sat = p_incl >= T_SATURATION_EPS
    # skipped lanes already have a == 0, so the saturation mask alone
    # reproduces w = where(include, a * t_excl, 0)
    w = jnp.where(sat, a, 0.0) * t_excl
    include = (None if rgb_only
               else jnp.logical_and(jnp.logical_not(skip), sat))
    return alpha_u, a, om, p_incl, t_excl, include, w, dx, dy


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _forward_kernel(
    # scalar prefetch
    start_ref, end_ref,
    # inputs
    table_hbm,
    # outputs
    out_ref,
    # scratch
    tab_ref, acc_ref, t_ref, sem,
    *, tile_w: int, tile_h: int, rgb_only: bool, chunk: int, strips: int,
):
    px_count = tile_w * tile_h
    spx = px_count // strips  # pixels per strip (contiguous tile rows)
    t = pl.program_id(0)
    # ranges are unaligned; DMA windows start at the enclosing chunk
    # boundary (the hint lets Mosaic prove lane alignment) and lane masks
    # cut out the tile's actual [start, end) span. (A round-3 variant
    # decoupled a wider DMA window from the compute chunk; the round-4
    # sweep measured it strictly slower at 428k/1.03M/2.08M x 4 widths —
    # RESULTS.md — so the window width IS the chunk width.)
    start = start_ref[t]
    end = end_ref[t]
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    n = end - start
    nf = jnp.where(n > 0, pl.cdiv(end - base, chunk), 0)

    xy = _pixel_coords(tile_w, tile_h)

    acc_ref[:] = jnp.zeros((px_count, 8), jnp.float32)
    # t_ref columns: 0 = running product over all processed (saturation
    # tests), 1 = product over included only (reported transmittance).
    t_ref[:] = jnp.ones((px_count, 8), jnp.float32)

    def get_dma(slot, f):
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(base + f * chunk, chunk)],
            tab_ref.at[slot], sem.at[slot],
        )

    @pl.when(nf > 0)
    def _():
        get_dma(0, 0).start()

    def body(f, carry):
        # double-buffered: the next window streams while this one computes.
        # `inflight` = a DMA for window f was started (it must be waited
        # even if blending saturated meanwhile); carry[1:] = per-STRIP
        # still-blending flags (the end-of-window saturation check folds
        # into these carries — a separate per-window (PX, 1) max-reduce
        # gate measured ~8% of the whole forward at bench shapes, the
        # round-3 regression). Strip-granular termination: pixels of a
        # saturated strip contribute exactly nothing (w = 0 under the
        # sticky T < 1e-4 mask), so skipping its whole compute block is
        # output-identical while tiles whose rows saturate at different
        # depths stop paying for the finished rows.
        inflight = carry[0]
        s_act = carry[1:]
        active = functools.reduce(jnp.logical_or, s_act)

        @pl.when(inflight)
        def _():
            get_dma(f % 2, f).wait()

        @pl.when(jnp.logical_and(active, f + 1 < nf))
        def _():
            get_dma((f + 1) % 2, f + 1).start()

        for s in range(strips):
            lo_px, hi_px = s * spx, (s + 1) * spx

            @pl.when(s_act[s])
            def _(lo_px=lo_px, hi_px=hi_px):
                lo = base + f * chunk
                tab = tab_ref[f % 2]
                t_run = t_ref[lo_px:hi_px, 0:1]
                xy_s = (xy[0][lo_px:hi_px], xy[1][lo_px:hi_px])
                alpha_u, a, om, p_incl, t_excl, include, w, _, _ = (
                    _chunk_state(tab, xy_s, start - lo, end - lo, t_run,
                                 rgb_only=rgb_only))
                acc = _dot_dekker3(
                    w, tab[6:10, :], (((1,), (1,)), ((), ())),
                )  # (spx, 4): [sum w*r, w*g, w*b, w*depth]
                acc_ref[lo_px:hi_px, 0:4] = acc_ref[lo_px:hi_px, 0:4] + acc
                t_ref[lo_px:hi_px, 0:1] = p_incl[:, chunk - 1 : chunk]
                if not rgb_only:
                    # depth normalizer, per-pixel blend count and the
                    # reported transmittance: only the full path consumes
                    # them (reference K6's rgb_only template flag skips
                    # them too)
                    w_sum = jnp.sum(w, axis=1, keepdims=True)
                    cnt = jnp.sum(include.astype(jnp.float32), axis=1,
                                  keepdims=True)
                    acc_ref[lo_px:hi_px, 4:5] = (
                        acc_ref[lo_px:hi_px, 4:5] + w_sum)
                    acc_ref[lo_px:hi_px, 5:6] = (
                        acc_ref[lo_px:hi_px, 5:6] + cnt)
                    t_fin = jnp.min(
                        jnp.where(include, p_incl, jnp.float32(2.0)),
                        axis=1, keepdims=True,
                    )
                    t_ref[lo_px:hi_px, 1:2] = jnp.minimum(
                        t_ref[lo_px:hi_px, 1:2], t_fin)

        new_act = []
        for s in range(strips):
            sat = (jnp.max(t_ref[s * spx:(s + 1) * spx, 0:1])
                   < T_SATURATION_EPS)
            new_act.append(
                jnp.logical_and(s_act[s], jnp.logical_not(sat)))
        next_inflight = jnp.logical_and(active, f + 1 < nf)
        return (next_inflight,) + tuple(new_act)

    jax.lax.fori_loop(0, nf, body, (nf > 0,) + (True,) * strips)

    out = jnp.concatenate(
        [acc_ref[:, 0:6], t_ref[:, 1:2], jnp.zeros((px_count, 1), jnp.float32)],
        axis=1,
    )
    out_ref[0] = out


def blend_forward(
    table: jnp.ndarray,        # (16, cap_pad) SoA key table
    tile_start: jnp.ndarray,   # (num_tiles,) int32, CHUNK-aligned
    tile_end: jnp.ndarray,     # (num_tiles,) int32
    *, tile, tiles_x: int, tiles_y: int, rgb_only: bool = False,
    chunk: int = CHUNK, strips: int = 1, interpret: bool = False,
):
    """Returns (num_tiles, tile_w*tile_h, 8) packed per-pixel outputs:
    [r, g, b, depth_weighted_sum, weight_sum, include_count, T_final, 0]
    (rgb_only: only the first three channels are meaningful).
    ``tile``: int (square) or (tile_w, tile_h).
    ``strips``: saturation-termination granularity — the tile's pixel rows
    split into this many contiguous strips, each with its own early-exit
    carry (output-identical at any value; see _forward_kernel).
    """
    from taichi_3d_gaussian_splatting_tpu.ops.tiling import tile_wh
    tile_w, tile_h = tile_wh(tile)
    num_tiles = tiles_x * tiles_y
    px_count = tile_w * tile_h
    assert chunk % 128 == 0, "DMA windows must stay lane-aligned"
    assert table.shape[1] % chunk == 0, "cap_pad must be a chunk multiple"
    assert (strips >= 1 and tile_h % strips == 0
            and (px_count // strips) % 8 == 0), (
        f"strips={strips} must divide tile_h with 8-aligned strip rows")
    kernel = functools.partial(_forward_kernel, tile_w=tile_w, tile_h=tile_h,
                               rgb_only=rgb_only, chunk=chunk, strips=strips)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, px_count, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, chunk), jnp.float32),  # double buffer
            pltpu.VMEM((px_count, 8), jnp.float32),
            pltpu.VMEM((px_count, 8), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, px_count, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_start, tile_end, table)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _backward_kernel(
    # scalar prefetch
    start_ref, end_ref,
    # inputs
    table_hbm, g_ref, cfin_ref, dtab_init_hbm,
    # outputs
    dtab_hbm, imggrad_ref,
    # scratch
    tab_ref, drow_ref, carry_ref, rmw_ref, acc_ref, in_sem, out_sem,
    rmw_sem,
    *, tile_w: int, tile_h: int, extra_info: bool, imggrad: bool,
    chunk: int, strips: int,
):
    px_count = tile_w * tile_h
    t = pl.program_id(0)
    # unaligned ranges; see _forward_kernel. The FIRST window may be
    # shared with the previous tile's tail (windows are chunk-aligned,
    # tiles are contiguous in key space), so window 0 of a misaligned tile
    # READ-MODIFY-WRITES the existing output window — the grid is
    # sequential, making this race-free.
    start = start_ref[t]
    end = end_ref[t]
    base = pl.multiple_of((start // chunk) * chunk, chunk)
    n = end - start
    nf = jnp.where(n > 0, pl.cdiv(end - base, chunk), 0)
    shared_head = start > base

    xy = _pixel_coords(tile_w, tile_h)
    mono = _pixel_monomials(tile_w, tile_h)
    g = g_ref[0]        # (PX, 3) d_rgb
    cfin = cfin_ref[0]  # (PX, 3) final pre-background rgb
    g_cfin = jnp.sum(g * cfin, axis=1, keepdims=True)  # (PX, 1)

    # carry columns: 0 = T_run, 1 = g.A prefix
    carry_ref[:] = jnp.concatenate(
        [jnp.ones((px_count, 1), jnp.float32),
         jnp.zeros((px_count, 7), jnp.float32)], axis=1,
    )
    imggrad_ref[0] = jnp.zeros((px_count, 2), jnp.float32)

    def get_in_dma(slot, f):
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(base + f * chunk, chunk)],
            tab_ref.at[slot], in_sem.at[slot],
        )

    def get_out_dma(slot, f):
        return pltpu.make_async_copy(
            drow_ref.at[slot],
            dtab_hbm.at[:, pl.ds(base + f * chunk, chunk)],
            out_sem.at[slot],
        )

    @pl.when(nf > 0)
    def _():
        get_in_dma(0, 0).start()

    # fetch the previous tile's tail of the shared window before window 0
    @pl.when(jnp.logical_and(nf > 0, shared_head))
    def _():
        pltpu.make_async_copy(
            dtab_hbm.at[:, pl.ds(base, chunk)], rmw_ref, rmw_sem
        ).start()

    def body(f, state):
        # double-buffered in/out: inflight = in-DMA(f) started; state[3:]
        # = per-STRIP still-blending flags (strip-granular early exit; a
        # saturated strip's pixels contribute exactly zero to every
        # gradient — the include mask — so skipping its recompute block is
        # output-identical). Fully saturated (idle) windows skip BOTH the
        # drow write and the out-DMA entirely — the d_table output is
        # aliased onto a zero-filled buffer, so unwritten windows are
        # already correct (and window 0, the only one that may carry the
        # previous tile's tail, always runs: saturation can only flip at
        # f >= 1). out_even/out_odd track which drow slot has an out-DMA
        # in flight.
        inflight, out_even, out_odd = state[0], state[1], state[2]
        s_act = state[3:]
        active = functools.reduce(jnp.logical_or, s_act)

        @pl.when(inflight)
        def _():
            get_in_dma(f % 2, f).wait()

        @pl.when(jnp.logical_and(active, f + 1 < nf))
        def _():
            get_in_dma((f + 1) % 2, f + 1).start()

        slot_busy = jnp.where(f % 2 == 0, out_even, out_odd)

        @pl.when(slot_busy)
        def _():
            get_out_dma(f % 2, jnp.maximum(f - 2, 0)).wait()

        # window 0 of a misaligned tile merges onto the previous tile's tail
        @pl.when(jnp.logical_and(f == 0, shared_head))
        def _():
            pltpu.make_async_copy(
                dtab_hbm.at[:, pl.ds(base, chunk)], rmw_ref, rmw_sem
            ).wait()

        # active windows write their out window ONCE: ours + (the
        # previous tile's tail at a shared window 0 | zeros)
        prev0 = lambda: jnp.where(
            jnp.logical_and(f == 0, shared_head), rmw_ref[:],
            jnp.zeros((16, chunk), jnp.float32))

        _backward_sub(
            active, s_act, base + f * chunk, f, xy, mono, g,
            cfin, g_cfin, tab_ref, drow_ref, carry_ref, imggrad_ref,
            acc_ref, start, end, chunk=chunk, strips=strips,
            extra_info=extra_info, imggrad=imggrad, prev=prev0)

        @pl.when(active)
        def _():
            get_out_dma(f % 2, f).start()

        spx = px_count // strips
        new_act = []
        for s in range(strips):
            sat = (jnp.max(carry_ref[s * spx:(s + 1) * spx, 0:1])
                   < T_SATURATION_EPS)
            new_act.append(
                jnp.logical_and(s_act[s], jnp.logical_not(sat)))
        next_inflight = jnp.logical_and(active, f + 1 < nf)
        out_even2 = jnp.where(f % 2 == 0, active, out_even)
        out_odd2 = jnp.where(f % 2 == 1, active, out_odd)
        return (next_inflight, out_even2, out_odd2) + tuple(new_act)

    fin = jax.lax.fori_loop(
        0, nf, body, (nf > 0, False, False) + (True,) * strips)
    out_even, out_odd = fin[1], fin[2]

    # drain the still-inflight out-DMAs (the most recent window on each
    # drow-slot parity; indices clamp to 0 — predicated off when invalid)
    last_even = jnp.maximum(jnp.where((nf - 1) % 2 == 0, nf - 1, nf - 2), 0)
    last_odd = jnp.maximum(jnp.where((nf - 1) % 2 == 1, nf - 1, nf - 2), 0)

    @pl.when(out_even)
    def _():
        get_out_dma(0, last_even).wait()

    @pl.when(out_odd)
    def _():
        get_out_dma(1, last_odd).wait()


def _backward_sub(run, s_act, lo, f, xy, mono, g, cfin, g_cfin,
                  tab_ref, drow_ref, carry_ref, imggrad_ref, acc_ref,
                  start, end, *, chunk: int, strips: int, extra_info: bool,
                  imggrad: bool = True, prev=None):
    """One compute window of the backward sweep (see _backward_kernel).

    ``run`` = any strip active (gates the shared zero/finalize work);
    ``s_act`` = per-strip active flags. Each active strip recomputes its
    pixel rows' chunk state and accumulates the pixel-reduced rows into
    ``acc_ref`` (rows 0..7 moments De, 8..10 d_color, 11 |grad_uv| sum,
    12 affected-pixel count); the per-KEY gradient algebra then runs once
    on the strip-summed moments — identical math to the single-block form
    (the moments are plain sums over pixels, reassociated by strip).

    ``prev``: thunk whose value this window adds to its own rows when
    writing the out window (the previous tile's tail, or zeros)."""
    px_count = xy[0].shape[0]
    spx = px_count // strips

    @pl.when(run)
    def _():
        acc_ref[:] = jnp.zeros((16, chunk), jnp.float32)

    for s in range(strips):
        sl_lo, sl_hi = s * spx, (s + 1) * spx

        @pl.when(s_act[s])
        def _(sl_lo=sl_lo, sl_hi=sl_hi):
            tab = tab_ref[f % 2]
            xy_s = (xy[0][sl_lo:sl_hi], xy[1][sl_lo:sl_hi])
            g_s = g[sl_lo:sl_hi]
            t_run = carry_ref[sl_lo:sl_hi, 0:1]
            ga_prev = carry_ref[sl_lo:sl_hi, 1:2]
            alpha_u, a, om, p_incl, t_excl, include, w, dx, dy = (
                _chunk_state(tab, xy_s, start - lo, end - lo, t_run))
            # g.c per (pixel, key): 3 broadcast FMAs on the VPU (K=3 is a
            # degenerate MXU contraction; depth never backpropagates, so
            # no 4th channel rides — reference semantics, :1025-1163)
            gc = (g_s[:, 0:1] * tab[6:7, :] + g_s[:, 1:2] * tab[7:8, :]
                  + g_s[:, 2:3] * tab[8:9, :])
            gcw = gc * w
            ga = ga_prev + _cumsum_mxu(gcw)  # inclusive prefix on MXU
            s_after = g_cfin[sl_lo:sl_hi] - ga
            dalpha = jnp.where(include, gc * t_excl - s_after / om, 0.0)
            de = dalpha * alpha_u  # dL/d_exponent, (spx, chunk)

            # Moments: (8, chunk) = mono^T @ de — every pixel-reduction
            # the per-key gradients need, in one MXU op (K=spx, f32
            # HIGHEST: the central-moment algebra downstream cancels Sxx
            # against u^2 S1, which amplifies any per-term rounding
            # ~1000x — the rejected rhs-only 3-term Dekker variant
            # measured 5e-3 absolute errors on the CPU oracle gate, 10x
            # its atol; the _dot_dekker3 scheme used elsewhere was not
            # attempted here for the same reason).
            De = jax.lax.dot_general(
                mono[sl_lo:sl_hi], de, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGHEST,
            )
            # d_color rows: (3, chunk) = g^T @ w (K=spx, 2-term
            # dual-operand Dekker in one stacked bf16 pass — _dot_dekker3)
            dcol = _dot_dekker3(
                g_s, w, (((0,), (0,)), ((), ())),
            )
            acc_ref[0:8, :] = acc_ref[0:8, :] + De
            acc_ref[8:11, :] = acc_ref[8:11, :] + dcol

            if extra_info:
                ca = tab[2:3, :]
                cb = tab[3:4, :]
                cc = tab[4:5, :]
                # per-(pixel, key) viewspace grads, directly from dx/dy
                gx = de * (ca * dx + cb * dy)
                gy = de * (cb * dx + cc * dy)
                mag = jnp.sqrt(gx * gx + gy * gy)    # (spx, chunk)
                acc_ref[11:12, :] = acc_ref[11:12, :] + jnp.sum(
                    mag, axis=0, keepdims=True)
                acc_ref[12:13, :] = acc_ref[12:13, :] + jnp.sum(
                    include.astype(jnp.float32), axis=0, keepdims=True)
                if imggrad:
                    # per-pixel |grad_uv| image — a TB diagnostic only
                    # (reference :692-696); skipped in the training hot
                    # path
                    imggrad_ref[0, sl_lo:sl_hi] = (
                        imggrad_ref[0, sl_lo:sl_hi] + jnp.concatenate(
                            [jnp.sum(jnp.abs(gx), axis=1, keepdims=True),
                             jnp.sum(jnp.abs(gy), axis=1, keepdims=True)],
                            axis=1))

            carry_ref[sl_lo:sl_hi, 0:1] = p_incl[:, chunk - 1 : chunk]
            carry_ref[sl_lo:sl_hi, 1:2] = ga[:, chunk - 1 : chunk]

    @pl.when(run)
    def _():
        tab = tab_ref[f % 2]
        De = acc_ref[0:8, :]
        Sxx, Syy, Sxy = De[0:1, :], De[1:2, :], De[2:3, :]
        Su, Sv, S1 = De[3:4, :], De[4:5, :], De[5:6, :]
        u = tab[0:1, :]
        v = tab[1:2, :]
        ca = tab[2:3, :]
        cb = tab[3:4, :]
        cc = tab[4:5, :]
        Eu = Su - u * S1   # sum de * dx
        Ev = Sv - v * S1   # sum de * dy
        d_u = ca * Eu + cb * Ev
        d_v = cc * Ev + cb * Eu
        # EXACT conic gradients: e = -0.5 (a dx^2 + c dy^2) - b dx dy
        Sdx2 = Sxx - 2.0 * u * Su + u * u * S1
        Sdy2 = Syy - 2.0 * v * Sv + v * v * S1
        Sdxy = Sxy - u * Sv - v * Su + u * v * S1
        d_ca = -0.5 * Sdx2
        d_cb = -Sdxy
        d_cc = -0.5 * Sdy2
        d_logop = S1
        dcol = acc_ref[8:11, :]
        mag_per_key = acc_ref[11:12, :]
        npix = acc_ref[12:13, :]

        zrow = jnp.zeros((1, chunk), jnp.float32)
        drows = jnp.concatenate(
            [d_u, d_v, d_ca, d_cb, d_cc, d_logop,
             dcol,  # rows 6..8; row 9 (depth) structurally zero
             zrow, mag_per_key, npix, zrow, zrow, zrow, zrow],
            axis=0,
        )  # (16, chunk)
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (16, chunk), 1)
        mask16 = jnp.logical_and(
            lane16 >= start - lo,
            lane16 < end - lo,
        )
        ours = jnp.where(mask16, drows, 0.0)
        drow_ref[f % 2] = ours + prev()


def blend_backward(
    table: jnp.ndarray,        # (16, cap_pad)
    tile_start: jnp.ndarray,
    tile_end: jnp.ndarray,
    d_rgb_tiles: jnp.ndarray,  # (num_tiles, px, 3) image cotangent
    cfin_tiles: jnp.ndarray,   # (num_tiles, px, 3) forward rgb output
    *, tile, tiles_x: int, tiles_y: int, extra_info: bool = True,
    imggrad: bool = True,
    chunk: int = CHUNK, strips: int = 1, interpret: bool = False,
):
    """Returns (d_table (16, cap_pad), |grad_uv| image (num_tiles, px, 2)).
    ``strips``: per-strip saturation-termination granularity (see
    blend_forward); gradients are bitwise-unchanged except for the
    strip-blocked reassociation of the pixel-sum moments.

    The d_table output is ALIASED onto a zero-filled input, so lanes the
    sweep never writes (beyond the last tile's aligned window chain) are
    zeros, not garbage — the downstream segment reduction relies on this
    (0 * NaN would poison its membership matmul).
    """
    from taichi_3d_gaussian_splatting_tpu.ops.tiling import tile_wh
    tile_w, tile_h = tile_wh(tile)
    num_tiles = tiles_x * tiles_y
    px_count = tile_w * tile_h
    cap_pad = table.shape[1]
    dtab_init = jnp.zeros((16, cap_pad), jnp.float32)
    assert chunk % 128 == 0, "DMA windows must stay lane-aligned"
    assert table.shape[1] % chunk == 0, "cap_pad must be a chunk multiple"
    assert (strips >= 1 and tile_h % strips == 0
            and (px_count // strips) % 8 == 0), (
        f"strips={strips} must divide tile_h with 8-aligned strip rows")
    kernel = functools.partial(_backward_kernel, tile_w=tile_w, tile_h=tile_h,
                               extra_info=extra_info,
                               imggrad=extra_info and imggrad,
                               chunk=chunk, strips=strips)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, px_count, 3), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, px_count, 3), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, px_count, 2), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 16, chunk), jnp.float32),  # in double buffer
            pltpu.VMEM((2, 16, chunk), jnp.float32),  # out double buffer
            pltpu.VMEM((px_count, 8), jnp.float32),
            pltpu.VMEM((16, chunk), jnp.float32),     # shared-window RMW
            pltpu.VMEM((16, chunk), jnp.float32),     # strip-sum moments
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((16, cap_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, px_count, 2), jnp.float32),
        ),
        # input indices count the scalar-prefetch operands: dtab_init is
        # flattened input 5, aliased onto output 0 (d_table)
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_start, tile_end, table, d_rgb_tiles, cfin_tiles, dtab_init)
