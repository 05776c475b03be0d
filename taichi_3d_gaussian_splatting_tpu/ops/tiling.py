"""Tile binning: bbox -> per-tile depth-sorted key lists, static shapes.

Behavioral reference: GaussianPointCloudRasterisation.py:81-236 (K2: overlap
counts, K3: key expansion, torch cumsum :913 / radix sort :947, K4: tile
ranges :175-193).

TPU redesign, driven by measured v5e cost cliffs (scripts/tpu_breakdown.py,
/tmp-era probes folded into docs/tiling.md; numbers at 1-2M keys):
- XLA scatter-adds (~19 ms for the diff-scatter expansion), row gathers
  (~15 ms for 2M x 16 f32 rows, width-independent — latency-bound) and
  searchsorted (both lowerings) are all cost cliffs;
- `lax.sort` is cheap (~2.7 ms at 2M) and EXTRA PAYLOAD OPERANDS ARE FREE
  (11 payloads measured within noise of 2) — data must ride sorts, never
  be gathered after them.

Consequently this module performs ZERO gathers and ZERO scatters:
1. points are PARTITIONED (one stable N-length sort, ~2.4 ms) so key-owning
   points form a contiguous prefix in original order;
2. a Pallas kernel (ops/expand.py) broadcasts every per-point column to its
   key slots with a one-hot membership matmul per key window — emitting the
   fused int32 sort key (tid << depth_bits | depth_key) AND the full blend
   attribute table in pre-sort key order;
3. one `lax.sort` orders the keys with the 11 table columns riding as
   payloads — the sorted blend table falls out of the sort directly;
4. per-tile [start, end) ranges come from a Pallas bucket histogram +
   tiny cumsum; the blend kernels handle unaligned ranges with lane masks.

The key buffer has a static capacity `key_cap`; slots beyond the actual
total get the sentinel tile id and sort to the end, outside every real
tile's range. If the true total exceeds key_cap, the surplus keys of the
highest-index points are dropped (the returned `total` lets callers detect
this and grow the capacity).

Tiles are TILE_W x TILE_H pixels. Every ``tile`` parameter accepts either
an int (square tiles) or a (tile_w, tile_h) pair. Short tiles trade the
blend kernels' pixel-pair work (scales with tile area) against key-count
inflation along the short axis (a splat spanning h vertical pixels
covers ~(h/tile_h + 1) tile rows). Measured verdict on v5e (rounds 3-4,
RESULTS.md): SQUARE 32x32 wins at every point count — at bench splat
shapes the key inflation runs 1.2-2.0x and the sort/expand growth plus
per-tile overheads outweigh the pair savings (32x8 at 428k: fwd 21.9 vs
11.8 ms). The rectangular generalization stays because it is cheap,
oracle-tested, and the trade-off is scene-dependent. The reference's
square 16x16 was dictated by its CUDA block size.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union


def tile_wh(tile: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    """Normalize a tile spec (int = square, or (tile_w, tile_h)) to a pair."""
    if isinstance(tile, (tuple, list)):
        tw, th = tile
        return int(tw), int(th)
    return int(tile), int(tile)

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops import expand as expand_mod
from taichi_3d_gaussian_splatting_tpu.ops.histogram import bucket_histogram


class TileBBox(NamedTuple):
    """Inclusive-exclusive tile index bounds per point, shapes (N,) int32."""

    min_u: jnp.ndarray
    max_u: jnp.ndarray
    min_v: jnp.ndarray
    max_v: jnp.ndarray


def tile_bbox(
    uv: jnp.ndarray, radius: jnp.ndarray, width: int, height: int, tile
) -> TileBBox:
    """Conservative tile bounding box of a splat.

    Reference: GaussianPointCloudRasterisation.py:81-103
    (get_bounding_box_by_point_and_radii), with TILE_WIDTH generalized
    (incl. rectangular (tile_w, tile_h) tiles) and ``radius`` accepting
    per-axis (N, 2) lossless cull radii
    (attributes.PointAttributes.radius_xy) as well as the reference's
    scalar (N,) form.
    """
    tile_w, tile_h = tile_wh(tile)
    tiles_u = width // tile_w
    tiles_v = height // tile_h
    if radius.ndim == 2:
        rx = jnp.maximum(radius[:, 0], 1.0)
        ry = jnp.maximum(radius[:, 1], 1.0)
    else:
        rx = ry = jnp.maximum(radius, 1.0)
    min_u_px = jnp.maximum(0.0, uv[:, 0] - rx)
    max_u_px = uv[:, 0] + rx
    min_v_px = jnp.maximum(0.0, uv[:, 1] - ry)
    max_v_px = uv[:, 1] + ry

    min_tu = jnp.minimum(jnp.floor_divide(min_u_px, tile_w).astype(jnp.int32), tiles_u)
    max_tu = jnp.floor_divide(max_u_px, tile_w).astype(jnp.int32) + 1
    max_tu = jnp.minimum(jnp.maximum(max_tu, min_tu + 1), tiles_u)
    min_tv = jnp.minimum(jnp.floor_divide(min_v_px, tile_h).astype(jnp.int32), tiles_v)
    max_tv = jnp.floor_divide(max_v_px, tile_h).astype(jnp.int32) + 1
    max_tv = jnp.minimum(jnp.maximum(max_tv, min_tv + 1), tiles_v)
    # Splats whose cull extent misses the image entirely get an EMPTY box
    # (the reference's clamping would give them one spurious edge tile;
    # their alpha at any in-image pixel is below the 1/255 skip, so this is
    # output-lossless). Matters for band-sharded rendering, where many
    # points sit far outside the band.
    empty = ((max_u_px <= 0.0) | (min_u_px >= width)
             | (max_v_px <= 0.0) | (min_v_px >= height))
    max_tu = jnp.where(empty, min_tu, max_tu)
    max_tv = jnp.where(empty, min_tv, max_tv)
    return TileBBox(min_tu, max_tu, min_tv, max_tv)


CHUNK = 128  # must match blend_pallas.CHUNK (DMA window width)


class TileKeys(NamedTuple):
    """Depth-sorted per-tile key lists in plain sorted order.

    Each tile's keys occupy the unaligned range
    [tile_start[t], tile_end[t]); slots beyond `total` hold sentinel keys
    that sort to the end, outside every tile's range. The blend kernels DMA
    CHUNK-aligned windows around each range and mask the straddling lanes.
    """

    point_idx: jnp.ndarray    # (key_cap,) int32 pool slot per key (pad: N);
                              # None on the attrs path (nothing consumes it
                              # and it would push the key sort over the
                              # 12-operand cost cliff)
    orig_slot: jnp.ndarray    # (key_cap,) int32 pre-sort slot (permutation);
                              # None on the rgb_only path (only the backward
                              # regroup consumes it — dropping it keeps the
                              # key sort under the operand cost cliff)
    real: jnp.ndarray         # (key_cap,) bool: actual key vs padding
    tile_of_slot: jnp.ndarray # (key_cap,) int32 owning tile of each key
    tile_start: jnp.ndarray   # (num_tiles,) int32 (unaligned)
    tile_end: jnp.ndarray     # (num_tiles,) int32
    offsets: jnp.ndarray      # (N,) int32 exclusive cumsum of per-point counts
    counts: jnp.ndarray       # (N,) int32 per-point key counts (masked)
    total: jnp.ndarray        # () int32 true number of keys (may exceed cap)
    cand_scale_req: jnp.ndarray = None  # () int32 candidate-window scale
                              # direct mode would need for this frame (probe
                              # it with partition mode, then pass as
                              # cand_scale; overflow drops keys like
                              # key_cap overflow does)


def _exclusive_bounds(ids: jnp.ndarray, num_buckets: int,
                      interpret: bool = False) -> jnp.ndarray:
    """(num_buckets+1,) exclusive bucket bounds via histogram + cumsum.

    The cumsum runs in f32: XLA's int32 cumsum serializes at
    non-power-of-two lengths (~3.5 s at 428k on v5e); exact for counts
    < 2^24, the bound bucket_histogram already asserts."""
    hist = bucket_histogram(ids, num_buckets, interpret=interpret)
    return jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(hist.astype(jnp.float32)).astype(jnp.int32),
    ])


def _depth_bits(num_tiles: int) -> int:
    """Bits for the depth key beside the tile id in the fused int32 key."""
    tid_bits = max(int(num_tiles + 1).bit_length(), 1)
    return min(31 - tid_bits, 23)


def build_tile_keys_and_table(
    uv: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    width: int,
    height: int,
    tile,
    key_cap: int,
    depth_to_sort_key_scale: float = 2.0**10,
    attr_cols: Optional[jnp.ndarray] = None,
    rgb_only: bool = False,
    slim: bool = False,
    exact_tile_cull: bool = True,
    candidate_mode: str = "partition",
    cand_scale: int = 1,
    pack_colors: bool = False,
    interpret: bool = False,
) -> Tuple[TileKeys, Optional[jnp.ndarray]]:
    """Expand visible splats into depth-sorted per-tile keys, and (when
    ``attr_cols`` is given) the sorted (16, key_cap) blend attribute table.

    ``attr_cols``: (10, N) f32 [u, v, conic_a, conic_b, conic_c,
    log(rescale*opacity), r, g, b, depth], pre-sanitized; they ride the key
    sort as payloads and come out in blend_pallas table layout with splat
    centers converted to tile-local coordinates.

    The depth key is int32(depth * scale), matching the reference's
    fixed-point encoding (GaussianPointCloudRasterisation.py:159-170),
    clamped to the bits left beside the tile id in the fused sort key.
    """
    n = uv.shape[0]
    tile_w, tile_h = tile_wh(tile)
    tiles_u = width // tile_w
    num_tiles = tiles_u * (height // tile_h)
    dbits = _depth_bits(num_tiles)
    sentinel = ((num_tiles + 1) << dbits) - 1

    bbox = tile_bbox(uv, radius, width, height, tile)
    counts = (bbox.max_u - bbox.min_u) * (bbox.max_v - bbox.min_v)
    counts = jnp.where(visible, counts, 0).astype(jnp.int32)

    # cumsum in f32: XLA's i32 cumsum falls back to a serial scan at
    # non-power-of-two lengths (measured 3.5 s at N=428k vs 2.7 ms in f32);
    # exact while total keys < 2^24
    offsets = jnp.cumsum(counts.astype(jnp.float32)).astype(jnp.int32) - counts
    total = offsets[-1] + counts[-1]

    dkey_pt = jnp.clip(
        (depth * depth_to_sort_key_scale).astype(jnp.int32),
        0, (1 << dbits) - 1,
    )
    base_pt = bbox.min_u + tiles_u * bbox.min_v  # first covered tile id
    h_pt = bbox.max_v - bbox.min_v

    has_attrs = attr_cols is not None
    if attr_cols is None:
        attr_cols = jnp.zeros((10, n), jnp.float32)
    att = jnp.where(jnp.isfinite(attr_cols), attr_cols, 0.0)
    # sort costs are ~linear in operand bytes: the per-key point index only
    # rides where it's consumed (the no-attrs test/tool path), and
    # rgb_only/slim drop the depth column everywhere (slim = training fast
    # path: rgb-only blending, no depth image, but orig_slot still rides
    # for the backward regroup; the depth table row zero-fills, which the
    # backward tolerates — its depth cotangent is structurally zero)
    n_attr = 9 if ((rgb_only or slim) and has_attrs) else 10

    if candidate_mode not in ("partition", "direct"):
        raise ValueError(f"unknown candidate_mode: {candidate_mode!r}")
    if candidate_mode != "direct":
        cand_scale = 1  # scale only sizes DIRECT windows; enforcing here
        # keeps partition callers from paying scaled VMEM/matmul widths
    wk = expand_mod.window_size(key_cap)
    nw = key_cap // wk
    al = expand_mod.ALIGN
    n_pad = max(((n + al - 1) // al) * al, al)
    zcol = jnp.zeros((n,), jnp.float32)
    pidx = jnp.arange(n, dtype=jnp.int32)

    if candidate_mode == "direct":
        # Candidate columns stay in ORIGINAL point order: offsets are
        # non-decreasing there too (cumsum over all points), so every key
        # window's candidates still form one contiguous lane run — it just
        # interleaves zero-count lanes (empty membership intervals, inert
        # in the one-hot matmul). Skips the N-length 12-operand partition
        # sort at the cost of candidate windows spanning ~1/density more
        # lanes; ``cand_scale`` (fitted from cand_scale_req) sizes them,
        # and span overflow degrades to dropped keys via the kernel's
        # owned-check, mirroring key_cap overflow semantics.
        off_s, cnt_s = offsets, counts
        dkey_s, base_s, h_s = dkey_pt, base_pt, h_pt
        attr_srcs = [att[i] for i in range(n_attr)]
        owning_n = jnp.ones((n,), bool)  # natural off on every real lane
    else:
        # Partition: key-owning points to a contiguous prefix (stable =>
        # their offsets stay non-decreasing), every column riding as
        # payloads. Sort cost is ~linear in operand count, so the five
        # int32 meta columns are packed into two (dkey|h and cnt|base) and
        # the offsets column is recomputed after the sort: a stable
        # partition preserves the owners' relative order, so the cumsum of
        # partitioned counts reproduces the partitioned offsets exactly.
        nt_bits = int(num_tiles + 1).bit_length()
        assert dbits + 8 <= 31, "depth key must leave 8 bits for bbox height"
        assert 2 * nt_bits <= 31, f"too many tiles to pack counts: {num_tiles}"
        assert height // tile_h <= 255, "bbox height must fit 8 bits"
        flag = jnp.where(counts > 0, 0, 1).astype(jnp.int32)
        pk1 = (dkey_pt << 8) | h_pt
        pk2 = (counts << nt_bits) | base_pt
        pidx_payload = () if has_attrs else (pidx,)
        parted = jax.lax.sort(
            (flag, pk1, pk2) + pidx_payload
            + tuple(att[i] for i in range(n_attr)),
            num_keys=1, is_stable=True,
        )
        dkey_s = parted[1] >> 8
        h_s = parted[1] & 255
        cnt_s = parted[2] >> nt_bits
        base_s = parted[2] & ((1 << nt_bits) - 1)
        off_s = (jnp.cumsum(cnt_s.astype(jnp.float32)).astype(jnp.int32)
                 - cnt_s)
        attr_srcs = [parted[i] for i in range(len(parted) - n_attr,
                                              len(parted))]
        if not has_attrs:
            pidx = parted[3]
        owning_n = cnt_s > 0

    cand_cap = min(expand_mod.CAND_CAP * cand_scale, n_pad)

    # candidate start per key window: #lanes whose first key precedes the
    # window, minus one carry (points are intervals in key-slot space). In
    # partition mode only key owners count (zero-count lanes carry
    # PAD_OFF); in direct mode every real lane counts — the kernel's
    # in-window reduction uses the same convention either way.
    #
    # Span diagnostic inputs: the candidate-window scale DIRECT mode would
    # need for this frame, at both granularities (inner csub sub-windows
    # and the DMA'd cand_cap windows), from original-order offsets. Window
    # buckets nest inside sub-window buckets (wk is a sub multiple), so in
    # DIRECT mode — where window counting also runs over original order
    # with every real lane owning — ONE sub-granularity histogram serves
    # both: the window cumsum is its strided view (saves a Pallas
    # histogram dispatch per frame).
    sub = min(expand_mod.SUBKEYS, wk)
    nsub_tot = key_cap // sub
    ratio = wk // sub
    wid_sub = jnp.minimum(offsets // sub, nsub_tot)
    cum_sub = _exclusive_bounds(wid_sub, nsub_tot, interpret=interpret)
    span_sub = jnp.max(
        cum_sub[1:] - jnp.maximum(cum_sub[:-1] - 1, 0)) + al
    if candidate_mode == "direct":
        # min(off // wk, nw) == min(off // sub, nsub_tot) // ratio at
        # bucket boundaries: cum at wk granularity = every ratio-th entry
        cum = cum_sub[::ratio]
        cum_win = cum
    else:
        wid = jnp.where(owning_n, jnp.minimum(off_s // wk, nw), nw)
        cum = _exclusive_bounds(wid, nw, interpret=interpret)
        cum_win = _exclusive_bounds(jnp.minimum(offsets // wk, nw), nw,
                                    interpret=interpret)
    lo = jnp.clip(cum[:-1] - 1, 0, n_pad - cand_cap)
    lo = (lo // al) * al
    span_win = jnp.max(
        cum_win[1:] - jnp.maximum(cum_win[:-1] - 1, 0)) + al
    cand_scale_req = jnp.maximum(
        (span_sub + expand_mod.CSUB - 1) // expand_mod.CSUB,
        (span_win + expand_mod.CAND_CAP - 1) // expand_mod.CAND_CAP,
    ).astype(jnp.int32)

    meta_cols = [off_s, cnt_s, dkey_s, base_s, h_s]
    if has_attrs:
        # pidx column unused downstream (row 10 of the table is dropped
        # before the key sort); attr columns beyond n_attr are zero-filled
        cand_cols = (meta_cols + [zcol] + attr_srcs
                     + [zcol] * (10 - n_attr))
    else:
        cand_cols = meta_cols + [pidx] + attr_srcs
    cand = jnp.stack(
        [c.astype(jnp.float32) for c in cand_cols], axis=0
    )  # (16, n) SoA: off, cnt, dkey, base, h, pidx, attrs...
    cand = jnp.pad(cand, ((0, 0), (0, n_pad - n)))
    # The kernel locates each sub-window's candidate run by counting lanes
    # with off < window start; lanes that must not be counted (partition
    # mode: the zero-count suffix; both modes: the n_pad padding) sit
    # ABOVE every real offset via a huge off (their cnt=0 already makes
    # membership empty).
    owning = jnp.pad(owning_n, (0, n_pad - n), constant_values=False)
    cand = cand.at[0, :].set(
        jnp.where(owning, cand[0, :], expand_mod.PAD_OFF))

    lim = jnp.stack([
        jnp.minimum(total, key_cap).astype(jnp.int32),
        jnp.int32(sentinel),
    ])
    fused, tbl = expand_mod.expand_keys(
        cand, lo, lim, key_cap=key_cap, tiles_u=tiles_u,
        tile_w=tile_w, tile_h=tile_h,
        dbits=dbits, num_tiles=num_tiles,
        exact_cull=exact_tile_cull and has_attrs, cand_scale=cand_scale,
        interpret=interpret,
    )

    # ONE sort: every table column rides as a payload. CRITICAL operand
    # budget: XLA's TPU variadic sort falls off a cliff ABOVE 12 operands
    # (12 ops = 2.7 ms, 13 ops = 14.6 ms, 17 ops = 20.8 ms at 2M keys,
    # jax.profiler-attributed) — so the per-key point index only rides in
    # the no-attrs (test/tool) path, where the budget allows it; nothing in
    # the production pipeline consumes it (the backward maps keys to points
    # through offsets/counts instead).
    slot = jnp.arange(key_cap, dtype=jnp.int32)
    real = slot < jnp.minimum(total, key_cap)
    if has_attrs:
        # rgb_only (the reference K6 template flag, :342): the depth column
        # only feeds the depth image — drop it from the sort (sort cost is
        # ~linear in operand bytes) and zero-fill its table row. The
        # original-slot permutation only feeds the backward regroup, so it
        # rides only when gradients are possible (not rgb_only).
        slot_payload = () if rgb_only else (slot,)
        ride = [tbl[i] for i in range(n_attr)]
        # pack_colors (inference-only): the r and g rows ride the sort as
        # ONE bf16-pair carrier (ops/packing.py), cutting the dominant
        # operand bytes by one row. bf16 rounds colors by <= 2^-9 relative
        # — under the 1/255 display quantization but NOT under the 1e-4
        # oracle gates, so this stays an opt-in for rgb_only rendering
        # (packing happens on per-KEY rows AFTER expansion: the expand
        # kernel's Dekker one-hot matmul must see plain f32, a packed bit
        # pattern would not survive its bf16 3-term split).
        packed = pack_colors and rgb_only
        if packed:
            from taichi_3d_gaussian_splatting_tpu.ops import packing
            ride = ride[:6] + [
                packing.pack_bf16_pair_rne(ride[6], ride[7]), ride[8]]
        operands = (fused,) + slot_payload + tuple(ride)
        sorted_ops = jax.lax.sort(operands, num_keys=1, is_stable=True)
        fused_s = sorted_ops[0]
        orig_s = None if rgb_only else sorted_ops[1]
        attr0 = 1 if rgb_only else 2
        pidx_s = None
        srows = list(sorted_ops[attr0:])
        if packed:
            from taichi_3d_gaussian_splatting_tpu.ops import packing
            r_s, g_s = packing.unpack_bf16_pair(srows[6])
            srows = srows[:6] + [r_s, g_s, srows[7]]
        zeros = jnp.zeros((16 - n_attr, key_cap), jnp.float32)
        table = jnp.concatenate(
            [jnp.stack(srows, axis=0), zeros],
            axis=0,
        )  # (16, key_cap): rows 0..n_attr-1 attrs, rest zero
    else:
        sorted_ops = jax.lax.sort((fused, slot, tbl[10]), num_keys=1,
                                  is_stable=True)
        fused_s, orig_s, pidx_f = sorted_ops
        pidx_s = jnp.where(real, pidx_f.astype(jnp.int32), n)
        table = None
    tid_s = jax.lax.shift_right_logical(fused_s, dbits)

    bounds = _exclusive_bounds(tid_s, num_tiles, interpret=interpret)

    keys = TileKeys(
        point_idx=pidx_s,
        orig_slot=orig_s,
        real=real,
        tile_of_slot=jnp.minimum(tid_s, num_tiles - 1),
        tile_start=bounds[:-1],
        tile_end=bounds[1:],
        offsets=offsets,
        counts=counts,
        total=total,
        cand_scale_req=cand_scale_req,
    )
    return keys, table


def build_tile_keys(
    uv: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    width: int,
    height: int,
    tile,
    key_cap: int,
    depth_to_sort_key_scale: float = 2.0**10,
    interpret: bool = False,
) -> TileKeys:
    """Key structure only (no attribute table) — tests/tools entry point."""
    keys, _ = build_tile_keys_and_table(
        uv, depth, radius, visible, width, height, tile, key_cap,
        depth_to_sort_key_scale, attr_cols=None, interpret=interpret,
    )
    return keys


def regroup_rows_by_slot(rows: jnp.ndarray, orig_slot: jnp.ndarray,
                         key_cap: int) -> jnp.ndarray:
    """(R, cap_pad) tile-layout rows -> (R, key_cap) original key order.

    Sorts by ``orig_slot`` with every row riding as a payload — measured
    ~free next to any gather-based inverse permutation (payload operands
    barely change lax.sort cost, while the lane-gather alternative costs
    tens of ms). Every original slot in [0, key_cap) appears exactly once
    (real keys and never-laid-out slots alike), so sorted position i IS
    original slot i; layout padding (orig_slot >= key_cap) sorts to the
    tail and is cropped.
    """
    operands = (orig_slot,) + tuple(rows[i] for i in range(rows.shape[0]))
    out = jax.lax.sort(operands, num_keys=1, is_stable=False)
    return jnp.stack(out[1:], axis=0)[:, :key_cap]


def inverse_permutation(orig_slot: jnp.ndarray) -> jnp.ndarray:
    """sorted-order -> original-order permutation, via one extra sort.

    inv[o] = position of original slot o in the sorted array. Kept for
    tests/tools; the backward path uses regroup_rows_by_slot instead
    (payload-riding sort beats gather-by-inv on TPU).
    """
    cap_pad = orig_slot.shape[0]
    pos = jnp.arange(cap_pad, dtype=jnp.int32)
    sorted_orig, inv = jax.lax.sort((orig_slot, pos), num_keys=1)
    return inv
