"""Tile binning: bbox -> per-tile depth-sorted key lists, static shapes.

Behavioral reference: GaussianPointCloudRasterisation.py:81-236 (K2: overlap
counts, K3: key expansion, torch cumsum :913 / radix sort :947, K4: tile
ranges :175-193).

TPU redesign, driven by measured v5e cost cliffs (scripts/tpu_breakdown.py;
all numbers at 1M keys / 2M capacity):
- single-column random gathers are catastrophic (~15 us/element — XLA
  lowers them to serial dynamic slices); even sorted-index 1-col gathers
  cost ~19 ms. Multi-column ROW gathers (~8 cols) take ~13 ms total.
- `lax.sort` is nearly free by comparison (~6-7 ms for 2M keys) and extra
  payload operands are free — so data should ride ALONG sorts, never be
  gathered after them.
- scatter-adds are ~20 ms for (N, 8) rows; cumsums ~3 ms.

Consequently this module performs ZERO single-column gathers:
1. per-point key expansion is a "diff-scatter + cumsum" broadcast: all
   per-point columns (offset, bbox, depth key) are written once as row
   DIFFS at each point's first key slot and integrated with one cumsum —
   ties from zero-count points telescope to the owning point;
2. tile id and depth quantizer fuse into ONE int32 sort key
   (tid << depth_bits | dkey), sorted once with the point index and the
   pre-sort slot riding as payloads;
3. per-tile [start, end) ranges come from a Pallas bucket histogram +
   tiny cumsum; keys stay in plain sorted order and the blend kernels
   handle the unaligned ranges with lane masks.

The key buffer has a static capacity `key_cap`; slots beyond the actual
total get the sentinel tile id and sort to the end, outside every real
tile's range. If the true total exceeds key_cap, the surplus keys of the
highest-index points are dropped (the returned `total` lets callers detect
this and grow the capacity).

Tiles are TILE x TILE pixels (default 32 on TPU: fewer keys to sort/gather
at +35% pixel-pair work, the right trade on this hardware; the reference's
CUDA block size dictated 16).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TileBBox(NamedTuple):
    """Inclusive-exclusive tile index bounds per point, shapes (N,) int32."""

    min_u: jnp.ndarray
    max_u: jnp.ndarray
    min_v: jnp.ndarray
    max_v: jnp.ndarray


def tile_bbox(
    uv: jnp.ndarray, radius: jnp.ndarray, width: int, height: int, tile: int
) -> TileBBox:
    """Conservative tile bounding box of a splat.

    Reference: GaussianPointCloudRasterisation.py:81-103
    (get_bounding_box_by_point_and_radii), with TILE_WIDTH generalized.
    """
    tiles_u = width // tile
    tiles_v = height // tile
    r = jnp.maximum(radius, 1.0)
    min_u_px = jnp.maximum(0.0, uv[:, 0] - r)
    max_u_px = uv[:, 0] + r
    min_v_px = jnp.maximum(0.0, uv[:, 1] - r)
    max_v_px = uv[:, 1] + r

    min_tu = jnp.minimum(jnp.floor_divide(min_u_px, tile).astype(jnp.int32), tiles_u)
    max_tu = jnp.floor_divide(max_u_px, tile).astype(jnp.int32) + 1
    max_tu = jnp.minimum(jnp.maximum(max_tu, min_tu + 1), tiles_u)
    min_tv = jnp.minimum(jnp.floor_divide(min_v_px, tile).astype(jnp.int32), tiles_v)
    max_tv = jnp.floor_divide(max_v_px, tile).astype(jnp.int32) + 1
    max_tv = jnp.minimum(jnp.maximum(max_tv, min_tv + 1), tiles_v)
    return TileBBox(min_tu, max_tu, min_tv, max_tv)


CHUNK = 128  # must match blend_pallas.CHUNK (DMA window width)




class TileKeys(NamedTuple):
    """Depth-sorted per-tile key lists in plain sorted order.

    Each tile's keys occupy the unaligned range
    [tile_start[t], tile_end[t]); slots beyond `total` hold sentinel keys
    that sort to the end, outside every tile's range. The blend kernels DMA
    CHUNK-aligned windows around each range and mask the straddling lanes.
    """

    point_idx: jnp.ndarray    # (key_cap,) int32 pool slot per key (pad: N)
    orig_slot: jnp.ndarray    # (key_cap,) int32 pre-sort slot (permutation)
    real: jnp.ndarray         # (key_cap,) bool: actual key vs padding
    tile_of_slot: jnp.ndarray # (key_cap,) int32 owning tile of each key
    tile_start: jnp.ndarray   # (num_tiles,) int32 (unaligned)
    tile_end: jnp.ndarray     # (num_tiles,) int32
    offsets: jnp.ndarray      # (N,) int32 exclusive cumsum of per-point counts
    counts: jnp.ndarray       # (N,) int32 per-point key counts (masked)
    total: jnp.ndarray        # () int32 true number of keys (may exceed cap)


def _expand_columns(cols: jnp.ndarray, offsets: jnp.ndarray, cap: int):
    """Broadcast per-point rows to key slots without gathers.

    cols: (N, C) int32 per-point values; offsets: (N,) their first key slot
    (non-decreasing). Returns (cap, C) where slot k holds the values of the
    LAST point whose offset <= k — for slots inside a point's key range
    that is exactly the owning point (zero-count points share an offset
    with their successor and telescope away).

    Mechanism: scatter-ADD consecutive row differences at the offsets, then
    integrate with a cumsum. Sums of ties telescope, so the cumsum equals
    the last tied row. The scatter runs COLUMN BY COLUMN with the update
    count padded to a power of two: 1-col scatter-adds measured ~4x faster
    than the (N, C) row form, which can also fall into a pathologically
    serial lowering (50 s at N=428k) at some shapes.
    """
    n, c = cols.shape
    n_pad = 1 << max((n - 1).bit_length(), 1)
    diffs = jnp.diff(cols, axis=0, prepend=jnp.zeros((1, c), cols.dtype))
    diffs = jnp.pad(diffs, ((0, n_pad - n), (0, 0)))
    offsets_p = jnp.pad(offsets, (0, n_pad - n), constant_values=cap + 1)
    out_cols = []
    for j in range(c):
        grid = jnp.zeros((cap,), cols.dtype).at[offsets_p].add(
            diffs[:, j], mode="drop")
        out_cols.append(jnp.cumsum(grid))
    return jnp.stack(out_cols, axis=1)


def _depth_bits(num_tiles: int) -> int:
    """Bits available for the depth key under the fused int32 sort key
    (capped so h + 128*dkey also fits an int32 in the packed expansion)."""
    tid_bits = max(int(num_tiles + 1).bit_length(), 1)
    return min(31 - tid_bits, 23)


def build_tile_keys(
    uv: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    visible: jnp.ndarray,
    width: int,
    height: int,
    tile: int,
    key_cap: int,
    depth_to_sort_key_scale: float = 2.0**10,
    interpret: bool = False,
) -> TileKeys:
    """Expand visible splats into per-tile keys and depth-sort within tiles.

    The depth key is int32(depth * scale), matching the reference's
    fixed-point encoding (GaussianPointCloudRasterisation.py:159-170),
    clamped to the bits left beside the tile id in the fused sort key
    (beyond-range depths saturate and fall back to stable slot order).
    """
    n = uv.shape[0]
    tiles_u = width // tile
    num_tiles = tiles_u * (height // tile)
    dbits = _depth_bits(num_tiles)

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
    h_pt = bbox.max_v - bbox.min_v
    ridx = jnp.arange(1, n + 1, dtype=jnp.int32)  # running index: diff == 1
    # The expansion is LINEAR (diff -> scatter-add -> cumsum), so multiple
    # small fields pack into one column as linear combinations and unpack
    # after: base = min_u + tiles_u*min_v is exactly the tid base; hk packs
    # the bbox height (7 bits: h <= tiles_v <= 128 at 4096 px) beside
    # the depth key. 4 columns — the scatter-add cost cliff sits above 4.
    base_pt = bbox.min_u + tiles_u * bbox.min_v
    hk_pt = h_pt + 128 * dkey_pt
    cols = jnp.stack([ridx, offsets, base_pt, hk_pt], axis=1)
    E = _expand_columns(cols, offsets, key_cap)  # (key_cap, 4)
    p = E[:, 0] - 1                  # owning point per key slot
    offs_e = E[:, 1]
    base_e = E[:, 2]
    h_e = E[:, 3] % 128
    dkey_e = E[:, 3] // 128

    slot = jnp.arange(key_cap, dtype=jnp.int32)
    valid = slot < total

    # Decode local tile index j -> (du, dv): u-major like the reference
    # (K3 :152-157: tile_u outer loop, tile_v inner).
    j = slot - offs_e
    hh = jnp.maximum(h_e, 1)
    du = j // hh
    dv = j - du * hh
    tid = jnp.where(valid, base_e + du + dv * tiles_u, num_tiles)
    fused = jnp.where(
        valid,
        (tid << dbits) | dkey_e,
        jnp.int32(((num_tiles + 1) << dbits) - 1),
    )

    fused_s, pidx_s, orig_s = jax.lax.sort(
        (fused, jnp.where(valid, p, n).astype(jnp.int32), slot),
        num_keys=1, is_stable=True,
    )
    tid_s = jax.lax.shift_right_logical(fused_s, dbits)

    # Per-tile ranges from a Pallas bucket histogram over the (unsorted)
    # tile ids + tiny cumsum — equivalent to searchsorted over the sorted
    # ids but ~10x cheaper (searchsorted's sort lowering costs ~16 ms at 2M
    # keys; the binary-search lowering ~14 us per query element).
    from taichi_3d_gaussian_splatting_tpu.ops.histogram import bucket_histogram

    counts_t = bucket_histogram(tid, num_tiles, interpret=interpret)
    bounds = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(counts_t.astype(jnp.float32)).astype(jnp.int32),
    ])

    # Keys stay in PLAIN sorted order: the blend kernels handle unaligned
    # [start, end) ranges with lane masks (+ a read-modify-write of the one
    # boundary window shared between consecutive tiles in the backward), so
    # no chunk-aligned re-layout — and none of its expansion/gather cost —
    # is needed.
    return TileKeys(
        point_idx=pidx_s,
        orig_slot=orig_s,
        real=valid,                 # sorted: exactly the first `total` slots
        tile_of_slot=jnp.minimum(tid_s, num_tiles - 1),
        tile_start=bounds[:-1],
        tile_end=bounds[1:],
        offsets=offsets,
        counts=counts,
        total=total,
    )


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
