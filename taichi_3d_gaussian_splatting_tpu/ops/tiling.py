"""Tile binning: bbox -> per-tile depth-sorted key lists, static shapes.

Behavioral reference: GaussianPointCloudRasterisation.py:81-236 (K2: overlap
counts, K3: key expansion, torch cumsum :913 / radix sort :947, K4: tile
ranges :175-193).

TPU redesign (measured on v5e, see PLAN.md):
- XLA scatters are slow (~5 ms/M updates) and gathers mediocre; the GPU
  recipe "scatter keys -> radix sort -> gather" is replaced by:
  * dense overlap counts over all N pool slots (masked),
  * run-length decode of key slots WITHOUT per-key scatter: one N-sized
    scatter-add of marks + a cumsum over the static key capacity,
  * one `jax.lax.sort` over (tile_id, depth_key) int32 pairs,
  * tile ranges via searchsorted with only num_tiles queries.
- The key buffer has a static capacity `key_cap`; slots beyond the actual
  total get tile_id = num_tiles (a sentinel) and sort to the end, outside
  every real tile's range. If the true total exceeds key_cap, the surplus
  keys of the highest-index points are dropped (the returned `total` lets
  callers detect this and grow the capacity).

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


class TileKeys(NamedTuple):
    """Sorted key lists with static capacity."""

    point_idx: jnp.ndarray    # (key_cap,) int32 pool slot of each key, sorted
    orig_slot: jnp.ndarray    # (key_cap,) int32 pre-sort slot (for inverse perm)
    tile_id: jnp.ndarray      # (key_cap,) int32 sorted tile ids (sentinel = T)
    tile_start: jnp.ndarray   # (num_tiles,) int32 range starts into the above
    tile_end: jnp.ndarray     # (num_tiles,) int32 range ends
    offsets: jnp.ndarray      # (N,) int32 exclusive cumsum of per-point counts
    counts: jnp.ndarray       # (N,) int32 per-point key counts (masked)
    total: jnp.ndarray        # () int32 true number of keys (may exceed cap)


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
) -> TileKeys:
    """Expand visible splats into per-tile keys and depth-sort within tiles.

    The depth key is int32(depth * scale), matching the reference's
    fixed-point encoding (GaussianPointCloudRasterisation.py:159-170); the
    (tile, depth) pair is sorted with a two-key lax.sort instead of packing
    into an int64.
    """
    n = uv.shape[0]
    tiles_u = width // tile
    num_tiles = tiles_u * (height // tile)

    bbox = tile_bbox(uv, radius, width, height, tile)
    counts = (bbox.max_u - bbox.min_u) * (bbox.max_v - bbox.min_v)
    counts = jnp.where(visible, counts, 0).astype(jnp.int32)

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1]

    # Run-length decode: point_of_slot[k] = index of the point owning key k.
    # marks[offsets[p]] += 1 for every p (zero-count points collapse onto the
    # next real offset; inclusive-cumsum - 1 then resolves ties to the last
    # tied point, which is the owning one).
    marks = jnp.zeros((key_cap,), jnp.int32).at[offsets].add(1, mode="drop")
    point_of_slot = jnp.cumsum(marks) - 1  # (key_cap,)

    slot = jnp.arange(key_cap, dtype=jnp.int32)
    valid = slot < total
    p = jnp.clip(point_of_slot, 0, n - 1)
    j = slot - offsets[p]

    # Decode local tile index j -> (du, dv): u-major like the reference
    # (K3 :152-157: tile_u outer loop, tile_v inner).
    h_p = (bbox.max_v - bbox.min_v)[p]
    du = j // jnp.maximum(h_p, 1)
    dv = j - du * jnp.maximum(h_p, 1)
    tu = bbox.min_u[p] + du
    tv = bbox.min_v[p] + dv
    tid = jnp.where(valid, tu + tv * tiles_u, num_tiles).astype(jnp.int32)

    dkey = (depth[p] * depth_to_sort_key_scale).astype(jnp.int32)
    dkey = jnp.where(valid, dkey, jnp.iinfo(jnp.int32).max)

    tid_s, _, pidx_s, orig_s = jax.lax.sort(
        (tid, dkey, p.astype(jnp.int32), slot), num_keys=2
    )

    # Per-tile ranges: num_tiles+1 binary searches over the sorted tile ids.
    bounds = jnp.searchsorted(
        tid_s, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_start = bounds[:-1]
    tile_end = bounds[1:]

    return TileKeys(
        point_idx=pidx_s,
        orig_slot=orig_s,
        tile_id=tid_s,
        tile_start=tile_start,
        tile_end=tile_end,
        offsets=offsets,
        counts=counts,
        total=total,
    )


def inverse_permutation(orig_slot: jnp.ndarray) -> jnp.ndarray:
    """sorted-order -> original-order permutation, via one extra sort.

    inv[o] = position of original slot o in the sorted array. Used by the
    backward pass to bring per-key gradients back to the contiguous
    per-point layout before the ragged segment reduction. A sort is used
    instead of a scatter (scatters are slower than sorts on TPU for this
    size; see PLAN.md measurements).
    """
    cap = orig_slot.shape[0]
    pos = jnp.arange(cap, dtype=jnp.int32)
    _, inv = jax.lax.sort((orig_slot, pos), num_keys=1)
    return inv
