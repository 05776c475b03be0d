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


CHUNK = 128  # must match blend_pallas.CHUNK: tile ranges are aligned to it


def padded_capacity(key_cap: int, num_tiles: int) -> int:
    """Static size of the chunk-aligned key layout."""
    return key_cap + CHUNK * num_tiles


class TileKeys(NamedTuple):
    """Depth-sorted per-tile key lists in a CHUNK-aligned static layout.

    Each tile's keys occupy [tile_start[t], tile_start[t] + count) inside a
    region padded up to a multiple of CHUNK (=128); the alignment lets the
    Pallas kernels DMA (16, 128) windows at lane-aligned offsets (Mosaic
    rejects unaligned / narrow HBM slices) and gives every tile a private
    scratch tail for its last partial chunk.
    """

    point_idx: jnp.ndarray    # (cap_pad,) int32 pool slot per key (pad: N)
    orig_slot: jnp.ndarray    # (cap_pad,) int32 pre-sort slot; pads get
                              # key_cap + j (unique, sort after all real)
    real: jnp.ndarray         # (cap_pad,) bool: actual key vs padding
    tile_of_slot: jnp.ndarray # (cap_pad,) int32 owning tile of each slot
    tile_start: jnp.ndarray   # (num_tiles,) int32, CHUNK-aligned
    tile_end: jnp.ndarray     # (num_tiles,) int32 = start + true count
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
    counts_t = bounds[1:] - bounds[:-1]

    # Re-layout into the CHUNK-aligned space: same run-length-decode trick
    # as above, this time over tiles (num_tiles marks + one cumsum).
    cap_pad = padded_capacity(key_cap, num_tiles)
    padded_len = ((counts_t + CHUNK - 1) // CHUNK) * CHUNK
    padded_start = jnp.cumsum(padded_len) - padded_len
    marks_t = jnp.zeros((cap_pad,), jnp.int32).at[padded_start].add(
        1, mode="drop"
    )
    tile_of_pad = jnp.clip(jnp.cumsum(marks_t) - 1, 0, num_tiles - 1)
    j_local = jnp.arange(cap_pad, dtype=jnp.int32) - padded_start[tile_of_pad]
    src = jnp.clip(bounds[:-1][tile_of_pad] + j_local, 0, key_cap - 1)
    real = j_local < counts_t[tile_of_pad]

    point_idx = jnp.where(real, pidx_s[src], n)
    orig_slot = jnp.where(
        real, orig_s[src], key_cap + jnp.arange(cap_pad, dtype=jnp.int32)
    )

    return TileKeys(
        point_idx=point_idx,
        orig_slot=orig_slot,
        real=real,
        tile_of_slot=tile_of_pad.astype(jnp.int32),
        tile_start=padded_start.astype(jnp.int32),
        tile_end=(padded_start + counts_t).astype(jnp.int32),
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
    cap_pad = orig_slot.shape[0]
    pos = jnp.arange(cap_pad, dtype=jnp.int32)
    sorted_orig, inv = jax.lax.sort((orig_slot, pos), num_keys=1)
    # Entries [0, total) are the real keys; later entries map padding/sentinel
    # slots to garbage rows, which callers mask with (slot < total).
    return inv
