"""Band-sharded (tile-parallel) rendering: one image split across chips.

The complement of parallel/data_parallel.py (SURVEY.md §7 step 6): instead
of one camera per device, ONE camera's image is split into horizontal bands
of tile rows, each rasterized by a different device against the full
(replicated) Gaussian pool. This is the 3DGS analogue of context/sequence
parallelism (SURVEY.md §5 "long-context"): it partitions the pixels x
points interaction while keeping per-device state bounded, so arbitrarily
large images scale across ICI with zero communication in the forward pass
(the output is simply sharded over rows).

Semantics match the single-device render exactly:
- visibility is computed against the FULL image (the reference's 3-tile
  boundary cull, K1 :26) and passed down as the invalid mask, so band
  membership never re-culls a splat another band's pixels need;
- each band renders through a principal-point-shifted camera with a
  vertical cull pad wide enough to accept every full-image-visible splat;
- splats whose extent misses a band produce EMPTY tile bboxes (see
  tiling.tile_bbox), so per-band key counts stay proportional to the
  band's actual workload.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from taichi_3d_gaussian_splatting_tpu.ops.attributes import frustum_cull_mask
from taichi_3d_gaussian_splatting_tpu.ops.projection import project_point
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera,
    RasterizeOutput,
    RasterizerConfig,
    rasterize,
)
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    inverse_qt,
    quaternion_to_rotation_matrix,
)


def make_band_mesh(n_devices: Optional[int] = None,
                   axis: str = "band") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def rasterize_band_sharded(
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    invalid_mask: jnp.ndarray,
    q_pointcloud_camera: jnp.ndarray,
    t_pointcloud_camera: jnp.ndarray,
    camera: Camera,
    cfg: RasterizerConfig,
    mesh: Mesh,
    axis: str = "band",
    sh_max_band=3,
) -> RasterizeOutput:
    """Render one camera with its tile rows sharded over ``mesh[axis]``.

    Returns a RasterizeOutput whose arrays are sharded over image rows
    (P(axis) on dim 0); camera.height must divide by n_devices * tile_size.
    """
    n_dev = mesh.shape[axis]
    tile = cfg.tile_size
    assert camera.height % (n_dev * tile) == 0, (
        f"height {camera.height} must divide {n_dev} bands of {tile}-px tiles"
    )
    band_h = camera.height // n_dev
    tiles_v_total = camera.height // tile
    # always the partition candidate path: per-band key density is ~1/n_dev
    # of the full frame any direct-mode cand_scale was probed on, so an
    # inherited direct config would silently drop keys in every band
    cfg_band = dataclasses.replace(
        cfg, cull_pad_v_tiles=tiles_v_total + 3,
        candidate_mode="partition", cand_scale=1)

    def per_device(xyz, feats, inval, q, t, K):
        idx = jax.lax.axis_index(axis)
        # full-image visibility (reference cull semantics), band-independent
        q_cw, t_cw = inverse_qt(q.reshape(4), t.reshape(3))
        uv_full, xyz_cam = project_point(
            xyz, quaternion_to_rotation_matrix(q_cw), t_cw, K)
        vis_full = frustum_cull_mask(
            uv_full, xyz_cam[:, 2], inval, camera.width, camera.height,
            cfg.near_plane, cfg.far_plane, tile,
        )
        K_band = K.at[1, 2].add(-(idx * band_h).astype(K.dtype))
        cam_band = Camera(K=K_band, width=camera.width, height=band_h)
        return rasterize(
            xyz, feats, jnp.logical_not(vis_full), q, t, cam_band, cfg_band,
            sh_max_band=sh_max_band,
        )

    rep = P()
    out_specs = RasterizeOutput(
        rgb=P(axis), depth=P(axis), alpha=P(axis), count=P(axis))
    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(xyz, features, invalid_mask, q_pointcloud_camera,
              t_pointcloud_camera, camera.K)
