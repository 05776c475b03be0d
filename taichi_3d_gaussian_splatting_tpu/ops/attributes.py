"""Per-point screen-space attributes (the reference's K5 kernel, jnp-native).

Behavioral reference: GaussianPointCloudRasterisation.py:239-315
(generate_point_attributes_in_camera_plane). On TPU this stage is a dense,
fully-vectorized jnp function over ALL N pool slots (no M-compaction: XLA
wants static shapes, and the dense math is cheap); invisible/invalid points
are handled downstream with masks. The function is differentiable end-to-end
— the reference's hand-derived Jacobians (its backward "phase 2",
GaussianPointCloudRasterisation.py:707-772) are obtained here via jax.vjp.

Feature layout (reference GaussianPointCloudScene.py to_parquet :137-142):
  feat[0:4]   quaternion xyzw
  feat[4:7]   log scale
  feat[7]     pre-sigmoid opacity
  feat[8:24]  SH coefficients, R channel (band <= 3)
  feat[24:40] SH G
  feat[40:56] SH B
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops import projection as proj
from taichi_3d_gaussian_splatting_tpu.ops.sh import sh_basis
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    quaternion_to_rotation_matrix,
)

NUM_FEATURES = 56


class PointAttributes(NamedTuple):
    """Screen-space attributes, one row per pool slot (all shapes (N, ...))."""

    uv: jnp.ndarray            # (N, 2) pixel coords of the projected center
    xyz_cam: jnp.ndarray       # (N, 3) camera-frame position (z = depth)
    cov2d: jnp.ndarray         # (N, 3) projected covariance (a, b, c), unfiltered
    conic: jnp.ndarray         # (N, 4) filtered inverse cov (a, b, c) + rescale
    opacity: jnp.ndarray       # (N,)  sigmoid(alpha)
    color: jnp.ndarray         # (N, 3) SH color along camera->point ray
    radius: jnp.ndarray        # (N,)  conservative splat radius in pixels
    radius_xy: jnp.ndarray     # (N, 2) per-axis LOSSLESS cull radius (px)


def compute_point_attributes(
    xyz: jnp.ndarray,            # (N, 3)
    features: jnp.ndarray,       # (N, 56)
    q_cam: jnp.ndarray,          # (4,) world->camera rotation, xyzw
    t_cam: jnp.ndarray,          # (3,) world->camera translation
    K: jnp.ndarray,              # (3, 3)
    camera_center: jnp.ndarray,  # (3,) camera origin in world frame
    sh_max_band: int | jnp.ndarray = 3,
) -> PointAttributes:
    """Project every pool slot to screen space.

    ``sh_max_band`` progressively masks SH bands like the reference trainer's
    color_max_sh_band schedule (GaussianPointTrainer.py:168 together with
    _clear_grad_by_color_max_sh_band, GaussianPointCloudRasterisation.py:
    1167-1182). Masking the bands in the forward (rather than zeroing grads
    like the reference) gives the same optimization behavior under jit.
    """
    R_cw = quaternion_to_rotation_matrix(q_cam)

    quat = features[:, 0:4]
    # guarded normalize: zero-padded invalid rows would otherwise produce
    # 0/0 = NaN whose VJP leaks past zero cotangents (0 * NaN)
    quat = quat / jnp.maximum(
        jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    log_scale = features[:, 4:7]
    alpha_logit = features[:, 7]
    sh = features[:, 8:56].reshape(-1, 3, 16)

    uv, xyz_cam = proj.project_point(xyz, R_cw, t_cam, K)
    # component form: identical math to project_covariance +
    # conic_and_rescale + splat_radius, ~15x faster on TPU (no batched
    # small-matrix fusions; see projection.project_cov2d_components)
    a, b, c = proj.project_cov2d_components(quat, log_scale, R_cw, K, xyz_cam)
    ca, cb, cc, rescale, radius = proj.conic_rescale_radius_components(a, b, c)
    conic = jnp.stack([ca, cb, cc, rescale], axis=-1)
    cov2d = jnp.stack([a, b, c], axis=-1)

    opacity = jax.nn.sigmoid(alpha_logit)  # stable VJP at logits < -88

    # Per-axis OUTPUT-LOSSLESS cull radius. The blend skips contributions
    # with alpha = exp(-q/2) * rescale * opacity < 1/255, and the axis
    # extent of the sub-level set {q <= qm} of the filtered quadratic is
    # sqrt(qm * Sigma_axis) — so tiles beyond min(reference 3*sqrt(lam_max),
    # per-axis skip extent) contain only pixels the blend would skip anyway.
    # Typically 30-60% fewer tile keys than the reference's square bbox
    # (K2, :81-103), with bit-identical rendered output.
    qm = 2.0 * jnp.log(jnp.maximum(255.0 * conic[:, 3] * opacity, 1e-30))
    qm = jnp.maximum(qm, 0.0)
    af = cov2d[:, 0] + proj.COV2D_FILTER
    cf = cov2d[:, 2] + proj.COV2D_FILTER
    rx = jnp.minimum(radius, jnp.sqrt(qm * jnp.maximum(af, 0.0)))
    ry = jnp.minimum(radius, jnp.sqrt(qm * jnp.maximum(cf, 0.0)))
    radius_xy = jnp.stack([rx, ry], axis=-1)

    # SH color along the camera->point direction (reference K5 :294-308).
    direction = xyz - camera_center
    basis = sh_basis(direction)  # (N, 16)
    band_mask = _sh_band_mask(sh_max_band, basis.dtype)
    # elementwise mul + reduce, NOT einsum: a batched (3,16)x(16,) einsum
    # lowers to the pathological batched-small-matmul path on TPU (same
    # cliff as the EWA 3x3 products; see projection.py), and this form is
    # exact f32 on the VPU with no precision pin needed
    raw = jnp.sum(sh * (basis * band_mask)[:, None, :], axis=-1)
    color = jax.nn.sigmoid(raw)

    return PointAttributes(
        uv=uv, xyz_cam=xyz_cam, cov2d=cov2d, conic=conic,
        opacity=opacity, color=color, radius=radius, radius_xy=radius_xy,
    )


def _sh_band_mask(max_band, dtype):
    """(16,) mask keeping coefficients of bands <= max_band.

    Works with traced ``max_band`` so the trainer can jit one step function
    for the whole progressive schedule.
    """
    coeff_band = jnp.asarray(
        [0, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3], dtype=jnp.int32
    )
    return (coeff_band <= jnp.asarray(max_band, jnp.int32)).astype(dtype)


def frustum_cull_mask(
    uv: jnp.ndarray,
    depth: jnp.ndarray,
    invalid_mask: jnp.ndarray,
    width: int,
    height: int,
    near: float,
    far: float,
    tile_size,
    boundary_tiles: int = 3,
    boundary_tiles_v: int | None = None,
) -> jnp.ndarray:
    """Visibility mask (the reference's K1, GaussianPointCloudRasterisation.py:31-78).

    Keeps points with near < z < far whose projected center lies within the
    image padded by ``boundary_tiles`` tiles (BOUNDARY_TILES=3, :26).
    ``tile_size`` accepts an int or (tile_w, tile_h); the DEFAULT vertical
    pad uses tile_w for both axes so rectangular blend tiles never cull
    more aggressively than the square-tile (and reference) semantics.
    ``boundary_tiles_v`` overrides the vertical pad in units of tile ROWS
    (tile_h px each) — band-sharded rendering (parallel/tile_parallel.py)
    widens it so splats centered in other bands still reach this band's
    pixels.
    """
    from taichi_3d_gaussian_splatting_tpu.ops.tiling import tile_wh
    tile_w, tile_h = tile_wh(tile_size)
    pad_u = tile_w * boundary_tiles
    pad_v = (tile_w * boundary_tiles if boundary_tiles_v is None
             else tile_h * boundary_tiles_v)
    in_depth = (depth > near) & (depth < far)
    in_u = (uv[:, 0] >= -pad_u) & (uv[:, 0] < width + pad_u)
    in_v = (uv[:, 1] >= -pad_v) & (uv[:, 1] < height + pad_v)
    return in_depth & in_u & in_v & jnp.logical_not(invalid_mask)
