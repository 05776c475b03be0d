"""Dense jnp reference blender — the behavioral oracle for the Pallas kernels.

Implements exactly the alpha-blend semantics of the reference forward kernel
(GaussianPointCloudRasterisation.py:318-485):

- alpha = pdf_conic(pixel) * rescale * sigmoid(opacity)
- contributions with alpha < 1/255 are skipped entirely (no T update)
- alpha is clamped at 0.99 (straight-through for gradients: the reference
  backward ignores the clamp, :652-668)
- blending saturates stickily once T would drop below 1e-4 (:457-460): the
  triggering point and all later points are excluded
- pixel centers at +0.5 (:444-447); no background blend (color starts at 0)
- depth output is alpha-weighted, normalized by max(sum w, 1e-6) (:479-480)

The whole pixel-state machine is re-expressed as one cumulative product
P_i = prod_{j<=i} (1 - a_j) (a_j = 0 when skipped): T_i = P_{i-1}, the
inclusion mask is P_i >= 1e-4, and the final transmittance is P at the last
included point. This makes the semantics data-parallel (scan-free) and
exactly autodiff-able, which is what the Pallas kernels replicate.

Complexity is O(pixels x points) — use for tests and tiny scenes only.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

ALPHA_SKIP_EPS = 1.0 / 255.0
ALPHA_CLAMP = 0.99
T_SATURATION_EPS = 1e-4


def straight_through_clamp(a: jnp.ndarray) -> jnp.ndarray:
    """min(a, 0.99) in value, identity in gradient (reference bwd :652-668)."""
    return a - lax.stop_gradient(a - jnp.minimum(a, ALPHA_CLAMP))


def blend_dense(
    pixel_xy: jnp.ndarray,   # (P, 2) pixel centers (+0.5 already applied)
    member: jnp.ndarray,     # (P, L) bool: point may contribute to pixel
    uv: jnp.ndarray,         # (L, 2)  depth-ordered splat centers
    conic: jnp.ndarray,      # (L, 4)  (a, b, c, rescale)
    opacity: jnp.ndarray,    # (L,)    sigmoid opacity
    color: jnp.ndarray,      # (L, 3)
    depth: jnp.ndarray,      # (L,)
):
    """Blend L depth-ordered splats into P pixels; returns per-pixel outputs.

    Points must already be depth-sorted; `member` encodes the per-tile
    culling (pixel's tile inside the splat's tile bbox).
    """
    dx = pixel_xy[:, 0:1] - uv[None, :, 0]  # (P, L)
    dy = pixel_xy[:, 1:2] - uv[None, :, 1]
    a_, b_, c_, resc = conic[:, 0], conic[:, 1], conic[:, 2], conic[:, 3]
    expo = -0.5 * (dx * dx * a_[None, :] + dy * dy * c_[None, :]) - dx * dy * b_[None, :]
    alpha_u = jnp.exp(expo) * (resc * opacity)[None, :]
    alpha_u = jnp.where(member, alpha_u, 0.0)

    # not(>=) form catches NaN like the Pallas kernel does
    skip = jnp.logical_not(alpha_u >= ALPHA_SKIP_EPS)
    a = jnp.where(skip, 0.0, straight_through_clamp(alpha_u))

    # P_i inclusive cumulative transmittance; T_i = exclusive.
    one_minus = 1.0 - a
    P_incl = jnp.cumprod(one_minus, axis=1)
    T = P_incl / one_minus  # exclusive product; a <= 0.99 so 1-a >= 0.01

    include = (~skip) & (P_incl >= T_SATURATION_EPS)
    w = jnp.where(include, a * T, 0.0)  # (P, L)

    rgb = w @ color  # (P, 3)
    w_sum = jnp.sum(w, axis=1)
    depth_out = (w @ depth) / jnp.maximum(w_sum, 1e-6)
    # Final transmittance: product over included points only.
    T_final = jnp.prod(jnp.where(include, one_minus, 1.0), axis=1)
    count = jnp.sum(include, axis=1).astype(jnp.int32)
    return rgb, depth_out, 1.0 - T_final, count, w_sum


def render_reference(xyz, features, invalid_mask, q_pointcloud_camera,
                     t_pointcloud_camera, camera, cfg, sh_max_band=3):
    """Full-image oracle renderer: O(pixels x points), differentiable.

    Mirrors the production pipeline's semantics exactly (same membership
    rule, same per-tile depth ordering realized as a global stable
    depth-key sort) but with dense jnp only. Tests compare the Pallas path
    against this.
    """
    from taichi_3d_gaussian_splatting_tpu.ops import tiling
    from taichi_3d_gaussian_splatting_tpu.ops.attributes import frustum_cull_mask
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import compute_raw_attrs

    tile_w, tile_h = tiling.tile_wh(
        (cfg.tile_size, cfg.tile_size if cfg.tile_h is None else cfg.tile_h))
    raw, radius = compute_raw_attrs(
        xyz, features, q_pointcloud_camera, t_pointcloud_camera, camera,
        sh_max_band,
    )
    visible = frustum_cull_mask(
        lax.stop_gradient(raw.uv), lax.stop_gradient(raw.depth), invalid_mask,
        camera.width, camera.height, cfg.near_plane, cfg.far_plane,
        (tile_w, tile_h), boundary_tiles_v=cfg.cull_pad_v_tiles,
    )
    sg = lax.stop_gradient
    # mirror production's depth-key truncation (tiling.py _depth_bits +
    # clip): beyond the key range, production orders by slot index
    num_tiles = (camera.width // tile_w) * (camera.height // tile_h)
    dbits = tiling._depth_bits(num_tiles)
    dkey = jnp.clip(
        (sg(raw.depth) * cfg.depth_to_sort_key_scale).astype(jnp.int32),
        0, (1 << dbits) - 1,
    )
    dkey = jnp.where(visible, dkey, jnp.iinfo(jnp.int32).max)
    n = xyz.shape[0]
    order = lax.sort((dkey, jnp.arange(n, dtype=jnp.int32)), num_keys=1)[1]

    bbox = tiling.tile_bbox(
        sg(raw.uv), sg(radius), camera.width, camera.height, (tile_w, tile_h)
    )
    h, w_ = camera.height, camera.width
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w_), indexing="ij")
    pix_tu = (xs // tile_w).reshape(-1)
    pix_tv = (ys // tile_h).reshape(-1)
    member = (
        (pix_tu[:, None] >= bbox.min_u[order][None, :])
        & (pix_tu[:, None] < bbox.max_u[order][None, :])
        & (pix_tv[:, None] >= bbox.min_v[order][None, :])
        & (pix_tv[:, None] < bbox.max_v[order][None, :])
        & visible[order][None, :]
    )
    pixel_xy = jnp.stack(
        [xs.reshape(-1) + 0.5, ys.reshape(-1) + 0.5], axis=-1
    ).astype(jnp.float32)
    # mirror production's pre-kernel attribute sanitize (build_keys):
    # a NaN row on a NON-member point would still poison every pixel via
    # 0 * NaN in the weight matmuls
    def fin(x):
        return jnp.where(jnp.isfinite(x), x, 0.0)

    rgb, depth, alpha, count, _ = blend_dense(
        pixel_xy, member, fin(raw.uv[order]), fin(raw.conic[order]),
        fin(raw.opacity[order]), fin(raw.color[order]),
        fin(raw.depth[order]),
    )
    return (
        rgb.reshape(h, w_, 3), depth.reshape(h, w_), alpha.reshape(h, w_),
        count.reshape(h, w_),
    )
