"""Ray generation and ray-ellipsoid intersection, batched jnp.

Behavioral reference: taichi_3d_gaussian_splatting/utils.py:12-82
(intersect_ray_with_ellipsoid), :170-197
(get_ray_origin_and_direction_by_uv) — device helpers used for picking /
camera interaction. Branch-free reimplementation broadcasting over leading
batch axes.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    inverse_se3,
    quaternion_to_rotation_matrix,
)


def ray_from_pixel(
    uv: jnp.ndarray,                  # (..., 2) integer or float pixel coords
    camera_intrinsics: jnp.ndarray,   # (3, 3)
    T_camera_pointcloud: jnp.ndarray,  # (4, 4) world->camera
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(origin (..., 3), unit direction (..., 3)) in the world frame,
    through the pixel centers (+0.5). Reference: utils.py:170-197."""
    fx = camera_intrinsics[0, 0]
    fy = camera_intrinsics[1, 1]
    cx = camera_intrinsics[0, 2]
    cy = camera_intrinsics[1, 2]
    center = uv + 0.5
    d_cam = jnp.stack(
        [(center[..., 0] - cx) / fx, (center[..., 1] - cy) / fy,
         jnp.ones_like(center[..., 0])], axis=-1,
    )
    T_pc = inverse_se3(T_camera_pointcloud)
    origin = jnp.broadcast_to(T_pc[:3, 3], d_cam.shape)
    direction = jnp.einsum("ij,...j->...i", T_pc[:3, :3], d_cam)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    return origin, direction


def intersect_ray_with_ellipsoid(
    ray_origin: jnp.ndarray,      # (..., 3)
    ray_direction: jnp.ndarray,   # (..., 3)
    ellipsoid_R: jnp.ndarray,     # (..., 3, 3)
    ellipsoid_t: jnp.ndarray,     # (..., 3)
    ellipsoid_S: jnp.ndarray,     # (..., 3) semi-axes
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hit (...,) bool, intersection point (..., 3)).

    Transforms the ray into the unit-sphere frame and solves the quadratic,
    keeping the nearest non-negative root (reference utils.py:12-82,
    including its eps clamping of A and the discriminant).
    """
    Rt = jnp.swapaxes(ellipsoid_R, -1, -2)
    o_local = jnp.einsum("...ij,...j->...i", Rt,
                         ray_origin - ellipsoid_t) / ellipsoid_S
    d_local = jnp.einsum("...ij,...j->...i", Rt, ray_direction) / ellipsoid_S

    A = jnp.sum(d_local * d_local, axis=-1)
    A = jnp.where(jnp.abs(A) < eps, eps, A)
    B = 2.0 * jnp.sum(o_local * d_local, axis=-1)
    C = jnp.sum(o_local * o_local, axis=-1) - 1.0

    disc = B * B - 4.0 * A * C
    disc_c = jnp.where(jnp.abs(disc) < eps, 0.0, disc)
    sqrt_disc = jnp.sqrt(jnp.maximum(disc_c, 0.0))
    t1 = (-B - sqrt_disc) / (2.0 * A)
    t2 = (-B + sqrt_disc) / (2.0 * A)
    t_near = jnp.where(t1 >= 0, t1, t2)
    t_near = jnp.where(jnp.abs(t1 - t2) < eps, jnp.minimum(t1, t2), t_near)

    hit = (disc >= 0) & ((t1 >= 0) | (t2 >= 0))
    p_local = o_local + t_near[..., None] * d_local
    point = jnp.einsum(
        "...ij,...j->...i", ellipsoid_R, p_local * ellipsoid_S
    ) + ellipsoid_t
    zero = jnp.zeros_like(point)
    return hit, jnp.where(hit[..., None], point, zero)


def intersect_ray_with_gaussian(
    ray_origin, ray_direction, q, log_scale, xyz, eps: float = 1e-5
):
    """Convenience wrapper taking a Gaussian's (q, log_scale, xyz)
    parameterization (the feature layout) directly."""
    R = quaternion_to_rotation_matrix(q)
    S = jnp.exp(log_scale)
    return intersect_ray_with_ellipsoid(
        ray_origin, ray_direction, R, xyz, S, eps
    )
