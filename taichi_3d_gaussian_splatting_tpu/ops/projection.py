"""Pinhole projection and EWA covariance splatting, batched jnp.

Behavioral reference:
- taichi_3d_gaussian_splatting/GaussianPoint3D.py:14-27 (projection),
  :65-87 (projective Jacobian), :164-196 (EWA covariance projection)
- taichi_3d_gaussian_splatting/utils.py:257-284 (conic + low-pass rescale)

Everything broadcasts over leading batch axes and differentiates with
jax.grad; the hand-derived (sympy) Jacobians of the reference
(GaussianPoint3D.py:237-331) are replaced by JAX autodiff of these
closed-form forward functions, which computes the identical chain rule.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST

from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    quaternion_to_rotation_matrix,
)

# Low-pass filter added to the projected 2D covariance diagonal so every
# Gaussian is at least ~1px wide (reference utils.py:262-266, following
# graphdeco diff-gaussian-rasterization).
COV2D_FILTER = 0.3


def project_point(
    xyz: jnp.ndarray, R_cw: jnp.ndarray, t_cw: jnp.ndarray, K: jnp.ndarray
):
    """World point -> (uv, xyz_cam).

    xyz (..., 3); R_cw/t_cw: world->camera rotation (3,3) and translation (3,);
    K: (3, 3) intrinsics. Reference: GaussianPoint3D.py:14-27.
    """
    xyz_cam = jnp.einsum("ij,...j->...i", R_cw, xyz,
                     precision=HIGHEST) + t_cw
    uv1 = jnp.einsum("ij,...j->...i", K, xyz_cam,
                 precision=HIGHEST) / xyz_cam[..., 2:3]
    return uv1[..., :2], xyz_cam


def covariance_3d(q: jnp.ndarray, log_scale: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T with S = diag(exp(log_scale)); eq. (6) of the paper.

    Reference: GaussianPoint3D.py:176-186.
    """
    R = quaternion_to_rotation_matrix(q)
    S = jnp.exp(log_scale)
    M = R * S[..., None, :]  # R @ diag(S)
    return jnp.matmul(M, jnp.swapaxes(M, -1, -2), precision=HIGHEST)


def projective_jacobian(K: jnp.ndarray, xyz_cam: jnp.ndarray) -> jnp.ndarray:
    """Affine approximation J (..., 2, 3) of the perspective projection.

    Reference: GaussianPoint3D.py:65-87 — note the reference deliberately
    drops the cx/z, cy/z terms (commented out there); we match that.
    """
    fx = K[0, 0]
    fy = K[1, 1]
    x, y, z = xyz_cam[..., 0], xyz_cam[..., 1], xyz_cam[..., 2]
    zero = jnp.zeros_like(z)
    row0 = jnp.stack([fx / z, zero, -(fx * x) / (z * z)], axis=-1)
    row1 = jnp.stack([zero, fy / z, -(fy * y) / (z * z)], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def project_covariance(
    q: jnp.ndarray,
    log_scale: jnp.ndarray,
    R_cw: jnp.ndarray,
    K: jnp.ndarray,
    xyz_cam: jnp.ndarray,
) -> jnp.ndarray:
    """EWA splat: cov2d = J W Sigma W^T J^T (..., 2, 2); eq. (5).

    Reference: GaussianPoint3D.py:164-196.
    """
    Sigma = covariance_3d(q, log_scale)
    J = projective_jacobian(K, xyz_cam)
    JW = jnp.einsum("...ij,jk->...ik", J, R_cw, precision=HIGHEST)
    return jnp.einsum("...ij,...jk,...lk->...il", JW, Sigma, JW,
                  precision=HIGHEST)


def conic_and_rescale(cov2d: jnp.ndarray):
    """2x2 covariance -> (conic_a, conic_b, conic_c, rescale).

    Applies the +0.3 low-pass filter to the diagonal, inverts, and computes
    the determinant-ratio rescale factor. Reference: utils.py:257-274
    (get_point_conic_and_rescale).
    """
    a = cov2d[..., 0, 0]
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1]
    det_prefilter = a * c - b * b
    af = a + COV2D_FILTER
    cf = c + COV2D_FILTER
    det = af * cf - b * b
    rescale = jnp.sqrt(jnp.maximum(0.0, det_prefilter / det))
    inv_det = 1.0 / det
    conic_a = cf * inv_det
    conic_b = -b * inv_det
    conic_c = af * inv_det
    return jnp.stack([conic_a, conic_b, conic_c, rescale], axis=-1)


def splat_radius(cov2d: jnp.ndarray) -> jnp.ndarray:
    """Conservative pixel radius 3 * sqrt(lambda_max) of the unfiltered cov2d.

    Reference: GaussianPointCloudRasterisation.py:309-315.
    """
    a = cov2d[..., 0, 0]
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1]
    lam_max = (a + c + jnp.sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0
    return jnp.sqrt(jnp.maximum(lam_max, 0.0)) * 3.0
