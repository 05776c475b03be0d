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
    # expanded scalar broadcasts (batched (N, 3) x const (3, 3) einsums
    # lower to slow small-matrix fusions on TPU)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    cx = R_cw[0, 0] * x + R_cw[0, 1] * y + R_cw[0, 2] * z + t_cw[0]
    cy = R_cw[1, 0] * x + R_cw[1, 1] * y + R_cw[1, 2] * z + t_cw[1]
    cz = R_cw[2, 0] * x + R_cw[2, 1] * y + R_cw[2, 2] * z + t_cw[2]
    # clamp |cz| away from 0 with the sign preserved: the dense all-slot
    # projection also runs on culled points whose cz can cross 0 during
    # optimization, and 1/cz -> inf there makes the VJP emit NaN even for
    # the zero cotangents culling gives them (visible points have
    # cz >= near_plane, far above the 1e-6 clamp — values unchanged)
    cz_safe = jnp.where(jnp.abs(cz) < 1e-6,
                        jnp.where(cz < 0, -1e-6, 1e-6), cz)
    inv = 1.0 / cz_safe
    u = (K[0, 0] * cx + K[0, 1] * cy + K[0, 2] * cz) * inv
    v = (K[1, 0] * cx + K[1, 1] * cy + K[1, 2] * cz) * inv
    return (jnp.stack([u, v], axis=-1),
            jnp.stack([cx, cy, cz], axis=-1))


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


def project_cov2d_components(
    q: jnp.ndarray,
    log_scale: jnp.ndarray,
    R_cw: jnp.ndarray,
    K: jnp.ndarray,
    xyz_cam: jnp.ndarray,
):
    """EWA covariance as explicit per-component formulas: (a, b, c) 1-D.

    Mathematically identical to project_covariance, but expanded to scalar
    broadcasts: XLA lowers batched (N, 3, 3) matmuls as "convolution
    fusions" with small-matrix layouts that measured ~33 ms/frame at
    N=428k on v5e — the same math as ~60 VPU flops/point runs in ~2 ms.

    cov2d = B B^T with B = (J R_cw) (R(q) diag(exp(s))), where J is the
    perspective Jacobian (reference GaussianPoint3D.py:65-87, :164-196).
    """
    fx = K[0, 0]
    fy = K[1, 1]
    x, y, z = xyz_cam[..., 0], xyz_cam[..., 1], xyz_cam[..., 2]
    # same z~0 VJP guard as project_point (culled points still flow here)
    # 1e-6 (not smaller): the squared Jacobian terms carry inv_z^4, which
    # must stay inside f32 range or inf - inf = NaN poisons the VJP
    z = jnp.where(jnp.abs(z) < 1e-6,
                  jnp.where(z < 0, -1e-6, 1e-6), z)
    inv_z = 1.0 / z
    jx = fx * inv_z          # J[0,0]
    jy = fy * inv_z          # J[1,1]
    jxz = -fx * x * inv_z * inv_z  # J[0,2]
    jyz = -fy * y * inv_z * inv_z  # J[1,2]

    # A = J @ R_cw, rows expressed with R_cw's (constant) rows
    r0 = R_cw[0]
    r1 = R_cw[1]
    r2 = R_cw[2]
    A0 = [jx * r0[i] + jxz * r2[i] for i in range(3)]
    A1 = [jy * r1[i] + jyz * r2[i] for i in range(3)]

    # R(q) entries (same formulas as quaternion_to_rotation_matrix)
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    R = [
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ]
    s0 = jnp.exp(log_scale[..., 0])
    s1 = jnp.exp(log_scale[..., 1])
    s2 = jnp.exp(log_scale[..., 2])
    s = (s0, s1, s2)

    # B = A @ (R * s): B[r][k] = sum_i A[r][i] * R[i][k] * s[k]
    def brow(A):
        return [
            (A[0] * R[0][k] + A[1] * R[1][k] + A[2] * R[2][k]) * s[k]
            for k in range(3)
        ]

    B0 = brow(A0)
    B1 = brow(A1)
    a = B0[0] * B0[0] + B0[1] * B0[1] + B0[2] * B0[2]
    b = B0[0] * B1[0] + B0[1] * B1[1] + B0[2] * B1[2]
    c = B1[0] * B1[0] + B1[1] * B1[1] + B1[2] * B1[2]
    return a, b, c


def conic_rescale_radius_components(a, b, c):
    """(a, b, c) -> (conic_a, conic_b, conic_c, rescale, radius), all 1-D.

    Same math as conic_and_rescale + splat_radius without the (N, 2, 2)
    intermediates (reference utils.py:257-274,
    GaussianPointCloudRasterisation.py:309-315).
    """
    # clamp the components so af*cf and b^2 stay inside f32 range: a point
    # crossing the camera plane produces cov entries O(1e25+) whose
    # products hit inf - inf = NaN in det, poisoning the whole VJP row.
    # Real splats are bounded by the image diagonal (cov ~ px^2 << 1e18).
    a = jnp.clip(a, -1e18, 1e18)
    b = jnp.clip(b, -1e18, 1e18)
    c = jnp.clip(c, -1e18, 1e18)
    det_prefilter = a * c - b * b
    af = a + COV2D_FILTER
    cf = c + COV2D_FILTER
    det = af * cf - b * b
    # floor: exact math gives det >= 0.3*(a+c) + 0.09 for PSD cov, but at
    # 1e36 magnitudes f32 cancellation can produce 0 or negative
    det = jnp.maximum(det, 1e-6)
    # double-where sqrt guard: a degenerate splat (det_prefilter == 0,
    # e.g. exp(log_scale) underflow) keeps its forward rescale of exactly
    # 0 but the VJP must not see d sqrt(0) = inf — even a zero cotangent
    # would turn it into 0 * inf = NaN across d_log_scale/d_quat/d_xyz
    ratio = jnp.maximum(0.0, det_prefilter / det)
    rescale = jnp.where(
        ratio > 0.0, jnp.sqrt(jnp.maximum(ratio, 1e-30)), 0.0)
    inv_det = 1.0 / det
    lam_max = (a + c + jnp.sqrt((a - c) * (a - c) + 4.0 * b * b)) / 2.0
    radius = jnp.sqrt(jnp.maximum(lam_max, 0.0)) * 3.0
    return cf * inv_det, -b * inv_det, af * inv_det, rescale, radius


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
    # double-where sqrt guard: a degenerate splat (det_prefilter == 0,
    # e.g. exp(log_scale) underflow) keeps its forward rescale of exactly
    # 0 but the VJP must not see d sqrt(0) = inf — even a zero cotangent
    # would turn it into 0 * inf = NaN across d_log_scale/d_quat/d_xyz
    ratio = jnp.maximum(0.0, det_prefilter / det)
    rescale = jnp.where(
        ratio > 0.0, jnp.sqrt(jnp.maximum(ratio, 1e-30)), 0.0)
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
