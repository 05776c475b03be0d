"""Quaternion / SE(3) math, batched over arbitrary leading axes.

Behavioral reference: taichi_3d_gaussian_splatting/utils.py:200-220 (device
quaternion ops), :386-492 (host torch SE(3)/quaternion ops),
GaussianPoint3D.py:30-62 (quaternion -> rotation matrix).

Quaternions are stored **xyzw** (matching the reference feature layout).
All functions are pure jnp, f32, and broadcast over leading batch axes.
"""
from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyzw -> (..., 3, 3). Reference: GaussianPoint3D.py:30-48."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotation_matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) xyzw, branch-free 4-case selection.

    Reference: utils.py:435-483 (rotation_matrix_to_quaternion_torch).
    Uses the numerically-stable per-case formulas and picks the case with the
    largest pivot, vectorized with jnp.where instead of the reference's
    boolean-mask writes.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # case w: tr > 0
    sw = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
    qw_w = 0.25 * sw
    qx_w = (m21 - m12) / sw
    qy_w = (m02 - m20) / sw
    qz_w = (m10 - m01) / sw
    # case x: m00 largest
    sx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qw_x = (m21 - m12) / sx
    qx_x = 0.25 * sx
    qy_x = (m01 + m10) / sx
    qz_x = (m02 + m20) / sx
    # case y: m11 largest
    sy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qw_y = (m02 - m20) / sy
    qx_y = (m01 + m10) / sy
    qy_y = 0.25 * sy
    qz_y = (m12 + m21) / sy
    # case z: m22 largest
    sz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qw_z = (m10 - m01) / sz
    qx_z = (m02 + m20) / sz
    qy_z = (m12 + m21) / sz
    qz_z = 0.25 * sz

    use_w = tr > 0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)

    def pick(w, x, y, z):
        return jnp.where(use_w, w, jnp.where(use_x, x, jnp.where(use_y, y, z)))

    q = jnp.stack(
        [pick(qx_w, qx_x, qx_y, qx_z), pick(qy_w, qy_x, qy_y, qy_z),
         pick(qz_w, qz_x, qz_y, qz_z), pick(qw_w, qw_x, qw_y, qw_z)],
        axis=-1,
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, xyzw. Reference: utils.py:396-411."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quaternion_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quaternion_exp(omega: jnp.ndarray) -> jnp.ndarray:
    """so(3) exponential map: axis-angle (3,) -> unit quaternion xyzw.

    q = [sin(|w|/2) * w/|w|, cos(|w|/2)], with a 2nd-order Taylor branch
    near zero so both the value and its jax.grad are exact at w = 0
    (used by camera pose refinement, where deltas start at exactly 0)."""
    t2 = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(t2, 1e-24))  # guarded: unused branch only
    small = t2 < 1e-12
    s = jnp.where(small, 0.5 - t2 / 48.0, jnp.sin(0.5 * theta) / theta)
    c = jnp.where(small[..., 0], 1.0 - t2[..., 0] / 8.0,
                  jnp.cos(0.5 * theta[..., 0]))
    return jnp.concatenate([s * omega, c[..., None]], axis=-1)


def apply_pose_delta(q: jnp.ndarray, t: jnp.ndarray, d: jnp.ndarray):
    """Compose a camera pose (q xyzw, t) with an se(3) refinement delta
    d = (omega xyz, dt xyz): q' = normalize(q * exp(omega)), t' = t + dt.

    The single source of truth for pose refinement — the train step
    optimizes through it and refined_poses.json is exported with it."""
    qq = quaternion_multiply(q.reshape(4), quaternion_exp(d[:3]))
    qq = qq / jnp.linalg.norm(qq)
    return qq, t.reshape(3) + d[3:]


def quaternion_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by quaternions q (..., 4) xyzw.

    Reference: utils.py:213-220 (quaternion_rotate).
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def se3_from_qt(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(q xyzw, t) -> 4x4 homogeneous transform.

    Reference: GaussianPoint3D.py:51-62.
    """
    R = quaternion_to_rotation_matrix(q)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid 4x4. Reference: utils.py:386-393, :495-510."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_new = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_new[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inverse_qt(q: jnp.ndarray, t: jnp.ndarray):
    """Inverse of the rigid transform given as (q, t).

    Reference: utils.py:414-432 (inverse_SE3_qt_torch).
    """
    q_inv = quaternion_conjugate(q)
    t_inv = -quaternion_rotate(q_inv, t)
    return q_inv, t_inv


def se3_to_qt(T: jnp.ndarray):
    """4x4 -> (q xyzw, t). Reference: utils.py:486-492."""
    return rotation_matrix_to_quaternion(T[..., :3, :3]), T[..., :3, 3]
