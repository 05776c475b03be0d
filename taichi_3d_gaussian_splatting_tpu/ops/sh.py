"""Real spherical-harmonics basis to degree 3 (16 coefficients).

Behavioral reference: taichi_3d_gaussian_splatting/SphericalHarmonics.py:10-53.
Coefficients and sign conventions match the reference exactly.
"""
from __future__ import annotations

import jax.numpy as jnp

NUM_SH_COEFF = 16

# Number of coefficients active for a given max band: band b -> (b+1)^2.
SH_BAND_COEFFS = (1, 4, 9, 16)


def sh_basis(direction: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) unnormalized view direction -> (..., 16) SH basis values.

    The direction is normalized internally (reference normalizes in
    get_spherical_harmonic_from_xyz, SphericalHarmonics.py:13).
    """
    # guarded: a point exactly at the camera center (norm 0) must give a
    # finite basis and finite VJP (0/0 = NaN would poison its gradients
    # even under the zero cotangent culling gives it)
    n = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    d = direction / jnp.maximum(n, 1e-12)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    one = jnp.ones_like(x)
    return jnp.stack(
        [
            0.28209479177387814 * one,
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * x * y,
            -1.0925484305920792 * y * z,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * x * z,
            0.54627421529603959 * xx - 0.54627421529603959 * yy,
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * x * y * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ],
        axis=-1,
    )


# NOTE: the production SH-color evaluation lives inline in
# attributes.compute_point_attributes (mul-reduce form with sh_max_band
# masking); a separate helper here would drift from those semantics.
