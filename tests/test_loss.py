"""Loss tests: SSIM vs an independent numpy/scipy oracle.

Oracle pattern from the reference test suite (SURVEY.md §4): independent
reimplementation compared with allclose. pytorch_msssim itself is not in
the image, so the oracle is a direct numpy transcription of Wang et al.'s
SSIM with the same constants.
"""
import numpy as np
import jax.numpy as jnp
from scipy.ndimage import convolve

from taichi_3d_gaussian_splatting_tpu.training.loss import (
    LossConfig,
    compute_loss,
    psnr,
    ssim,
)

RNG = np.random.default_rng(3)


def _np_gaussian_window(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _np_ssim(img1, img2, data_range=1.0):
    win1d = _np_gaussian_window()
    win = np.outer(win1d, win1d)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = win.shape[0] // 2

    def blur(x):
        out = np.stack(
            [convolve(x[..., c], win, mode="constant") for c in range(x.shape[-1])],
            axis=-1,
        )
        return out[k:-k, k:-k]  # valid region only (pytorch_msssim crops)

    mu1, mu2 = blur(img1), blur(img2)
    s11 = blur(img1 * img1) - mu1**2
    s22 = blur(img2 * img2) - mu2**2
    s12 = blur(img1 * img2) - mu1 * mu2
    cs = (2 * s12 + c2) / (s11 + s22 + c2)
    ssim_map = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
    return ssim_map.mean()


class TestSSIM:
    def test_matches_numpy_oracle(self):
        a = RNG.random((48, 64, 3)).astype(np.float32)
        b = np.clip(a + RNG.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
        got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        want = _np_ssim(a, b)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_identical_images(self):
        a = RNG.random((32, 32, 3)).astype(np.float32)
        assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-6

    def test_differentiable(self):
        import jax

        a = jnp.asarray(RNG.random((32, 32, 3)).astype(np.float32))
        b = jnp.asarray(RNG.random((32, 32, 3)).astype(np.float32))
        g = jax.grad(lambda x: ssim(x, b))(a)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0


class TestLoss:
    def test_composition(self):
        a = jnp.asarray(RNG.random((32, 32, 3)).astype(np.float32))
        b = jnp.asarray(RNG.random((32, 32, 3)).astype(np.float32))
        cfg = LossConfig(lambda_value=0.2, enable_regularization=False)
        loss, l1, s = compute_loss(a, b, cfg)
        np.testing.assert_allclose(
            float(loss), 0.8 * float(l1) + 0.2 * (1 - float(s)), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(l1), np.abs(np.asarray(a) - np.asarray(b)).mean(), rtol=1e-6
        )

    def test_regularizer_only_valid_points(self):
        a = jnp.zeros((32, 32, 3))
        cfg = LossConfig(enable_regularization=True, regularization_weight=1.0)
        feats = jnp.zeros((10, 56)).at[:, 4:7].set(1.0)  # exp(1) scales
        invalid = jnp.asarray([False] * 5 + [True] * 5)
        base, _, _ = compute_loss(a, a, LossConfig(enable_regularization=False))
        loss, _, _ = compute_loss(a, a, cfg, features=feats, invalid_mask=invalid)
        expected_reg = np.linalg.norm([np.e] * 3)
        np.testing.assert_allclose(
            float(loss) - float(base), expected_reg, rtol=1e-5
        )

    def test_psnr(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)
