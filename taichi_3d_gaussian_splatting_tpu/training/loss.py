"""Training loss: (1-lambda) L1 + lambda (1 - SSIM) + optional scale reg.

Behavioral reference: taichi_3d_gaussian_splatting/LossFunction.py:10-51.
The reference uses pytorch_msssim's `ssim` (gaussian kernel 11, sigma 1.5,
data_range 1.0, the standard Wang et al. settings); here SSIM is a native
jnp implementation with the same constants so the whole loss jits and
differentiates on TPU. The separable 11-tap Gaussian blur is expressed as
two small matmuls (MXU-friendly) rather than a conv.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Mirrors LossFunctionConfig (reference LossFunction.py:10-17)."""

    lambda_value: float = 0.2
    enable_regularization: bool = True
    regularization_weight: float = 2.0


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable 'valid' Gaussian blur of (H, W, C) via two banded matmuls.

    Equivalent to pytorch_msssim's gaussian_filter (conv with no padding).
    Band matrices are built with static shapes; XLA lowers the two matmuls
    onto the MXU, which beats a small depthwise conv on TPU.
    """
    h, w, _ = img.shape
    k = win.shape[0]

    def band(n: int) -> jnp.ndarray:
        # (n - k + 1, n): row i holds win at columns [i, i + k)
        rows = jnp.arange(n - k + 1)[:, None]
        cols = jnp.arange(n)[None, :]
        idx = cols - rows
        return jnp.where(
            (idx >= 0) & (idx < k), win[jnp.clip(idx, 0, k - 1)], 0.0
        )

    bh = band(h)  # (h-k+1, h)
    bw = band(w)  # (w-k+1, w)
    # HIGHEST: the variance estimate blur(x^2) - mu^2 cancels almost
    # completely in flat regions; the MXU's default bf16 input rounding
    # turns it negative at ~4e-3 — larger than the SSIM c2 stabilizer —
    # and sends the structure term far outside [-1, 1] (observed on TPU).
    hp = jax.lax.Precision.HIGHEST
    out = jnp.einsum("ph,hwc->pwc", bh, img, precision=hp)
    out = jnp.einsum("qw,pwc->pqc", bw, out, precision=hp)
    return out


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM of two (H, W, C) images; constants match pytorch_msssim."""
    if img1.shape[0] < win_size or img1.shape[1] < win_size:
        # valid-convolution output would be EMPTY and jnp.mean of it NaN —
        # fail loudly instead of silently NaN-ing the training loss
        raise ValueError(
            f"SSIM needs images >= {win_size}px per side, got "
            f"{img1.shape[0]}x{img1.shape[1]}")
    win = jnp.asarray(_gaussian_window(win_size, win_sigma))
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu1_mu2

    cs = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return jnp.mean(ssim_map)


def compute_loss(
    predicted: jnp.ndarray,   # (H, W, 3) in [0, 1]
    target: jnp.ndarray,      # (H, W, 3)
    cfg: LossConfig,
    features: jnp.ndarray | None = None,   # (N, 56) for the scale regularizer
    invalid_mask: jnp.ndarray | None = None,
):
    """Returns (loss, l1, ssim_value). Reference: LossFunction.py:20-51."""
    l1 = jnp.mean(jnp.abs(predicted - target))
    ssim_val = ssim(predicted, target)
    loss = (1.0 - cfg.lambda_value) * l1 + cfg.lambda_value * (1.0 - ssim_val)
    if cfg.enable_regularization and features is not None:
        # mean L2 norm of exp(log_scale) over valid points (reference :40-51).
        # Mask the INPUT log-scales, not the output norm: an overflowing
        # exp on an invalid row would otherwise give inf/inf = NaN in the
        # VJP even under a zero cotangent (0 * NaN).
        logs = features[:, 4:7]
        if invalid_mask is not None:
            valid = jnp.logical_not(invalid_mask)
            logs = jnp.where(valid[:, None], logs, 0.0)
            norms = jnp.linalg.norm(jnp.exp(logs), axis=-1)
            reg = jnp.sum(jnp.where(valid, norms, 0.0)) / jnp.maximum(
                jnp.sum(valid), 1
            )
        else:
            reg = jnp.mean(jnp.linalg.norm(jnp.exp(logs), axis=-1))
        loss = loss + cfg.regularization_weight * reg
    return loss, l1, ssim_val


def psnr(predicted: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB, data range 1.0 (reference GaussianPointTrainer.py:342-345)."""
    mse = jnp.mean((predicted - target) ** 2)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))
