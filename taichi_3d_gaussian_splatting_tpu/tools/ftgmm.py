"""Scene-as-GMM Fourier analysis (the fork's FTGMM module, jnp-native).

Behavioral reference: taichi_3d_gaussian_splatting/FTGMM.py. Pipeline
(ft_grab_scene, :555-558):
  scene -> Gaussian mixture (means = xyz, cov = R S S^T R^T, weights =
  sigmoid(alpha); :29-121) -> log-prob volume on a grid_size^3 lattice in a
  mean±3*sigma_fit bbox (:487-541, :169-207) -> 3D FFT (:210-274) vs the
  closed-form Gaussian Fourier transform of the mixture (:363-437) ->
  diagnostic PNGs under vis/.

TPU redesign: no torch.distributions / pytorch3d — the mixture log-prob is
one jitted logsumexp over components (chunked over grid slices), the FFT is
jnp.fft.fftn (native on TPU), and the closed-form transform is a single
einsum batch over frequencies. The reference's float64-Cholesky fallback is
unnecessary: log-probs are evaluated from (R, S) directly without ever
factoring the covariance.
"""
from __future__ import annotations

import os
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    quaternion_to_rotation_matrix,
)

LOG_2PI = float(np.log(2.0 * np.pi))


class SceneGMM(NamedTuple):
    means: jnp.ndarray      # (N, 3)
    rot: jnp.ndarray        # (N, 3, 3)
    scales: jnp.ndarray     # (N, 3) exp(log_scale), clamped
    log_weights: jnp.ndarray  # (N,) normalized


def scene_to_gmm(scene: GaussianScene, min_scale: float = 1e-5,
                 max_components: int | None = None,
                 seed: int = 0) -> SceneGMM:
    """Valid points -> mixture params (reference define_gmm :86-121).

    The FULL mixture is analyzed by default (the reference analyzes every
    valid component, FTGMM.py:86-121); both evaluation paths stream over
    component chunks, so memory stays bounded at any N. ``max_components``
    remains as an opt-in uniform subsample for callers that want a faster
    diagnostic."""
    valid = np.asarray(~scene.invalid)
    xyz_np = np.asarray(scene.xyz)[valid]
    feats_np = np.asarray(scene.features)[valid]
    if max_components is not None and xyz_np.shape[0] > max_components:
        sel = np.random.default_rng(seed).choice(
            xyz_np.shape[0], max_components, replace=False)
        xyz_np = xyz_np[sel]
        feats_np = feats_np[sel]
    xyz = jnp.asarray(xyz_np)
    feats = jnp.asarray(feats_np)
    q = feats[:, 0:4]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    rot = quaternion_to_rotation_matrix(q)
    scales = jnp.maximum(jnp.exp(feats[:, 4:7]), min_scale)
    alphas = jax.nn.sigmoid(feats[:, 7])
    log_weights = jnp.log(alphas) - jnp.log(jnp.sum(alphas))
    return SceneGMM(means=xyz, rot=rot, scales=scales, log_weights=log_weights)


def gmm_covariances(gmm: SceneGMM) -> jnp.ndarray:
    m = gmm.rot * gmm.scales[:, None, :]
    return m @ jnp.swapaxes(m, -1, -2)


def gmm_log_prob(gmm: SceneGMM, coords: jnp.ndarray,
                 comp_chunk: int = 4096) -> jnp.ndarray:
    """log p(x) for coords (..., 3) — logsumexp over components.

    Mahalanobis distance via the ellipsoid frame: y = S^-1 R^T (x - mu),
    so no Cholesky (and no f64 fallback, reference :29-83) is needed.
    Components stream in chunks of ``comp_chunk`` (a dense (P, N, 3)
    intermediate exhausted HBM mid-training once densification grew N);
    per-chunk logsumexps combine exactly with a final logsumexp.
    """
    flat = coords.reshape(-1, 3)
    n = gmm.means.shape[0]
    nc = -(-n // comp_chunk)
    pad = nc * comp_chunk - n

    def pad0(x, fill=0.0):
        width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, width, constant_values=fill)

    means = pad0(gmm.means).reshape(nc, comp_chunk, 3)
    rot = pad0(gmm.rot).reshape(nc, comp_chunk, 3, 3)
    scales = jnp.pad(gmm.scales, ((0, pad), (0, 0)),
                     constant_values=1.0).reshape(nc, comp_chunk, 3)
    log_w = jnp.pad(gmm.log_weights, (0, pad),
                    constant_values=-jnp.inf).reshape(nc, comp_chunk)

    def chunk_lse(args):
        mu, r, s, lw = args
        diff = flat[:, None, :] - mu[None, :, :]              # (P, C, 3)
        local = jnp.einsum("nij,pni->pnj", r, diff)           # R^T (x - mu)
        y = local / s[None, :, :]
        maha = jnp.sum(y * y, axis=-1)                        # (P, C)
        log_det = 2.0 * jnp.sum(jnp.log(s), axis=-1)          # (C,)
        log_comp = -0.5 * (maha + log_det + 3.0 * LOG_2PI)
        return jax.nn.logsumexp(log_comp + lw[None, :], axis=-1)

    partial = jax.lax.map(chunk_lse, (means, rot, scales, log_w))  # (nc, P)
    lp = jax.nn.logsumexp(partial, axis=0)
    return lp.reshape(coords.shape[:-1])


def estimate_bbox(gmm: SceneGMM) -> Tuple[np.ndarray, np.ndarray]:
    """Normal-fit mean±3sigma per dimension (reference :487-541)."""
    means = np.asarray(gmm.means)
    mu = means.mean(axis=0)
    std = means.std(axis=0)
    return mu - 3.0 * std, mu + 3.0 * std


_gmm_log_prob_jit = jax.jit(gmm_log_prob, static_argnames=("comp_chunk",))


def sample_volume(gmm: SceneGMM, grid_size: int = 35,
                  chunk_size: int = 1) -> Tuple[jnp.ndarray, np.ndarray, np.ndarray]:
    """Probability volume on the bbox lattice (reference sample_gmm
    :169-207). Returns (volume, bbox_min, bbox_max)."""
    bbox_min, bbox_max = estimate_bbox(gmm)
    axes = [np.linspace(bbox_min[i], bbox_max[i], grid_size) for i in range(3)]
    gx, gy, gz = np.meshgrid(*axes, indexing="ij")
    coords = jnp.asarray(
        np.stack([gx, gy, gz], axis=-1).astype(np.float32))

    # module-level jit with the gmm as an ARGUMENT: a per-call lambda
    # would bake the component arrays in as constants and recompile the
    # whole chunked log-prob on every diagnostic invocation
    slices = []
    for i in range(0, grid_size, chunk_size):
        slices.append(_gmm_log_prob_jit(gmm, coords[i: i + chunk_size]))
    log_volume = jnp.concatenate(slices, axis=0)
    return jnp.exp(log_volume), bbox_min, bbox_max


def volume_to_fourier(volume: jnp.ndarray) -> jnp.ndarray:
    """Normalized volume -> centered DFT (reference :210-274)."""
    v = volume / jnp.sum(volume)
    return jnp.fft.fftshift(jnp.fft.fftn(v))


def fourier_coords(grid_size: int, bbox_min: np.ndarray,
                   bbox_max: np.ndarray) -> np.ndarray:
    """Angular-frequency lattice matching the shifted DFT (reference
    get_fourier_coords :150-167)."""
    L = bbox_max - bbox_min
    freqs = [
        np.fft.fftfreq(grid_size, d=L[i] / grid_size) * 2.0 * np.pi
        for i in range(3)
    ]
    kx, ky, kz = np.meshgrid(*freqs, indexing="ij")
    k = np.stack([kx, ky, kz], axis=-1)
    return np.fft.fftshift(k, axes=(0, 1, 2))


def gmm_fourier(gmm: SceneGMM, k: jnp.ndarray, bbox_min, bbox_max,
                freq_chunk: int = 1024,
                comp_chunk: int = 8192) -> jnp.ndarray:
    """Closed-form mixture Fourier transform at angular frequencies k
    (..., 3): F(k) = sum_i w_i exp(-i k.(mu_i - c) - k^T Sigma_i k / 2)
    (reference transform_gmm_to_fourier1 :363-437). Both frequencies AND
    components stream in chunks (the dense (K, N) intermediate is ~3 GB
    complex64 at a 35^3 grid and 400k components); per-chunk partial sums
    over components combine exactly, so the FULL mixture is analyzed at
    bounded memory."""
    center = jnp.asarray((bbox_min + bbox_max) / 2.0, jnp.float32)
    flat = k.reshape(-1, 3).astype(jnp.float32)
    kn = flat.shape[0]
    nc = -(-kn // freq_chunk)
    flat = jnp.pad(flat, ((0, nc * freq_chunk - kn), (0, 0)))

    n = gmm.means.shape[0]
    ncc = -(-n // comp_chunk)
    pad = ncc * comp_chunk - n

    def pad0(x, fill=0.0):
        width = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, width, constant_values=fill)

    shifted = pad0(gmm.means - center).reshape(ncc, comp_chunk, 3)
    rot = pad0(gmm.rot).reshape(ncc, comp_chunk, 3, 3)
    scales = jnp.pad(gmm.scales, ((0, pad), (0, 0)),
                     constant_values=1.0).reshape(ncc, comp_chunk, 3)
    # padded components carry weight exp(-inf) = 0, so they contribute 0
    w = pad0(jnp.exp(gmm.log_weights)).reshape(ncc, comp_chunk)

    def freq_chunk_fn(fk):
        def comp_chunk_fn(args):
            mu, r, s, wc = args
            phase = fk @ mu.T                                 # (C, Nc)
            kr = jnp.einsum("kd,ndi->kni", fk, r)             # k^T R
            quad = jnp.sum((kr * s[None]) ** 2, axis=-1)
            return jnp.sum(
                wc[None, :] * jnp.exp(-0.5 * quad) * jnp.exp(-1j * phase),
                axis=-1,
            )

        partial = jax.lax.map(comp_chunk_fn, (shifted, rot, scales, w))
        return jnp.sum(partial, axis=0)

    f = jax.lax.map(freq_chunk_fn,
                    flat.reshape(nc, freq_chunk, 3)).reshape(-1)[:kn]
    return f.reshape(k.shape[:-1])


def compare_fft_vs_closed_form(gmm: SceneGMM, volume, bbox_min, bbox_max):
    """DFT-vs-analytic comparison metrics (reference
    compare_gmm_volume_to_transforms :278-360, minus the plotting).

    Returns numpy complex arrays: the device->host transfer happens on
    stacked (real, imag) float pairs because complex64 transfers are
    unimplemented on some TPU runtimes."""
    grid_size = volume.shape[0]
    dft = volume_to_fourier(volume)
    k = jnp.asarray(fourier_coords(grid_size, bbox_min, bbox_max))
    analytic = gmm_fourier(gmm, k, bbox_min, bbox_max)
    mag_err = jnp.abs(jnp.abs(dft) - jnp.abs(analytic))

    def to_np_complex(z):
        ri = np.asarray(jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1))
        return ri[..., 0] + 1j * ri[..., 1]

    dft_np = to_np_complex(dft)
    analytic_np = to_np_complex(analytic)
    mid = grid_size // 2
    return {
        "mag_err_mean": float(jnp.mean(mag_err)),
        "mag_err_max": float(jnp.max(mag_err)),
        "dc_dft": complex(dft_np[mid, mid, mid]),
        "dc_analytic": complex(analytic_np[mid, mid, mid]),
    }, dft_np, analytic_np


def ft_grab_scene(scene: GaussianScene, grid_size: int = 35,
                  vis_dir: str = "vis", plot: bool = True) -> dict:
    """Trainer/visualizer entry point (reference :555-558; called every
    1234 training iterations, GaussianPointTrainer.py:188-189)."""
    gmm = scene_to_gmm(scene)
    volume, bbox_min, bbox_max = sample_volume(gmm, grid_size=grid_size)
    metrics, dft, analytic = compare_fft_vs_closed_form(
        gmm, volume, bbox_min, bbox_max)
    if plot:
        _plot_diagnostics(volume, dft, analytic, vis_dir)
    return metrics


def _plot_diagnostics(volume, dft, analytic, vis_dir: str) -> None:
    """Center-slice diagnostic PNGs (reference :184-205, :233-273,
    :300-360)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    os.makedirs(vis_dir, exist_ok=True)
    mid = volume.shape[0] // 2
    vol = np.log(np.maximum(np.asarray(volume), 1e-30))
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].imshow(vol[mid, :, :]); axes[0].set_title("YZ slice (center X)")
    axes[1].imshow(vol[:, mid, :]); axes[1].set_title("XZ slice (center Y)")
    axes[2].imshow(vol[:, :, mid]); axes[2].set_title("XY slice (center Z)")
    fig.tight_layout()
    fig.savefig(os.path.join(vis_dir, "grid_gt.png"))
    plt.close(fig)

    fig, axes = plt.subplots(2, 3, figsize=(15, 10))
    for row, vol_c in enumerate((np.asarray(dft), np.asarray(analytic))):
        name = "DFT" if row == 0 else "analytic"
        axes[row, 0].imshow(np.abs(vol_c[mid, :, :]))
        axes[row, 0].set_title(f"{name} magnitude (YZ)")
        axes[row, 1].imshow(np.abs(vol_c[:, mid, :]))
        axes[row, 1].set_title(f"{name} magnitude (XZ)")
        axes[row, 2].imshow(np.angle(vol_c[:, :, mid]))
        axes[row, 2].set_title(f"{name} phase (XY)")
    fig.tight_layout()
    fig.savefig(os.path.join(vis_dir, "volume_fourier_spectrum.png"))
    plt.close(fig)
