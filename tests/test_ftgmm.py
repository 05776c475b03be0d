"""FTGMM analysis tests: mixture log-prob vs scipy, DFT vs closed form."""
import numpy as np
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
from taichi_3d_gaussian_splatting_tpu.tools import ftgmm


def make_scene(n=20, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-2.0, -0.5, (n, 3))
    feats[:, 7] = rng.uniform(-1.0, 1.0, n)
    invalid = np.zeros(n, bool)
    invalid[-3:] = True
    return GaussianScene(
        xyz=jnp.asarray(xyz), features=jnp.asarray(feats),
        invalid=jnp.asarray(invalid), object_id=jnp.zeros(n, jnp.int32),
    )


class TestGMM:
    def test_log_prob_vs_scipy(self):
        from scipy.stats import multivariate_normal

        scene = make_scene()
        gmm = ftgmm.scene_to_gmm(scene)
        covs = np.asarray(ftgmm.gmm_covariances(gmm))
        means = np.asarray(gmm.means)
        w = np.exp(np.asarray(gmm.log_weights))
        pts = np.random.default_rng(1).normal(0, 1, (10, 3)).astype(np.float32)
        expected = np.log(sum(
            w[i] * multivariate_normal.pdf(pts, means[i], covs[i])
            for i in range(len(w))
        ))
        got = np.asarray(ftgmm.gmm_log_prob(gmm, jnp.asarray(pts)))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_only_valid_points_used(self):
        scene = make_scene()
        gmm = ftgmm.scene_to_gmm(scene)
        assert gmm.means.shape[0] == 17  # 20 - 3 invalid

    def test_dft_matches_closed_form(self):
        """Discrete FFT of the sampled volume approximates the analytic
        mixture Fourier transform (the module's core diagnostic)."""
        scene = make_scene(n=8, seed=2)
        gmm = ftgmm.scene_to_gmm(scene)
        volume, bmin, bmax = ftgmm.sample_volume(gmm, grid_size=33)
        metrics, dft, analytic = ftgmm.compare_fft_vs_closed_form(
            gmm, volume, bmin, bmax)
        # DC bins must both be ~1 (normalized mass)
        assert abs(metrics["dc_dft"] - 1.0) < 1e-3
        assert abs(metrics["dc_analytic"]) > 0.5
        # low-frequency magnitudes agree (high frequencies alias)
        mid = 16
        sl = np.s_[mid - 3: mid + 4, mid - 3: mid + 4, mid - 3: mid + 4]
        np.testing.assert_allclose(
            np.abs(np.asarray(dft)[sl]), np.abs(np.asarray(analytic)[sl]),
            atol=0.08,
        )

    def test_ft_grab_scene_writes_plots(self, tmp_path):
        scene = make_scene(n=6, seed=3)
        metrics = ftgmm.ft_grab_scene(scene, grid_size=17,
                                      vis_dir=str(tmp_path))
        assert (tmp_path / "grid_gt.png").exists()
        assert (tmp_path / "volume_fourier_spectrum.png").exists()
        assert np.isfinite(metrics["mag_err_mean"])
