"""Adaptive controller tests: accumulation, selection, slot-fill invariants.

Mirrors the reference's bookkeeping assert (:348-350) and controller
integration intent (tests/GaussianPointAdaptiveController_test.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl


def make_scene(n=64, valid=48, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    feats = rng.normal(size=(n, 56)).astype(np.float32) * 0.1
    feats[:, 7] = 1.0  # comfortably above transparent threshold
    invalid = np.zeros(n, bool)
    invalid[valid:] = True
    return GaussianScene(
        xyz=jnp.asarray(xyz), features=jnp.asarray(feats),
        invalid=jnp.asarray(invalid), object_id=jnp.zeros(n, jnp.int32),
    )


CFG = ctrl.ControllerConfig(
    densification_view_space_position_gradients_threshold=0.5,
    under_reconstructed_num_pixels_threshold=100,
    transparent_alpha_threshold=-0.5,
)


class TestAccumulate:
    def test_masked_accumulation(self):
        state = ctrl.init_state(8)
        in_cam = jnp.asarray([True] * 4 + [False] * 4)
        npix = jnp.asarray([10.0] * 8)
        mag = jnp.asarray([2.0] * 8)
        grad = jnp.ones((8, 3))
        state = ctrl.accumulate(state, in_cam, npix, mag, grad)
        np.testing.assert_array_equal(
            np.asarray(state.num_in_camera), [1, 1, 1, 1, 0, 0, 0, 0]
        )
        np.testing.assert_allclose(np.asarray(state.num_pixels[:4]), 10.0)
        np.testing.assert_allclose(np.asarray(state.grad_viewspace[:4]), 2.0)
        np.testing.assert_allclose(
            np.asarray(state.grad_viewspace_avg[:4]), 0.2
        )
        np.testing.assert_allclose(
            np.asarray(state.grad_position_norm[:4]), np.sqrt(3.0)
        )
        assert np.all(np.asarray(state.num_pixels[4:]) == 0)

    def test_nan_avg_handled(self):
        state = ctrl.init_state(2)
        state = ctrl.accumulate(
            state, jnp.asarray([True, True]), jnp.asarray([0.0, 5.0]),
            jnp.asarray([1.0, 1.0]), jnp.zeros((2, 3)),
        )
        assert np.all(np.isfinite(np.asarray(state.grad_viewspace_avg)))


def run_find(scene, state, mag, npix, depth=None, remove_floaters=False,
             cfg=CFG):
    n = scene.capacity
    in_cam = jnp.logical_not(scene.invalid)
    if depth is None:
        depth = jnp.full((n,), 5.0)
    return ctrl.find_densify(scene, state, in_cam, npix, mag, depth,
                             remove_floaters, cfg)


class TestFindDensify:
    def test_selects_high_gradient_points(self):
        scene = make_scene()
        state = ctrl.init_state(scene.capacity)
        mag = jnp.zeros(scene.capacity).at[3].set(1.0).at[10].set(1.0)
        npix = jnp.full((scene.capacity,), 10.0)
        info = run_find(scene, state, mag, npix)
        densify = np.asarray(info.densify_mask)
        assert densify[3] and densify[10]
        assert densify.sum() == 2

    def test_transparent_points_removed_not_densified(self):
        scene = make_scene()
        scene = scene._replace(features=scene.features.at[5, 7].set(-2.0))
        state = ctrl.init_state(scene.capacity)
        mag = jnp.zeros(scene.capacity).at[5].set(1.0)
        npix = jnp.full((scene.capacity,), 10.0)
        info = run_find(scene, state, mag, npix)
        assert np.asarray(info.remove_mask)[5]
        assert not np.asarray(info.densify_mask)[5]

    def test_nan_features_pruned(self):
        scene = make_scene()
        scene = scene._replace(features=scene.features.at[7, 20].set(jnp.nan))
        info = run_find(scene, ctrl.init_state(scene.capacity),
                        jnp.zeros(scene.capacity),
                        jnp.full((scene.capacity,), 1.0))
        assert np.asarray(info.remove_mask)[7]

    def test_floater_removal(self):
        cfg = ctrl.ControllerConfig(
            floater_near_camrea_num_pixels_threshold=100,
            floater_depth_threshold=10.0,
        )
        scene = make_scene()
        npix = jnp.full((scene.capacity,), 10.0).at[2].set(500.0)
        depth = jnp.full((scene.capacity,), 5.0)
        info = run_find(scene, ctrl.init_state(scene.capacity),
                        jnp.zeros(scene.capacity), npix, depth,
                        remove_floaters=True, cfg=cfg)
        assert np.asarray(info.remove_mask)[2]
        info2 = run_find(scene, ctrl.init_state(scene.capacity),
                         jnp.zeros(scene.capacity), npix, depth,
                         remove_floaters=False, cfg=cfg)
        assert not np.asarray(info2.remove_mask)[2]

    def test_split_vs_clone(self):
        scene = make_scene()
        state = ctrl.init_state(scene.capacity)
        # accumulate a big pixel footprint on point 3 only
        npix_acc = jnp.zeros(scene.capacity).at[3].set(1000.0).at[10].set(5.0)
        state = state._replace(num_pixels=npix_acc,
                               num_in_camera=jnp.ones(scene.capacity))
        mag = jnp.zeros(scene.capacity).at[3].set(1.0).at[10].set(1.0)
        info = run_find(scene, state, mag, jnp.full((scene.capacity,), 10.0))
        assert np.asarray(info.over_mask)[3]          # split
        assert not np.asarray(info.over_mask)[10]     # clone
        assert np.asarray(info.size_reduction)[3] > 0
        assert np.asarray(info.size_reduction)[10] == 0


class TestApplyDensify:
    def test_bookkeeping_invariant(self):
        """valid_after == valid_before - removed + filled (reference :348-350)."""
        scene = make_scene(n=64, valid=48)
        state = ctrl.init_state(64)
        state = state._replace(num_in_camera=jnp.ones(64))
        mag = jnp.zeros(64).at[jnp.arange(5)].set(1.0)
        scene2 = scene._replace(features=scene.features.at[20, 7].set(-2.0))
        info = run_find(scene2, state, mag, jnp.full((64,), 10.0))
        before = int(scene2.num_valid())
        removed = int(jnp.sum(info.remove_mask))
        densify = int(jnp.sum(info.densify_mask))
        new_scene = ctrl.apply_densify(scene2, info, jax.random.PRNGKey(0), CFG)
        after = int(new_scene.num_valid())
        fillable = min(densify, 64 - before + removed)
        assert after == before - removed + fillable

    def test_clone_moves_along_gradient(self):
        cfg = ctrl.ControllerConfig(
            under_reconstructed_move_factor=10.0,
            under_reconstructed_num_pixels_threshold=1000000,
        )
        scene = make_scene(n=16, valid=8)
        state = ctrl.init_state(16)
        state = state._replace(
            num_in_camera=jnp.ones(16),
            grad_position=jnp.zeros((16, 3)).at[2].set(
                jnp.asarray([0.1, 0.0, 0.0])
            ),
        )
        mag = jnp.zeros(16).at[2].set(1.0)
        info = run_find(scene, state, mag, jnp.full((16,), 10.0), cfg=cfg)
        new_scene = ctrl.apply_densify(scene, info, jax.random.PRNGKey(1), cfg)
        # the first invalid slot (8) received the clone
        assert not bool(new_scene.invalid[8])
        np.testing.assert_allclose(
            np.asarray(new_scene.xyz[8]),
            np.asarray(scene.xyz[2]) + np.asarray([1.0, 0.0, 0.0]),
            atol=1e-5,
        )
        # original features keep their scale (clone, no shrink)
        np.testing.assert_allclose(
            np.asarray(new_scene.features[2, 4:7]),
            np.asarray(scene.features[2, 4:7]),
        )

    def test_split_shrinks_both_copies(self):
        cfg = ctrl.ControllerConfig(
            under_reconstructed_num_pixels_threshold=0,
            enable_sample_from_point=False,
        )
        scene = make_scene(n=16, valid=8)
        state = ctrl.init_state(16)
        state = state._replace(num_in_camera=jnp.ones(16),
                               num_pixels=jnp.full((16,), 100.0))
        mag = jnp.zeros(16).at[4].set(1.0)
        info = run_find(scene, state, mag, jnp.full((16,), 10.0), cfg=cfg)
        new_scene = ctrl.apply_densify(scene, info, jax.random.PRNGKey(2), cfg)
        shrink = np.log(cfg.gaussian_split_factor_phi)
        np.testing.assert_allclose(
            np.asarray(new_scene.features[4, 4:7]),
            np.asarray(scene.features[4, 4:7]) - shrink, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(new_scene.features[8, 4:7]),
            np.asarray(scene.features[4, 4:7]) - shrink, rtol=1e-5,
        )

    def test_capacity_limit(self):
        """More densify candidates than invalid slots: fill what fits."""
        scene = make_scene(n=16, valid=14)
        state = ctrl.init_state(16)
        state = state._replace(num_in_camera=jnp.ones(16))
        mag = jnp.zeros(16).at[jnp.arange(10)].set(1.0)
        info = run_find(scene, state, mag, jnp.full((16,), 10.0))
        new_scene = ctrl.apply_densify(scene, info, jax.random.PRNGKey(3), CFG)
        assert int(new_scene.num_valid()) == 16  # filled both free slots


class TestResetAlpha:
    def test_clamps_down_only(self):
        scene = make_scene()
        scene = scene._replace(
            features=scene.features.at[:, 7].set(
                jnp.linspace(-1.0, 2.0, scene.capacity)
            )
        )
        cfg = ctrl.ControllerConfig(reset_alpha_value=0.1)
        out = ctrl.reset_alpha(scene, cfg)
        a = np.asarray(out.features[:, 7])
        assert a.max() <= 0.1 + 1e-6
        orig = np.asarray(scene.features[:, 7])
        np.testing.assert_allclose(a[orig < 0.1], orig[orig < 0.1])
