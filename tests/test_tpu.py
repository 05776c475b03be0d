"""Real-TPU regression gate: compiled Pallas kernels vs the jnp oracle.

Run with:  TPU_TESTS=1 python -m pytest tests/ -m tpu -q
(conftest.py keeps the session's axon backend instead of forcing CPU when
TPU_TESTS=1; pytest.ini deselects these by default).

Every TPU-only numerics bug so far — MXU default-bf16 input rounding
(round-1 RESULTS), the i32 cumsum serialization cliff, the histogram
bucket-axis block map (round-2) — was caught by ad-hoc scripts; this gate
makes the catch repeatable. Small shapes keep compile time ~1-2 min/case;
assertions mirror tests/test_rasterizer.py's oracle gates with a bf16-MXU
tolerance bump (the transmittance matmuls run 2-term Dekker on TPU).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops.blend_reference import render_reference
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera,
    RasterizerConfig,
    rasterize,
    rasterize_bwd,
    rasterize_fwd_ctx,
)

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="needs the real TPU backend (TPU_TESTS=1)",
)

Q_ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
T_ID = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)


def make_scene(n=200, seed=7):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(2.0, 8.0, n)], axis=-1
    ).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-3.5, -1.5, (n, 3))
    feats[:, 7] = rng.uniform(-1.0, 3.0, n)
    feats[:, 8:] = rng.normal(size=(n, 48)) * 0.3
    invalid = np.zeros((n,), bool)
    invalid[: n // 20] = True
    return jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(invalid)


def make_camera(w=64, h=64):
    K = jnp.asarray(
        [[60.0, 0.0, w / 2], [0.0, 60.0, h / 2], [0.0, 0.0, 1.0]], jnp.float32
    )
    return Camera(K=K, width=w, height=h)


@requires_tpu
@pytest.mark.parametrize("tile_wh", [(32, 32), (32, 8)])
def test_forward_matches_oracle_on_chip(tile_wh):
    cfg = RasterizerConfig(tile_size=tile_wh[0], tile_h=tile_wh[1],
                           key_cap=4096, interpret=False)
    xyz, feats, invalid = make_scene()
    cam = make_camera()
    out = jax.jit(
        lambda x, f: rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg)
    )(xyz, feats)
    rgb_ref, depth_ref, alpha_ref, count_ref = map(
        np.asarray,
        render_reference(xyz, feats, invalid, Q_ID, T_ID, cam, cfg))
    # 2-term Dekker transmittance on-chip: ~7e-5 worst-case rel error
    np.testing.assert_allclose(np.asarray(out.rgb), rgb_ref, atol=3e-3)
    np.testing.assert_allclose(np.asarray(out.alpha), alpha_ref, atol=3e-3)
    assert (np.asarray(out.count) != count_ref).mean() < 0.01


@requires_tpu
def test_gradients_match_oracle_on_chip():
    cfg = RasterizerConfig(tile_size=32, key_cap=4096, interpret=False)
    xyz, feats, invalid = make_scene(120, seed=5)
    cam = make_camera()
    gproj = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 64, 3)).astype(np.float32))

    def loss_prod(x, f):
        out = rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg)
        return jnp.sum(out.rgb * gproj)

    def loss_ref(x, f):
        rgb, *_ = render_reference(x, f, invalid, Q_ID, T_ID, cam, cfg)
        return jnp.sum(rgb * gproj)

    gx, gf = jax.jit(jax.grad(loss_prod, argnums=(0, 1)))(xyz, feats)
    gx_r, gf_r = map(np.asarray,
                     jax.grad(loss_ref, argnums=(0, 1))(xyz, feats))
    np.testing.assert_allclose(np.asarray(gx), gx_r, atol=5e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gf), gf_r, atol=5e-3, rtol=2e-2)


@requires_tpu
def test_train_step_on_chip():
    """One compiled train step (rasterize fwd+bwd, loss, Adam x2, stats) on
    a small pool: finite loss, finite params, densify stats populated."""
    from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
    from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl
    from taichi_3d_gaussian_splatting_tpu.training.config import TrainConfig
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        TrainState, make_optimizers, make_train_step,
    )

    xyz, feats, invalid = make_scene(256, seed=3)
    rcfg = RasterizerConfig(tile_size=32, key_cap=4096, interpret=False)
    config = TrainConfig(rasterisation_config=rcfg)
    step = make_train_step(config, 64, 64)
    scene = GaussianScene(xyz=xyz, features=feats, invalid=invalid,
                          object_id=jnp.zeros((256,), jnp.int32))
    ftx, ptx = make_optimizers(config)
    state = TrainState(scene=scene, feat_opt=ftx.init(scene.features),
                       pos_opt=ptx.init(scene.xyz), ctrl=ctrl.init_state(256))
    target = jnp.asarray(
        np.random.default_rng(1).random((64, 64, 3)).astype(np.float32))
    K = make_camera().K
    state, metrics, aux = step(state, target, Q_ID, T_ID, K,
                               jnp.asarray(3, jnp.int32))
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    assert np.isfinite(np.asarray(state.scene.features)).all()
    assert float(jnp.max(aux["stats"].magnitude_grad_viewspace)) > 0


@requires_tpu
def test_strips_forward_and_grads_on_chip():
    """blend_strips=4 compiled on the chip: forward bitwise-equal to the
    strips=1 compiled output; gradients equal at f32 round-off. (CPU
    interpret mode already gates semantics; this pins the Mosaic compile
    of the strip-sliced VMEM accesses + per-strip carries.)"""
    import dataclasses as dc
    base = RasterizerConfig(tile_size=32, key_cap=4096, interpret=False)
    cfg4 = dc.replace(base, blend_strips=4)
    xyz, feats, invalid = make_scene(300, seed=11)
    cam = make_camera()
    out1 = jax.jit(
        lambda x, f: rasterize(x, f, invalid, Q_ID, T_ID, cam, base)
    )(xyz, feats)
    out4 = jax.jit(
        lambda x, f: rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg4)
    )(xyz, feats)
    np.testing.assert_array_equal(np.asarray(out4.rgb), np.asarray(out1.rgb))
    np.testing.assert_array_equal(np.asarray(out4.count),
                                  np.asarray(out1.count))

    gproj = jnp.asarray(
        np.random.default_rng(2).normal(size=(64, 64, 3)).astype(np.float32))

    def loss(cfg):
        def f(x, ft):
            o = rasterize(x, ft, invalid, Q_ID, T_ID, cam, cfg)
            return jnp.sum(o.rgb * gproj)
        return jax.jit(jax.grad(f, argnums=(0, 1)))(xyz, feats)

    g1 = loss(base)
    g4 = loss(cfg4)
    # strip-blocked moment sums only reassociate pixel reductions; the
    # compiled kernels' f32 sum order differs per strip, so grads agree to
    # reassociation round-off, not bitwise (measured on v5e: max 3.4e-5
    # abs / 3.6e-4 rel on O(0.1-1) grads — ~2^-12, plain f32 resummation)
    np.testing.assert_allclose(np.asarray(g4[0]), np.asarray(g1[0]),
                               atol=1e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g4[1]), np.asarray(g1[1]),
                               atol=1e-4, rtol=2e-3)
