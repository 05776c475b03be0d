"""Multi-chip data-parallel training: cameras sharded over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.5); this module is the
TPU-native scaling layer it lacks. Design (SURVEY.md §7, scaling-book
recipe):

- mesh axis "data": each device rasterizes ONE camera of the batch against
  the full (replicated) Gaussian pool;
- per-device gradients and densification statistics are combined with
  `jax.lax.pmean`/`psum` over ICI inside `shard_map`;
- the optimizer update runs replicated (identical on every device), so
  parameters never need re-broadcasting.

Gradients are averaged (pmean) over cameras so learning rates stay
comparable with the reference's one-image-per-step schedule at any batch
size; densification statistics are summed (psum), matching the reference's
sequential accumulation over frames.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera,
    rasterize_bwd,
    rasterize_fwd_ctx,
)
from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl
from taichi_3d_gaussian_splatting_tpu.training.config import TrainConfig
from taichi_3d_gaussian_splatting_tpu.training.loss import compute_loss, psnr as psnr_fn
from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    TrainState,
    grad_factor_vector,
    make_optimizers,
)


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def make_dp_train_step(config: TrainConfig, height: int, width: int,
                       mesh: Mesh, scan_steps: int = 0):
    """Jitted data-parallel step over (B, H, W, 3) camera batches, B = mesh
    size. Single-device semantics: identical to trainer.make_train_step with
    gradients averaged over the batch.

    With scan_steps > 0 the step consumes (S, B, ...) stacked batches and
    runs S optimizer steps in ONE dispatch via lax.scan inside shard_map
    (collectives run per scan iteration over ICI) — the multi-chip analogue
    of trainer.make_train_step's dispatch windows, amortizing host round
    trips through remote-TPU tunnels. Metrics come back stacked (S,);
    frame_stats reflect the LAST step (what the densifier consumes)."""
    if config.pose_refinement:
        raise ValueError("pose_refinement is single-device only")
    rcfg = config.rasterisation_config
    lcfg = config.loss_function_config
    feature_tx, position_tx = make_optimizers(config)
    gf = jnp.asarray(grad_factor_vector(rcfg))

    def per_device(state: TrainState, image_gt, q, t, K, sh_band):
        # leading batch axis is 1 on each device
        image_gt = image_gt[0]
        q, t, K = q[0], t[0], K[0]
        scene = state.scene
        camera = Camera(K=K, width=width, height=height)
        out, ctx, attrs_vjp = rasterize_fwd_ctx(
            scene.xyz, scene.features, scene.invalid, q, t, camera, rcfg,
            sh_max_band=sh_band, point_object_id=scene.object_id,
        )
        pred = jnp.clip(out.rgb, 0.0, 1.0)

        def loss_fn(p, feats):
            loss, l1, ssim_v = compute_loss(
                p, image_gt, lcfg, features=feats, invalid_mask=scene.invalid
            )
            return loss, (l1, ssim_v)

        (loss, (l1, ssim_v)), (d_pred, d_feat_reg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(pred, scene.features)
        pass_mask = jnp.logical_and(out.rgb > 0.0, out.rgb < 1.0)
        d_rgb = jnp.where(pass_mask, d_pred, 0.0)
        (d_xyz, d_features), stats = rasterize_bwd(
            ctx, attrs_vjp, d_rgb, camera, rcfg
        )
        d_features = d_features * gf[None, :] + d_feat_reg
        valid = jnp.logical_not(scene.invalid)[:, None]
        d_xyz = jnp.where(valid, d_xyz, 0.0)
        d_features = jnp.where(valid, d_features, 0.0)

        # ---- collectives: average param grads, sum densify stats --------
        d_xyz = jax.lax.pmean(d_xyz, "data")
        d_features = jax.lax.pmean(d_features, "data")
        loss = jax.lax.pmean(loss, "data")
        l1 = jax.lax.pmean(l1, "data")
        ssim_v = jax.lax.pmean(ssim_v, "data")
        train_psnr = jax.lax.pmean(psnr_fn(pred, image_gt), "data")

        # per-camera accumulator contribution via the single source of
        # truth (controller.accumulate, incl. its isfinite hardening),
        # psum'd over the mesh before adding to the carried state
        vis = stats.in_camera.astype(jnp.float32)
        contrib = ctrl.accumulate(
            ctrl.init_state(scene.capacity), stats.in_camera,
            stats.num_affected_pixels, stats.magnitude_grad_viewspace,
            d_xyz,
        )
        ctrl_state = jax.tree.map(
            lambda cur, c: cur + jax.lax.psum(c, "data"), state.ctrl, contrib)

        fu, feat_opt = feature_tx.update(d_features, state.feat_opt)
        pu, pos_opt = position_tx.update(d_xyz, state.pos_opt)
        scene = scene._replace(
            features=optax.apply_updates(scene.features, fu),
            xyz=optax.apply_updates(scene.xyz, pu),
        )
        new_state = TrainState(scene=scene, feat_opt=feat_opt,
                               pos_opt=pos_opt, ctrl=ctrl_state)
        metrics = {"loss": loss, "l1": l1, "ssim": ssim_v,
                   "psnr": train_psnr,
                   "num_keys": jax.lax.pmax(ctx.keys.total, "data"),
                   "cand_scale_req": jax.lax.pmax(
                       ctx.keys.cand_scale_req, "data")}
        # max-reduced per-point stats for the densify pass (union over cameras)
        frame_stats = {
            "in_camera": jax.lax.psum(vis, "data") > 0,
            "num_affected_pixels": jax.lax.psum(
                vis * stats.num_affected_pixels, "data"),
            "magnitude_grad_viewspace": jax.lax.psum(
                vis * stats.magnitude_grad_viewspace, "data"),
            "point_depth": jax.lax.pmax(
                jnp.where(stats.in_camera, ctx.raw.depth, -jnp.inf), "data"),
        }
        return new_state, metrics, frame_stats

    def per_device_scanned(state, images, qs, ts, Ks, sh_band):
        # per-device shapes (S, 1, ...): scan over the window axis
        def body(carry, xs):
            img, q, t, K = xs
            new_state, metrics, fs = per_device(carry[0], img, q, t, K,
                                                sh_band)
            return (new_state, fs), metrics

        fs0 = jax.eval_shape(
            lambda st: per_device(st, images[0], qs[0], ts[0], Ks[0],
                                  sh_band)[2],
            state,
        )
        fs0 = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), fs0)
        (new_state, fs), metrics = jax.lax.scan(
            body, (state, fs0), (images, qs, ts, Ks), length=scan_steps
        )
        return new_state, metrics, fs

    replicated = P()
    if scan_steps > 0:
        batched = P(None, "data")  # (S, B, ...): shard the batch axis
        entry = per_device_scanned
    else:
        batched = P("data")
        entry = per_device
    sharded_step = shard_map(
        entry, mesh=mesh,
        in_specs=(replicated, batched, batched, batched, batched, replicated),
        out_specs=(replicated, replicated, replicated),
        check_vma=False,
    )
    return jax.jit(sharded_step, donate_argnums=(0,)), mesh


def shard_batch(mesh: Mesh, *arrays, batch_axis: int = 0):
    """Place per-camera arrays with the batch axis over the mesh
    (batch_axis=1 for (S, B, ...) dispatch-window stacks)."""
    sharding = NamedSharding(mesh, P(*([None] * batch_axis + ["data"])))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
