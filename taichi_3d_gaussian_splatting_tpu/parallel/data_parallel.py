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
    """Flat "data" mesh over a prefix of jax.devices().

    INVARIANT: mesh position i holds batch row i (shard_batch shards the
    leading axis in mesh order), and in particular mesh device 0 == batch
    row 0. The trainer's image logging and the DP frame_stats' cam0
    selection rely on this — any custom device subset passed here must
    keep jax.devices() order."""
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
    frame_stats reflect the LAST step (what the densifier consumes).

    Under ``config.pose_refinement`` the step additionally takes an (B,)
    int32 image-index batch; per-image se(3) pose rows receive their own
    camera's full (un-averaged) gradient — rows of a batch are disjoint
    across devices, so the row-scattered gradients merge with one psum
    (duplicate indices in a batch average into one combined row gradient
    and one Adam update — see the touch-count division below)."""
    import dataclasses as _dc

    rcfg = config.rasterisation_config
    if config.train_slim and not rcfg.rgb_only:
        # see trainer.make_train_step: rgb-only blend channels for train
        rcfg = _dc.replace(rcfg, slim=True)
    lcfg = config.loss_function_config
    feature_tx, position_tx = make_optimizers(config)
    gf = jnp.asarray(grad_factor_vector(rcfg))
    pose_refine = config.pose_refinement

    def per_device(state: TrainState, image_gt, q, t, K, sh_band,
                   img_idx=None):
        # leading batch axis is 1 on each device
        image_gt = image_gt[0]
        q, t, K = q[0], t[0], K[0]
        scene = state.scene
        camera = Camera(K=K, width=width, height=height)
        if pose_refine:
            idx = jnp.maximum(img_idx[0], 0)
            on = img_idx[0] >= 0
            delta = jnp.where(on, state.pose_deltas[idx], 0.0)

            def pose_fn(d):
                from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
                    apply_pose_delta,
                )
                return apply_pose_delta(q, t, d)

            (q_used, t_used), pose_vjp = jax.vjp(pose_fn, delta)
        else:
            q_used, t_used = q, t
        xyz_in, feats_in = scene.xyz, scene.features
        if pose_refine:
            # inert inputs for invalid (zero-padded) slots: their NaN
            # Jacobians would poison the pose-gradient SUM over slots
            # (same hardening as trainer.make_train_step)
            from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
                quaternion_rotate,
            )

            inval_col = scene.invalid[:, None]
            front = jax.lax.stop_gradient(
                quaternion_rotate(q_used.reshape(4),
                                  jnp.asarray([0.0, 0.0, 1.0]))
                + t_used.reshape(3))
            safe_row = jnp.concatenate(
                [jnp.asarray([0.0, 0.0, 0.0, 1.0]), jnp.zeros((52,))])
            xyz_in = jnp.where(inval_col, front[None, :], xyz_in)
            feats_in = jnp.where(inval_col, safe_row[None, :], feats_in)
        out, ctx, attrs_vjp = rasterize_fwd_ctx(
            xyz_in, feats_in, scene.invalid, q_used, t_used, camera, rcfg,
            sh_max_band=sh_band, point_object_id=scene.object_id,
            with_pose_grads=pose_refine,
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
        grads, stats = rasterize_bwd(
            ctx, attrs_vjp, d_rgb, camera, rcfg
        )
        if pose_refine:
            d_xyz, d_features, d_q, d_t = grads
        else:
            d_xyz, d_features = grads
        d_features = d_features * gf[None, :] + d_feat_reg
        valid = jnp.logical_not(scene.invalid)[:, None]
        d_xyz = jnp.where(valid, d_xyz, 0.0)
        d_features = jnp.where(valid, d_features, 0.0)

        # per-CAMERA accumulator contribution (pre-pmean gradients: the
        # reference accumulates each frame's own position gradient,
        # GaussianPointAdaptiveController.py:130-146, and B cameras in a
        # batch are B frames) via the single source of truth
        # (controller.accumulate, incl. its isfinite hardening), psum'd
        # over the mesh before adding to the carried state
        vis = stats.in_camera.astype(jnp.float32)
        contrib = ctrl.accumulate(
            ctrl.init_state(scene.capacity), stats.in_camera,
            stats.num_affected_pixels, stats.magnitude_grad_viewspace,
            d_xyz,
        )
        ctrl_state = jax.tree.map(
            lambda cur, c: cur + jax.lax.psum(c, "data"), state.ctrl, contrib)

        # ---- collectives: average param grads + metrics -----------------
        d_xyz = jax.lax.pmean(d_xyz, "data")
        d_features = jax.lax.pmean(d_features, "data")
        loss = jax.lax.pmean(loss, "data")
        l1 = jax.lax.pmean(l1, "data")
        ssim_v = jax.lax.pmean(ssim_v, "data")
        train_psnr = jax.lax.pmean(psnr_fn(pred, image_gt), "data")

        fu, feat_opt = feature_tx.update(d_features, state.feat_opt)
        pu, pos_opt = position_tx.update(d_xyz, state.pos_opt)
        scene = scene._replace(
            features=optax.apply_updates(scene.features, fu),
            xyz=optax.apply_updates(scene.xyz, pu),
        )

        if pose_refine:
            # per-image rows are disjoint across a camera batch: scatter
            # each device's row gradient into the full table and psum —
            # duplicate indices sum into one combined gradient. One masked
            # Adam update per TOUCHED row (untouched rows keep momentum /
            # bias-correction state, preserving the trainer's sparse-Adam
            # semantics).
            (d_delta,) = pose_vjp((d_q, d_t))
            zeros_tbl = jnp.zeros_like(state.pose_deltas)
            g_rows = zeros_tbl.at[idx].add(jnp.where(on, d_delta, 0.0))
            g_rows = jax.lax.psum(g_rows, "data")
            # an image index can land on several devices of one batch
            # (GlobalShuffleSampler refills mid-batch across an epoch
            # boundary of a small dataset): average the duplicate rows'
            # gradients so the single Adam step sees the mean, not a
            # touch-count-times learning-rate spike
            touch_n = jnp.zeros(
                (state.pose_deltas.shape[0],), jnp.float32
            ).at[idx].add(jnp.where(on, 1.0, 0.0))
            touch_n = jax.lax.psum(touch_n, "data")
            g_rows = g_rows / jnp.maximum(touch_n, 1.0)[:, None]
            touched = touch_n > 0
            b1, b2, eps = 0.9, 0.999, 1e-8
            po = state.pose_opt
            mu2 = b1 * po["mu"] + (1.0 - b1) * g_rows
            nu2 = b2 * po["nu"] + (1.0 - b2) * g_rows * g_rows
            cnt2 = po["count"] + 1.0
            mu_hat = mu2 / (1.0 - jnp.power(b1, cnt2))[:, None]
            nu_hat = nu2 / (1.0 - jnp.power(b2, cnt2))[:, None]
            move = -config.pose_learning_rate * mu_hat / (
                jnp.sqrt(nu_hat) + eps)
            tcol = touched[:, None]
            pose_opt = {
                "mu": jnp.where(tcol, mu2, po["mu"]),
                "nu": jnp.where(tcol, nu2, po["nu"]),
                "count": jnp.where(touched, cnt2, po["count"]),
            }
            pose_deltas = jnp.where(tcol, state.pose_deltas + move,
                                    state.pose_deltas)
        else:
            pose_deltas, pose_opt = state.pose_deltas, state.pose_opt

        new_state = TrainState(scene=scene, feat_opt=feat_opt,
                               pos_opt=pos_opt, ctrl=ctrl_state,
                               pose_deltas=pose_deltas, pose_opt=pose_opt)
        metrics = {"loss": loss, "l1": l1, "ssim": ssim_v,
                   "psnr": train_psnr,
                   "num_keys": jax.lax.pmax(ctx.keys.total, "data"),
                   "cand_scale_req": jax.lax.pmax(
                       ctx.keys.cand_scale_req, "data")}

        # per-point "this frame" statistics for the densify pass.
        # Selection stats use the visibility-weighted MEAN over the batch's
        # cameras (with identical cameras this equals the single-device
        # frame stats exactly — see tests); depth takes the MIN over
        # visible cameras (the floater criterion is depth < threshold:
        # union-of-frames semantics). Display arrays (pred/point_uv/...)
        # come from camera 0 so densify scatter overlays stay consistent.
        vis_count = jax.lax.psum(vis, "data")
        safe = jnp.maximum(vis_count, 1.0)

        def vis_mean(x):
            return jax.lax.psum(vis * x, "data") / safe

        is0 = jax.lax.axis_index("data") == 0

        def cam0(x):
            # camera-0's array, replicated: zero everywhere else then psum
            return jax.lax.psum(jnp.where(is0, x, jnp.zeros_like(x)), "data")

        frame_stats = {
            "in_camera": vis_count > 0,
            "num_affected_pixels": vis_mean(stats.num_affected_pixels),
            "magnitude_grad_viewspace": vis_mean(
                stats.magnitude_grad_viewspace),
            "grad_uv": jax.lax.psum(
                vis[:, None] * stats.grad_uv, "data") / safe[:, None],
            "num_overlap_tiles": jnp.round(vis_mean(
                stats.num_overlap_tiles.astype(jnp.float32))
            ).astype(jnp.int32),
            "point_depth": jax.lax.pmin(
                jnp.where(stats.in_camera, ctx.raw.depth, jnp.inf), "data"),
            "point_uv": cam0(ctx.raw.uv),
            "pred": cam0(pred),
            "depth_img": cam0(out.depth),
            "count_img": cam0(out.count),
            "imggrad": cam0(stats.magnitude_grad_viewspace_on_image),
        }
        return new_state, metrics, frame_stats

    def per_device_scanned(state, images, qs, ts, Ks, sh_band,
                           img_idxs=None):
        # per-device shapes (S, 1, ...): scan over the window axis
        def body(carry, xs):
            if pose_refine:
                img, q, t, K, idx = xs
                new_state, metrics, fs = per_device(
                    carry[0], img, q, t, K, sh_band, idx)
            else:
                img, q, t, K = xs
                new_state, metrics, fs = per_device(carry[0], img, q, t, K,
                                                    sh_band)
            return (new_state, fs), metrics

        idx_a = (img_idxs[0],) if pose_refine else ()
        fs0 = jax.eval_shape(
            lambda st: per_device(st, images[0], qs[0], ts[0], Ks[0],
                                  sh_band, *idx_a)[2],
            state,
        )
        fs0 = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), fs0)
        xs = (images, qs, ts, Ks) + ((img_idxs,) if pose_refine else ())
        (new_state, fs), metrics = jax.lax.scan(
            body, (state, fs0), xs, length=scan_steps
        )
        return new_state, metrics, fs

    replicated = P()
    if scan_steps > 0:
        batched = P(None, "data")  # (S, B, ...): shard the batch axis
        entry = per_device_scanned
    else:
        batched = P("data")
        entry = per_device
    in_specs = (replicated,) + (batched,) * 4 + (replicated,)
    if pose_refine:
        in_specs = in_specs + (batched,)
    sharded_step = shard_map(
        entry, mesh=mesh,
        in_specs=in_specs,
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
