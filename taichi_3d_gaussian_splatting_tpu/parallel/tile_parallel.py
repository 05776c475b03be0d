"""Band-sharded (tile-parallel) rendering: one image split across chips.

The complement of parallel/data_parallel.py (SURVEY.md §7 step 6): instead
of one camera per device, ONE camera's image is split into horizontal bands
of tile rows, each rasterized by a different device against the full
(replicated) Gaussian pool. This is the 3DGS analogue of context/sequence
parallelism (SURVEY.md §5 "long-context"): it partitions the pixels x
points interaction while keeping per-device state bounded, so arbitrarily
large images scale across ICI with zero communication in the forward pass
(the output is simply sharded over rows).

Semantics match the single-device render exactly:
- visibility is computed against the FULL image (the reference's 3-tile
  boundary cull, K1 :26) and passed down as the invalid mask, so band
  membership never re-culls a splat another band's pixels need;
- each band renders through a principal-point-shifted camera with a
  vertical cull pad wide enough to accept every full-image-visible splat;
- splats whose extent misses a band produce EMPTY tile bboxes (see
  tiling.tile_bbox), so per-band key counts stay proportional to the
  band's actual workload.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from taichi_3d_gaussian_splatting_tpu.ops.attributes import frustum_cull_mask
from taichi_3d_gaussian_splatting_tpu.ops.projection import project_point
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera,
    GradStats,
    RasterizeOutput,
    RasterizerConfig,
    rasterize,
    rasterize_bwd,
    rasterize_fwd_ctx,
)
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    inverse_qt,
    quaternion_to_rotation_matrix,
)


def _tile_wh(cfg: RasterizerConfig) -> tuple:
    th = cfg.tile_size if cfg.tile_h is None else cfg.tile_h
    return cfg.tile_size, th


def make_band_mesh(n_devices: Optional[int] = None,
                   axis: str = "band") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=(axis,))


def rasterize_band_sharded(
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    invalid_mask: jnp.ndarray,
    q_pointcloud_camera: jnp.ndarray,
    t_pointcloud_camera: jnp.ndarray,
    camera: Camera,
    cfg: RasterizerConfig,
    mesh: Mesh,
    axis: str = "band",
    sh_max_band=3,
) -> RasterizeOutput:
    """Render one camera with its tile rows sharded over ``mesh[axis]``.

    Returns a RasterizeOutput whose arrays are sharded over image rows
    (P(axis) on dim 0); camera.height must divide by n_devices * tile_size.
    """
    n_dev = mesh.shape[axis]
    tile_w, tile_h = _tile_wh(cfg)
    assert camera.height % (n_dev * tile_h) == 0, (
        f"height {camera.height} must divide {n_dev} bands of "
        f"{tile_h}-px tile rows"
    )
    band_h = camera.height // n_dev
    tiles_v_total = camera.height // tile_h
    # always the partition candidate path: per-band key density is ~1/n_dev
    # of the full frame any direct-mode cand_scale was probed on, so an
    # inherited direct config would silently drop keys in every band.
    # The vertical pad (in tile ROWS) must cover the full image plus the
    # full-image cull's 3*tile_w-px boundary pad.
    pad_rows = tiles_v_total + -(-3 * tile_w // tile_h)
    cfg_band = dataclasses.replace(
        cfg, cull_pad_v_tiles=pad_rows,
        candidate_mode="partition", cand_scale=1)

    def per_device(xyz, feats, inval, q, t, K):
        idx = jax.lax.axis_index(axis)
        # full-image visibility (reference cull semantics), band-independent
        q_cw, t_cw = inverse_qt(q.reshape(4), t.reshape(3))
        uv_full, xyz_cam = project_point(
            xyz, quaternion_to_rotation_matrix(q_cw), t_cw, K)
        vis_full = frustum_cull_mask(
            uv_full, xyz_cam[:, 2], inval, camera.width, camera.height,
            cfg.near_plane, cfg.far_plane, (tile_w, tile_h),
        )
        K_band = K.at[1, 2].add(-(idx * band_h).astype(K.dtype))
        cam_band = Camera(K=K_band, width=camera.width, height=band_h)
        return rasterize(
            xyz, feats, jnp.logical_not(vis_full), q, t, cam_band, cfg_band,
            sh_max_band=sh_max_band,
        )

    rep = P()
    out_specs = RasterizeOutput(
        rgb=P(axis), depth=P(axis), alpha=P(axis), count=P(axis))
    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep),
        out_specs=out_specs,
        check_vma=False,
    )
    return fn(xyz, features, invalid_mask, q_pointcloud_camera,
              t_pointcloud_camera, camera.K)


def make_tp_train_step(config, height: int, width: int, mesh: Mesh,
                       axis: str = "band"):
    """Band-sharded TRAINING step: ONE camera per step, its tile rows split
    over ``mesh[axis]`` — the scaling axis for large images, where a
    data-parallel camera batch would not fit or a single chip would bound
    the per-step latency (SURVEY.md §7: "optionally shard image tiles
    across chips... per-point grads psum'd").

    Semantics are EXACTLY the single-device trainer.make_train_step:
    - each band runs forward + manual backward on its rows against the
      full replicated pool (lossless band cull, as rasterize_band_sharded);
    - band predictions all_gather into the full image (one (H, W, 3)
      collective over ICI), the loss and its pixel cotangent are computed
      replicated (SSIM windows straddle band boundaries, so the gradient
      must see the full image), and each band consumes its row slice;
    - per-point parameter gradients and densification statistics psum
      over the band axis — pixels partition exactly, so the sums equal
      the single-device backward to float round-off (see
      tests/test_parallel.py::TestTPTrainStep);
    - optimizer updates run replicated.

    Pose refinement is not supported on the band axis (use the
    data-parallel step); densify stats follow the single-camera contract
    (one step = one frame).
    """
    import optax

    from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl
    from taichi_3d_gaussian_splatting_tpu.training.loss import (
        compute_loss, psnr as psnr_fn,
    )
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        TrainState, grad_factor_vector, make_optimizers,
    )

    if config.pose_refinement:
        raise ValueError("pose_refinement does not compose with the "
                         "band-sharded step; use data_parallel")
    rcfg = config.rasterisation_config
    lcfg = config.loss_function_config
    n_dev = mesh.shape[axis]
    tile_w, tile_h = _tile_wh(rcfg)
    assert height % (n_dev * tile_h) == 0, (
        f"height {height} must divide {n_dev} bands of {tile_h}-px tile rows")
    band_h = height // n_dev
    tiles_v_total = height // tile_h
    cfg_band = dataclasses.replace(
        rcfg, cull_pad_v_tiles=tiles_v_total + -(-3 * tile_w // tile_h),
        candidate_mode="partition", cand_scale=1,
        # rgb-only blend channels for train (see trainer.make_train_step);
        # the gathered depth/count aux images become zeros, re-rendered on
        # demand at image-log cadence
        slim=config.train_slim and not rcfg.rgb_only)
    feature_tx, position_tx = make_optimizers(config)
    gf_np = grad_factor_vector(rcfg)

    def per_device(state, image_gt, q, t, K, sh_band):
        import jax.numpy as jnp

        scene = state.scene
        idx = jax.lax.axis_index(axis)
        q1, t1 = q.reshape(4), t.reshape(3)
        # full-image visibility (band-independent, reference cull rules)
        q_cw, t_cw = inverse_qt(q1, t1)
        uv_full, xyz_cam = project_point(
            scene.xyz, quaternion_to_rotation_matrix(q_cw), t_cw, K)
        vis_full = frustum_cull_mask(
            uv_full, xyz_cam[:, 2], scene.invalid, width, height,
            rcfg.near_plane, rcfg.far_plane, (tile_w, tile_h),
        )
        K_band = K.at[1, 2].add(-(idx * band_h).astype(K.dtype))
        cam_band = Camera(K=K_band, width=width, height=band_h)
        out, ctx, attrs_vjp = rasterize_fwd_ctx(
            scene.xyz, scene.features, jnp.logical_not(vis_full), q1, t1,
            cam_band, cfg_band, sh_max_band=sh_band,
            point_object_id=scene.object_id,
        )
        # bands -> full image, replicated on every device (tiled gather)
        rgb_full = jax.lax.all_gather(out.rgb, axis, axis=0, tiled=True)
        pred = jnp.clip(rgb_full, 0.0, 1.0)

        def loss_fn(p, feats):
            loss, l1, ssim_v = compute_loss(
                p, image_gt, lcfg, features=feats,
                invalid_mask=scene.invalid)
            return loss, (l1, ssim_v)

        (loss, (l1, ssim_v)), (d_pred, d_feat_reg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(pred, scene.features)
        pass_mask = jnp.logical_and(rgb_full > 0.0, rgb_full < 1.0)
        d_rgb_full = jnp.where(pass_mask, d_pred, 0.0)
        d_rgb = jax.lax.dynamic_slice_in_dim(
            d_rgb_full, idx * band_h, band_h, axis=0)
        (d_xyz, d_features), stats = rasterize_bwd(
            ctx, attrs_vjp, d_rgb, cam_band, cfg_band)

        # pixels partition exactly across bands: per-point sums over the
        # band axis equal the single-device backward
        d_xyz = jax.lax.psum(d_xyz, axis)
        d_features = jax.lax.psum(d_features, axis)
        gf = jnp.asarray(gf_np)
        d_features = d_features * gf[None, :] + d_feat_reg
        valid = jnp.logical_not(scene.invalid)[:, None]
        d_xyz = jnp.where(valid, d_xyz, 0.0)
        d_features = jnp.where(valid, d_features, 0.0)

        grad_uv = jax.lax.psum(stats.grad_uv, axis)
        mag = jax.lax.psum(stats.magnitude_grad_viewspace, axis)
        npix = jax.lax.psum(stats.num_affected_pixels, axis)
        ntiles = jax.lax.psum(stats.num_overlap_tiles, axis)
        imggrad = jax.lax.all_gather(
            stats.magnitude_grad_viewspace_on_image, axis, axis=0,
            tiled=True)

        fu, feat_opt = feature_tx.update(d_features, state.feat_opt)
        pu, pos_opt = position_tx.update(d_xyz, state.pos_opt)
        scene = scene._replace(
            features=optax.apply_updates(scene.features, fu),
            xyz=optax.apply_updates(scene.xyz, pu),
        )
        ctrl_state = ctrl.accumulate(
            state.ctrl, vis_full, npix, mag, d_xyz,
        )
        new_state = TrainState(scene=scene, feat_opt=feat_opt,
                               pos_opt=pos_opt, ctrl=ctrl_state)
        metrics = {
            "loss": loss, "l1": l1, "ssim": ssim_v,
            "psnr": psnr_fn(pred, image_gt),
            "num_keys": jax.lax.pmax(ctx.keys.total, axis),
            "cand_scale_req": jax.lax.pmax(ctx.keys.cand_scale_req, axis),
        }
        depth_full = jax.lax.all_gather(out.depth, axis, axis=0, tiled=True)
        count_full = jax.lax.all_gather(out.count, axis, axis=0, tiled=True)
        aux = {
            "pred": pred, "depth": depth_full, "count": count_full,
            "point_depth": ctx.raw.depth,
            # full-image uv (ctx.raw.uv is band-local: shifted principal
            # point) so densify scatter overlays land on the right rows
            "point_uv": uv_full,
            "stats": GradStats(
                grad_uv=grad_uv,
                magnitude_grad_viewspace=mag,
                num_affected_pixels=npix,
                num_overlap_tiles=ntiles,
                in_camera=vis_full,
                magnitude_grad_viewspace_on_image=imggrad,
            ),
        }
        return new_state, metrics, aux

    rep = P()
    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, rep, rep, rep),
        out_specs=(rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,)), mesh
