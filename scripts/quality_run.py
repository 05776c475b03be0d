"""Synthetic end-to-end quality run: fit a procedurally generated scene.

No external datasets exist in this environment (zero egress), so the
quality gate is self-contained: render ground-truth views of a procedural
Gaussian scene with the oracle-verified renderer, write them to disk as a
standard dataset (PNG + train.json/val.json + point_cloud.parquet with
noisy/subsampled init points, mimicking COLMAP output), then run the FULL
trainer — data loader, jitted steps, adaptive densification, alpha resets,
validation checkpoints — and report val PSNR.

Usage: python scripts/quality_run.py [--iterations 2000] [--out /tmp/qrun]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: the 30k reference-regime run recompiles at
# every key-cap rebucket / resolution change; on resume (or a probe run
# before the real one) the cache removes most of that wall time
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_bench"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_gt_scene(rng, n_clusters=40, pts_per_cluster=400, spread=2.0,
                  scale_range=(-4.2, -3.0), color_noise=0.3):
    """Blobby clustered scene with varied color/scale/opacity.

    ``scale_range``/``color_noise`` control intrinsic detail: small
    splats with strong per-point color variance make a target whose
    optimum genuinely needs hundreds of thousands of reconstruction
    splats (the reference-regime growth proof), where the default
    smooth-blob scene converges at ~100k."""
    centers = rng.uniform(-spread, spread, (n_clusters, 3))
    centers[:, 2] = rng.uniform(-spread / 2, spread / 2, n_clusters)
    xyz, feats = [], []
    for c in centers:
        k = pts_per_cluster
        p = c + rng.normal(0, 0.25, (k, 3))
        f = np.zeros((k, 56), np.float32)
        q = rng.normal(size=(k, 4))
        f[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
        f[:, 4:7] = rng.uniform(*scale_range, (k, 3))
        f[:, 7] = rng.uniform(0.0, 4.0, k)
        base = rng.uniform(-2.5, 2.5, 3)
        f[:, 8] = base[0] + rng.normal(0, color_noise, k)
        f[:, 24] = base[1] + rng.normal(0, color_noise, k)
        f[:, 40] = base[2] + rng.normal(0, color_noise, k)
        # mild view dependence on band 1
        f[:, 9:12] = rng.normal(0, 0.1, (k, 3))
        xyz.append(p)
        feats.append(f)
    return (np.concatenate(xyz).astype(np.float32),
            np.concatenate(feats).astype(np.float32))


def ring_cameras(n, radius=6.0, height=1.5, hw=256, fov_f=300.0, w=None):
    """Cameras on a ring looking at the origin (x right, y down, z fwd).

    ``hw`` is the image height; ``w`` the width (default square)."""
    cams = []
    if w is None:
        w = hw
    K = np.asarray([[fov_f, 0, w / 2], [0, fov_f, hw / 2], [0, 0, 1.0]],
                   np.float32)
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = np.asarray([radius * np.cos(th), -height, radius * np.sin(th)])
        fwd = -pos / np.linalg.norm(pos)
        up_w = np.asarray([0.0, -1.0, 0.0])
        right = np.cross(up_w, fwd); right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd], axis=1)  # camera->world columns
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R
        T[:3, 3] = pos
        cams.append((T, K))
    return cams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iterations", type=int, default=2001)
    parser.add_argument("--views", type=int, default=48)
    parser.add_argument("--hw", type=int, default=256)
    parser.add_argument("--out", type=str, default="/tmp/quality_run")
    parser.add_argument("--pose_noise", type=float, default=0.0,
                        help="perturb TRAIN poses by this magnitude "
                        "(radians rot / units trans) and enable pose "
                        "refinement — GT images keep the true poses, so "
                        "refinement must recover the perturbation")
    parser.add_argument("--long", action="store_true",
                        help="long-horizon preset: the full 30k-style "
                        "trainer schedule compressed — 512px views with "
                        "progressive downsample from 4x, SH band up to 3, "
                        "alpha resets every 3000 its, floater removal "
                        "after 2000, capacity-stressed pool — so every "
                        "trainer cadence runs for real (default "
                        "iterations become 10000)")
    parser.add_argument("--reference_regime", action="store_true",
                        help="the reference's ACTUAL 30k Truck regime "
                        "(config/tat_truck_every_8_test.yaml + "
                        "GaussianPointTrainer.py defaults), not a "
                        "compressed stand-in: 30001 iterations at 896x512 "
                        "(>= the ~980x546 val-view pixel class once "
                        "cropped; every downsample factor stays "
                        "32-divisible), ~55k init points in a ~500k-"
                        "capacity pool (capacity >= the 428,687-point "
                        "published checkpoint), densify every 100 after "
                        "1000 warm-up, alpha reset every 4000 at the "
                        "reference's -1.9 logit value, floater removal "
                        "from 2000, SH band ramp every 1000, downsample "
                        "4x halving every 250, val every 1000")
    args = parser.parse_args()
    width = None
    if args.reference_regime:
        if args.iterations == 2001:
            args.iterations = 30001
        if args.views == 48:
            args.views = 128  # 112 train / 16 val (reference every-8: ~219/32)
        args.hw = 512
        width = 896
    elif args.long:
        if args.iterations == 2001:
            args.iterations = 10000
        args.hw = 512

    from PIL import Image
    import pandas as pd

    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        Camera, RasterizerConfig, rasterize,
    )
    from taichi_3d_gaussian_splatting_tpu.ops.transforms import se3_to_qt

    resume_ck = f"{args.out}/logs/checkpoint_latest"
    have_dataset = os.path.exists(f"{args.out}/train.json")
    rng = np.random.default_rng(0)
    os.makedirs(f"{args.out}/imgs", exist_ok=True)
    if args.reference_regime:
        # detailed enough that the optimum genuinely wants several hundred
        # thousand splats at 896x512: 440k SMALL splats (~1-2.5 px at the
        # ring-camera depth) with strong per-point color texture. The
        # first calibration (180k smooth blobs) converged at PSNR 37 with
        # ~110k points — too easy to drive reference-scale densification.
        gt_xyz, gt_feats = make_gt_scene(
            rng, n_clusters=2000, pts_per_cluster=220, spread=2.6,
            scale_range=(-4.8, -3.6), color_noise=0.5)
    else:
        gt_xyz, gt_feats = make_gt_scene(rng)
    n = gt_xyz.shape[0]
    print(f"GT scene: {n} gaussians", flush=True)

    if width is None:
        width = args.hw
    cams = ring_cameras(args.views, hw=args.hw, w=width)
    rcfg = RasterizerConfig(
        tile_size=32, key_cap=2**21 if args.reference_regime else 2**19,
        interpret=jax.devices()[0].platform == "cpu",
    )
    camera = Camera(K=jnp.asarray(cams[0][1]), width=width, height=args.hw)
    invalid = jnp.zeros((n,), bool)

    @jax.jit
    def render_gt(q, t):
        return jnp.clip(rasterize(
            jnp.asarray(gt_xyz), jnp.asarray(gt_feats), invalid, q, t,
            camera, rcfg).rgb, 0, 1)

    records = []
    if have_dataset:
        print("dataset exists, skipping GT render", flush=True)
        cams = []
    for i, (T, K) in enumerate(cams):
        q, t = se3_to_qt(jnp.asarray(T))
        img = np.asarray(render_gt(q, t))
        path = f"{args.out}/imgs/{i:03d}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
        records.append({
            "image_path": path,
            "T_pointcloud_camera": T.tolist(),
            "camera_intrinsics": K.tolist(),
            "camera_height": args.hw, "camera_width": width,
            "camera_id": 0,
        })
    if not have_dataset:
        train = [r for i, r in enumerate(records) if i % 8 != 0]
        val = [r for i, r in enumerate(records) if i % 8 == 0]
        if args.pose_noise > 0:
            # images stay rendered at the TRUE poses; the recorded train
            # poses get an se(3) perturbation in the refinement-delta
            # convention (T' = T * exp(noise)) for refinement to undo
            from scipy.spatial.transform import Rotation
            for r in train:
                T = np.asarray(r["T_pointcloud_camera"], np.float32)
                w = rng.normal(0, args.pose_noise, 3)
                T2 = T.copy()
                T2[:3, :3] = T[:3, :3] @ Rotation.from_rotvec(w).as_matrix()
                T2[:3, 3] += rng.normal(0, args.pose_noise, 3)
                r["T_pointcloud_camera"] = T2.tolist()
        json.dump(train, open(f"{args.out}/train.json", "w"))
        json.dump(val, open(f"{args.out}/val.json", "w"))

    # noisy subsampled init (mimic COLMAP sparse points)
    init_frac = 8
    sel = rng.choice(n, n // init_frac, replace=False)
    if have_dataset:
        sel = sel[:0]  # keep existing parquet
    init_pts = gt_xyz[sel] + rng.normal(0, 0.05, (len(sel), 3))
    if not have_dataset:
        rgb = np.clip(1 / (1 + np.exp(-gt_feats[sel, 8:9])) * 255, 0, 255)
        pd.DataFrame({
            "x": init_pts[:, 0], "y": init_pts[:, 1], "z": init_pts[:, 2],
            "r": rgb[:, 0], "g": rgb[:, 0], "b": rgb[:, 0],
        }).to_parquet(f"{args.out}/point_cloud.parquet")
        print(f"dataset: {len(train)} train / {len(val)} val views, "
              f"{len(sel)} init points", flush=True)

    from taichi_3d_gaussian_splatting_tpu.training.config import from_dict
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        GaussianPointCloudTrainer,
    )

    cfg = {
        "train_dataset_json_path": f"{args.out}/train.json",
        "val_dataset_json_path": f"{args.out}/val.json",
        "pointcloud_parquet_path": f"{args.out}/point_cloud.parquet",
        "summary_writer_log_dir": f"{args.out}/logs",
        "num_iterations": args.iterations,
        "val_interval": max(args.iterations // 4, 250),
        "initial_downsample_factor": 2,
        "half_downsample_factor_interval": 250,
        "feature_learning_rate": 0.005,
        "position_learning_rate": 0.00005,
        "print_metrics_to_console": False,
        "log_metrics_interval": 100,
        "rasterisation_config": {
            "tile_size": 32, "key_cap": 2**19,
            "interpret": jax.devices()[0].platform == "cpu",
        },
        "adaptive_controller_config": {
            "num_iterations_warm_up": 300,
            "num_iterations_densify": 100,
            "densification_view_space_position_gradients_threshold": 3e-6,
            "under_reconstructed_num_pixels_threshold": 32,
            "num_iterations_reset_alpha": 100000,  # off for short runs
            "reset_alpha_value": -1.9,
            "transparent_alpha_threshold": -2.0,
        },
        "gaussian_point_cloud_scene_config": {
            "max_num_points_ratio": 20.0,
            "initial_alpha": 0.0,
            "max_initial_covariance": 10.0,
            "initial_covariance_ratio": 0.5,
        },
        "loss_function_config": {"enable_regularization": False},
        "resume_from": resume_ck if os.path.exists(resume_ck) else None,
        "steps_per_dispatch": 10,
        "pose_refinement": args.pose_noise > 0,
        "pose_learning_rate": 1e-3,
        "pose_refinement_warm_up": 300,
    }
    if args.reference_regime:
        # mirror config/tat_truck_every_8_test.yaml +
        # GaussianPointTrainer.py:33-63 defaults, value for value
        cfg.update({
            "initial_downsample_factor": 4,
            "half_downsample_factor_interval": 250,
            "increase_color_max_sh_band_interval": 1000,
            "val_interval": 1000,
            "feature_learning_rate": 0.005,
            "position_learning_rate": 0.00005,
            "position_learning_rate_decay_rate": 0.9947,
            "position_learning_rate_decay_interval": 100,
            "log_metrics_interval": 100,
        })
        cfg["rasterisation_config"].update({"key_cap": 2 ** 19})
        # 1-core host: fatter device-side windows amortize the per-window
        # host work (image staging, metric sync) twice as far; 20 divides
        # the densify/val cadences
        cfg["steps_per_dispatch"] = 20
        cfg["adaptive_controller_config"].update({
            "num_iterations_warm_up": 1000,
            "num_iterations_densify": 100,
            # the reference's 3e-6 is tuned to Truck's photo gradient
            # statistics; this synthetic GT converges to ~10x smaller
            # residuals, so the same selection rule needs a proportionally
            # lower threshold to sustain reference-scale growth (observed:
            # 3e-6 grew ~700 points/round at 170k points — a ~260k
            # trajectory; the mechanism, cadence and split/clone rules are
            # unchanged)
            "densification_view_space_position_gradients_threshold": 5e-7,
            "gaussian_split_factor_phi": 1.6,
            "num_iterations_reset_alpha": 4000,
            "reset_alpha_value": -1.9,
            "transparent_alpha_threshold": -2.0,
            "iteration_start_remove_floater": 2000,
            # the reference thresholds are absolute pixel counts at
            # ~980x546; scale to the 896x512 frame area
            "floater_num_pixels_threshold": 343_000,
            "floater_near_camrea_num_pixels_threshold": 257_000,
            "under_reconstructed_num_pixels_threshold": 32,
            "under_reconstructed_move_factor": 10.0,
        })
        cfg["gaussian_point_cloud_scene_config"].update({
            # ~65k init rows (55k COLMAP-like + 10k sky sphere) x 7.5 =
            # ~488k capacity >= the published 428,687-point checkpoint
            "max_num_points_ratio": 7.5,
            "add_sphere": True,
            "initial_alpha": 0.05,
        })
    elif args.long:
        # the 30k-style schedule, every trainer cadence live: progressive
        # downsample from 4x at 512px, SH band ramp to 3, alpha resets
        # (reference: every 3000), floater removal after 2000, and a pool
        # tight enough that densification hits the capacity limiter
        cfg.update({
            "initial_downsample_factor": 4,
            "half_downsample_factor_interval": 500,
            "increase_color_max_sh_band_interval": 1000,
            "val_interval": 1000,
        })
        cfg["adaptive_controller_config"].update({
            "num_iterations_warm_up": 500,
            "num_iterations_reset_alpha": 3000,
            "reset_alpha_value": 0.1,
            "transparent_alpha_threshold": -0.5,
            "iteration_start_remove_floater": 2000,
            "floater_num_pixels_threshold": 10000,
            "floater_near_camrea_num_pixels_threshold": 10000,
        })
        cfg["gaussian_point_cloud_scene_config"].update({
            "max_num_points_ratio": 6.0,
            "add_sphere": True,
        })
    config = from_dict(cfg)
    trainer = GaussianPointCloudTrainer(config)
    t0 = time.time()
    state = trainer.train()
    dt = time.time() - t0
    print(f"trained {args.iterations} iters in {dt:.0f}s "
          f"({args.iterations / dt:.1f} it/s)")
    print(f"final num_valid_points: {int(state.scene.num_valid())}")
    print(f"best val PSNR: {trainer.best_psnr_score:.3f}")


if __name__ == "__main__":
    main()
