"""Standalone inference benchmark over a trained scene.

Behavioral reference: benchmark/inference_benchmark.py (warm-up + timed
frames over the val dataset's cameras, device-synchronized timing,
:13-14, :109-160; can ingest the official graphdeco .ply for
apples-to-apples comparison, :18-81).

Usage:
  python benchmark/inference_benchmark.py --scene scene.parquet \
      --dataset val.json [--warmup 1000 --iters 100]
  python benchmark/inference_benchmark.py --scene official.ply ...
"""
from __future__ import annotations

import argparse
import itertools
import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.data.dataset import ImagePoseDataset
from taichi_3d_gaussian_splatting_tpu.models import scene as scene_lib
from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera, RasterizerConfig, rasterize,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", type=str, required=True,
                        help=".parquet or graphdeco .ply checkpoint")
    parser.add_argument("--dataset", type=str, required=True,
                        help="dataset .json providing cameras")
    parser.add_argument("--warmup", type=int, default=1000)
    parser.add_argument("--iters", type=int, default=100)
    parser.add_argument("--tile_size", type=int, default=32)
    parser.add_argument("--key_cap", type=int, default=2**21)
    parser.add_argument("--save_image", type=str, default="")
    args = parser.parse_args()

    cfg = SceneConfig(max_num_points_ratio=None)
    if args.scene.endswith(".ply"):
        scene = scene_lib.from_ply(args.scene, cfg)
    else:
        scene = scene_lib.from_parquet(args.scene, cfg)
    print(f"{scene.capacity} points")

    dataset = ImagePoseDataset(args.dataset, tile_size=args.tile_size)
    rcfg = RasterizerConfig(
        near_plane=0.8, far_plane=1000.0, depth_to_sort_key_scale=100.0,
        tile_size=args.tile_size, key_cap=args.key_cap, rgb_only=True,
        extra_info=False,
        interpret=jax.devices()[0].platform == "cpu",
    )

    # pre-decode all items once (bench the renderer, not PIL)
    items = [dataset[i] for i in range(len(dataset))]

    # fit the static key capacity and candidate mode to this scene over a
    # subsample of the dataset's cameras (same policy as the render CLI:
    # +1 scale headroom, partition fallback when the scale is large or the
    # probe overflowed its own cap)
    import dataclasses

    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        build_keys, compute_raw_attrs,
    )
    from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap

    probe_fns = {}
    worst, scale = 0, 0
    for it in items[:: max(1, len(items) // 8)]:
        info = it.camera_info
        hw = (info.camera_height, info.camera_width)
        if hw not in probe_fns:
            cam = Camera(K=jnp.asarray(info.camera_intrinsics),
                         width=info.camera_width, height=info.camera_height)

            def pf(q, t, cam=cam):
                raw, radius = compute_raw_attrs(
                    scene.xyz, scene.features, q, t, cam,
                    point_object_id=scene.object_id)
                keys, _, _ = build_keys(raw, radius, scene.invalid, cam,
                                        rcfg)
                return keys.total, keys.cand_scale_req

            probe_fns[hw] = jax.jit(pf)
        tot, req = probe_fns[hw](jnp.asarray(it.q_pointcloud_camera),
                                 jnp.asarray(it.t_pointcloud_camera))
        worst = max(worst, int(tot))
        scale = max(scale, int(req))
    scale = scale + 1 if worst <= rcfg.key_cap else 0
    mode = "direct" if 0 < scale <= 8 else "partition"
    rcfg = dataclasses.replace(
        rcfg, key_cap=fit_key_cap(worst, headroom=1.1),
        candidate_mode=mode, cand_scale=scale if mode == "direct" else 1)
    print(f"key_cap {rcfg.key_cap}, candidate mode {mode}"
          + (f"(x{scale})" if mode == "direct" else ""))

    # one jitted render per resolution bucket
    fns = {}

    def render(item):
        info = item.camera_info
        hw = (info.camera_height, info.camera_width)
        if hw not in fns:
            camera = Camera(
                K=jnp.asarray(info.camera_intrinsics),
                width=info.camera_width, height=info.camera_height,
            )
            fns[hw] = jax.jit(lambda q, t, K, cam=camera: rasterize(
                scene.xyz, scene.features, scene.invalid, q, t,
                cam._replace(K=K), rcfg, sh_max_band=3,
                point_object_id=scene.object_id).rgb)
        return fns[hw](
            jnp.asarray(item.q_pointcloud_camera),
            jnp.asarray(item.t_pointcloud_camera),
            jnp.asarray(info.camera_intrinsics),
        )

    stream = itertools.cycle(items)

    print("Warming up...")
    for _ in range(args.warmup):
        out = render(next(stream))
    jax.block_until_ready(out)

    print("Benchmarking...")
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = render(next(stream))
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    h, w, _ = np.asarray(out).shape
    print(f"Inference time: {ms:.3f} ms")
    print(f"FPS: {1000.0 / ms:.2f}")
    print(f"Mpix/s: {h * w / 1e6 / (ms / 1e3):.2f}")

    if args.save_image:
        from PIL import Image

        rgb = np.clip(np.asarray(out), 0, 1)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(args.save_image)


if __name__ == "__main__":
    main()
