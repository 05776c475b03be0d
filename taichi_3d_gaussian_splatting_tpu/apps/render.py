"""Headless batch renderer: parquet scene + pose list -> PNG frames.

Behavioral reference: gaussian_point_render.py (the fork's addition).
Poses come from a .pt file (torch.save'd N x 4 x 4 SE(3), camera->world) or
a dataset .json; `--gt_prefix` dumps the autoscaled GT frames;
`--portrait_mode` flips the default landscape preset (reference :32-37).

TPU-native extras:
- the per-frame render is one jitted function (compiled once, reused for
  every pose);
- `--data_parallel` shards the pose list across all visible devices with
  shard_map (each device renders its own frames against the replicated
  scene) — the scaling path the single-GPU reference lacks.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.models import scene as scene_lib
from taichi_3d_gaussian_splatting_tpu.models.scene import (
    GaussianScene,
    SceneConfig,
    merge_scenes,
)
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera,
    RasterizerConfig,
    rasterize,
)
from taichi_3d_gaussian_splatting_tpu.ops.transforms import se3_to_qt

TILE = 32


@dataclass
class RendererConfig:
    """Reference GaussianPointRendererConfig (:22-37), TPU tile-aligned."""

    parquet_paths: List[str] = field(default_factory=list)
    image_height: int = 544
    image_width: int = 976
    camera_intrinsics: Optional[np.ndarray] = None
    rgb_only: bool = True
    data_parallel: bool = False
    tile_parallel: bool = False  # shard ONE image's tile rows across chips

    def __post_init__(self):
        if self.camera_intrinsics is None:
            # the reference preset is 980x546 with the principal point at
            # its center (490, 273); our tile crop is top-left anchored so
            # K — including the principal point — stays the reference's
            self.camera_intrinsics = np.asarray(
                [[581.743, 0.0, 490.0], [0.0, 581.743, 273.0], [0.0, 0.0, 1.0]],
                np.float32,
            )

    def set_portrait_mode(self):
        self.image_height = 976
        self.image_width = 544
        self.camera_intrinsics = np.asarray(
            [[1163.486, 0.0, 273.0], [0.0, 1163.486, 490.0], [0.0, 0.0, 1.0]],
            np.float32,
        )


class GaussianPointRenderer:
    """Reference GaussianPointRenderer (:46-121)."""

    def __init__(self, config: RendererConfig, poses: np.ndarray):
        self.config = config
        h = config.image_height - config.image_height % TILE
        w = config.image_width - config.image_width % TILE
        k = np.asarray(config.camera_intrinsics, np.float32).copy()
        # principal point shifts with the crop center like the reference's
        # plain crop (top-left anchored), so K is unchanged
        self.height, self.width = h, w
        scenes = [
            scene_lib.from_parquet(p, SceneConfig(max_num_points_ratio=None))
            for p in config.parquet_paths
        ]
        self.scene = merge_scenes(scenes) if len(scenes) > 1 else scenes[0]
        self.poses = np.asarray(poses, np.float32)  # (N, 4, 4)
        self.K = jnp.asarray(k)
        self.rcfg = RasterizerConfig(
            near_plane=0.8, far_plane=1000.0, depth_to_sort_key_scale=100.0,
            tile_size=TILE, rgb_only=config.rgb_only,
            interpret=jax.devices()[0].platform == "cpu",
        )
        camera = Camera(K=self.K, width=w, height=h)
        scene = self.scene
        cap, scale = self._fit_cap(camera)
        # direct candidate mode skips the N-length partition sort; the
        # probed scale gets +1 headroom (poses between the probe stride may
        # need one more window step). Fall back to partition when the scale
        # is large (sparse scenes would need huge candidate windows) or the
        # probe overflowed its own key_cap (scale unmeasurable there) —
        # and then keep cand_scale=1 so the expand kernel's windows and
        # VMEM scratch stay at their normal size.
        from taichi_3d_gaussian_splatting_tpu.ops.expand import (
            MAX_CAND_SCALE,
        )
        scale += 1
        mode = "direct" if 0 < scale <= MAX_CAND_SCALE else "partition"
        self.rcfg = dataclasses.replace(
            self.rcfg, key_cap=cap, candidate_mode=mode,
            cand_scale=scale if mode == "direct" else 1)

        def render_one(q, t):
            out = rasterize(
                scene.xyz, scene.features, scene.invalid, q, t, camera,
                self.rcfg, sh_max_band=3, point_object_id=scene.object_id,
            )
            return jnp.clip(out.rgb, 0.0, 1.0)

        self._render_one = jax.jit(render_one)

    def _fit_cap(self, camera):
        """Size the static key capacity to this scene's worst pose (probed
        over a subsample of poses; every pipeline stage scales with it).
        Returns (key_cap, worst candidate-window scale for direct mode)."""
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            build_keys, compute_raw_attrs,
        )
        from taichi_3d_gaussian_splatting_tpu.training.trainer import (
            fit_key_cap,
        )

        scene = self.scene
        probe_cfg = self.rcfg

        @jax.jit
        def count_keys(q, t):
            raw, radius = compute_raw_attrs(
                scene.xyz, scene.features, q, t, camera,
                point_object_id=scene.object_id)
            keys, _, _ = build_keys(raw, radius, scene.invalid, camera,
                                    probe_cfg)
            return keys.total, keys.cand_scale_req

        qs, ts = se3_to_qt(jnp.asarray(self.poses))
        stride = max(1, self.poses.shape[0] // 8)
        probes = [count_keys(qs[i], ts[i])
                  for i in range(0, self.poses.shape[0], stride)]
        worst = max(int(t) for t, _ in probes)
        # scale req is only measured for key windows that exist at the
        # probe's key_cap; a pose overflowing it leaves tail windows
        # unmeasured — signal "unmeasurable" (-1) so the caller falls back
        # to partition mode
        scale = (max(int(s) for _, s in probes)
                 if worst <= probe_cfg.key_cap else -1)
        return fit_key_cap(worst, headroom=1.15), scale

    def frames(self):
        """Yield (index, (H, W, 3) uint8 frame) for every pose."""
        qs, ts = se3_to_qt(jnp.asarray(self.poses))
        if self.config.data_parallel and len(jax.devices()) > 1:
            yield from self._frames_sharded(qs, ts)
            return
        if self.config.tile_parallel and len(jax.devices()) > 1:
            yield from self._frames_band_sharded(qs, ts)
            return
        for i in range(self.poses.shape[0]):
            rgb = self._render_one(qs[i], ts[i])
            yield i, np.asarray(
                jnp.round(rgb * 255).astype(jnp.uint8)
            )

    def _frames_band_sharded(self, qs, ts):
        """Each frame's tile rows sharded across chips (large single images;
        parallel/tile_parallel.py)."""
        from taichi_3d_gaussian_splatting_tpu.parallel.tile_parallel import (
            make_band_mesh, rasterize_band_sharded,
        )

        # at most one 32-px tile row per device; small images fall back to
        # fewer devices (or the plain loop for a single band)
        n_dev = min(len(jax.devices()), self.height // TILE)
        if n_dev < 2:
            for i in range(self.poses.shape[0]):
                rgb = self._render_one(qs[i], ts[i])
                yield i, np.asarray(jnp.round(rgb * 255).astype(jnp.uint8))
            return
        band = TILE * n_dev
        # render UP to the next band multiple and crop the extra bottom
        # rows afterwards: output frames keep the exact requested size
        # regardless of the machine's device count (cropping the render
        # height instead would silently change the frame shape)
        h = ((self.height + band - 1) // band) * band
        camera = Camera(K=self.K, width=self.width, height=h)
        mesh = make_band_mesh(n_dev)
        scene = self.scene
        out_h = self.height

        @jax.jit
        def render_one(q, t):
            out = rasterize_band_sharded(
                scene.xyz, scene.features, scene.invalid, q, t, camera,
                self.rcfg, mesh,
            )
            return jnp.clip(out.rgb[:out_h], 0.0, 1.0)

        for i in range(self.poses.shape[0]):
            rgb = render_one(qs[i], ts[i])
            yield i, np.asarray(jnp.round(rgb * 255).astype(jnp.uint8))

    def _frames_sharded(self, qs, ts):
        """Pose-sharded rendering over the device mesh (per-device vmap-free
        loop via shard_map; the scene is replicated, frames gathered)."""
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        n = self.poses.shape[0]
        devs = jax.devices()
        d = len(devs)
        pad = (-n) % d
        qs = jnp.pad(qs, ((0, pad), (0, 0)))
        ts = jnp.pad(ts, ((0, pad), (0, 0)))
        mesh = Mesh(np.asarray(devs), ("data",))
        render_one = self._render_one.__wrapped__

        def shard_fn(q_shard, t_shard):
            return jax.lax.map(lambda qt: render_one(qt[0][:4], qt[1]),
                               (q_shard, t_shard))

        fn = jax.jit(shard_map(
            shard_fn, mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_vma=False,  # Pallas calls inside
        ))
        # stream one pose per device per dispatch: materializing the whole
        # fly-through at once risks HBM OOM on long paths
        for s in range(0, n + pad, d):
            frames = np.asarray(jnp.round(
                fn(qs[s:s + d], ts[s:s + d]) * 255).astype(jnp.uint8))
            for j in range(d):
                if s + j < n:
                    yield s + j, frames[j]

    def run(self, output_prefix: Path):
        from PIL import Image

        for i, frame in self.frames():
            Image.fromarray(frame, "RGB").save(
                output_prefix / f"frame_{i:03}.png"
            )


def load_poses_pt(path: str) -> np.ndarray:
    """Load an (N, 4, 4) pose tensor saved with torch.save (reference takes
    .pt from tools/generate_ellipse_path.py)."""
    import torch

    return torch.load(path, map_location="cpu",
                      weights_only=True).numpy().astype(np.float32)


def poses_from_dataset(json_path: str, gt_prefix: Optional[Path] = None):
    """Poses (+ camera meta) from a dataset .json (reference :146-173);
    optionally dumps autoscaled GT frames."""
    from PIL import Image

    from taichi_3d_gaussian_splatting_tpu.data.dataset import ImagePoseDataset
    from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
        quaternion_to_rotation_matrix,
    )

    ds = ImagePoseDataset(json_path, tile_size=TILE)
    cameras = np.zeros((len(ds), 4, 4), np.float32)
    info = None
    for idx in range(len(ds)):
        if gt_prefix is None and idx < len(ds) - 1:
            # poses come straight from the records; only the LAST item is
            # decoded (its camera_info carries the image-rescaled
            # intrinsics) — decoding every frame here would add minutes of
            # pointless IO on long datasets
            cameras[idx] = np.asarray(
                ds.records[idx]["T_pointcloud_camera"], np.float32
            ).reshape(4, 4)
            continue
        item = ds[idx]
        r = np.asarray(
            quaternion_to_rotation_matrix(jnp.asarray(item.q_pointcloud_camera))
        )
        cameras[idx, :3, :3] = r
        cameras[idx, :3, 3] = item.t_pointcloud_camera
        cameras[idx, 3, 3] = 1.0
        if gt_prefix is not None:
            Image.fromarray(
                np.round(item.image * 255).astype(np.uint8), "RGB"
            ).save(gt_prefix / f"frame_{idx:03}.png")
        info = item.camera_info
    return cameras, info


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--parquet_path", type=str, required=True, nargs="+")
    parser.add_argument("--poses", type=str, required=True,
                        help=".pt (torch.save'd N x 4 x 4) or dataset .json")
    parser.add_argument("--output_prefix", type=str, required=True)
    parser.add_argument("--gt_prefix", type=str, default="")
    parser.add_argument("--portrait_mode", action="store_true", default=False)
    parser.add_argument("--data_parallel", action="store_true", default=False)
    parser.add_argument("--tile_parallel", action="store_true", default=False,
                        help="shard each image's tile rows across devices "
                        "(large single frames) instead of sharding poses")
    args = parser.parse_args()

    output_prefix = Path(args.output_prefix)
    os.makedirs(output_prefix, exist_ok=True)
    gt_prefix = None
    if args.gt_prefix:
        gt_prefix = Path(args.gt_prefix)
        os.makedirs(gt_prefix, exist_ok=True)

    config = RendererConfig(parquet_paths=list(args.parquet_path),
                            data_parallel=args.data_parallel,
                            tile_parallel=args.tile_parallel)
    if args.poses.endswith(".pt"):
        poses = load_poses_pt(args.poses)
        if args.portrait_mode:
            config.set_portrait_mode()
    elif args.poses.endswith(".json"):
        poses, info = poses_from_dataset(args.poses, gt_prefix)
        config.image_width = info.camera_width
        config.image_height = info.camera_height
        config.camera_intrinsics = info.camera_intrinsics
    else:
        raise ValueError(
            f"Unrecognized poses file format: {args.poses}, must be .pt or .json"
        )

    renderer = GaussianPointRenderer(config, poses)
    renderer.run(output_prefix)


if __name__ == "__main__":
    main()
