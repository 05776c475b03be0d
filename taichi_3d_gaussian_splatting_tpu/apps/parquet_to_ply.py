"""parquet -> graphdeco .ply converter. Reference: parquet_to_ply.py:1-14."""
from __future__ import annotations

import argparse

from taichi_3d_gaussian_splatting_tpu.models import scene as scene_lib
from taichi_3d_gaussian_splatting_tpu.models.scene import SceneConfig


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--parquet_path", type=str, required=True)
    parser.add_argument("--ply_path", type=str, required=True)
    args = parser.parse_args()
    scene = scene_lib.from_parquet(
        args.parquet_path, SceneConfig(max_num_points_ratio=None)
    )
    scene_lib.to_ply(scene, args.ply_path)


if __name__ == "__main__":
    main()
