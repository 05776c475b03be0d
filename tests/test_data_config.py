"""Dataset + config system tests."""
import json

import numpy as np
import pytest
import yaml

from taichi_3d_gaussian_splatting_tpu.data.dataset import (
    ImagePoseDataset,
    PrefetchLoader,
    downsample_item,
)
from taichi_3d_gaussian_splatting_tpu.training.config import (
    TrainConfig,
    load_config,
    save_template,
)


@pytest.fixture()
def dataset_on_disk(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    records = []
    for i in range(3):
        arr = rng.integers(0, 255, (70, 100, 3), dtype=np.uint8)
        p = tmp_path / f"img{i}.png"
        Image.fromarray(arr).save(p)
        T = np.eye(4)
        T[:3, 3] = [i, 0.0, 0.0]
        records.append({
            "image_path": str(p),
            "T_pointcloud_camera": T.tolist(),
            # intrinsics declared at 2x the actual image size
            "camera_intrinsics": [[200.0, 0, 100.0], [0, 140.0, 70.0], [0, 0, 1]],
            "camera_height": 140, "camera_width": 200, "camera_id": i,
        })
    path = tmp_path / "train.json"
    path.write_text(json.dumps(records))
    return str(path)


class TestImagePoseDataset:
    def test_load_and_crop(self, dataset_on_disk):
        ds = ImagePoseDataset(dataset_on_disk, tile_size=32)
        assert len(ds) == 3
        item = ds[0]
        # 100x70 cropped to multiples of 32 -> 96x64
        assert item.image.shape == (64, 96, 3)
        assert item.camera_info.camera_height == 64
        assert item.camera_info.camera_width == 96
        assert 0.0 <= item.image.min() and item.image.max() <= 1.0

    def test_intrinsics_rescaled_to_actual_size(self, dataset_on_disk):
        ds = ImagePoseDataset(dataset_on_disk, tile_size=32)
        K = ds[0].camera_info.camera_intrinsics
        # fx scaled by actual/declared = 100/200
        np.testing.assert_allclose(K[0, 0], 100.0)
        np.testing.assert_allclose(K[1, 1], 70.0)

    def test_pose_conversion(self, dataset_on_disk):
        ds = ImagePoseDataset(dataset_on_disk, tile_size=32)
        item = ds[1]
        np.testing.assert_allclose(
            item.q_pointcloud_camera, [0, 0, 0, 1], atol=1e-7
        )
        np.testing.assert_allclose(item.t_pointcloud_camera, [1, 0, 0])

    def test_downsample_item(self, dataset_on_disk):
        ds = ImagePoseDataset(dataset_on_disk, tile_size=32)
        item = ds[0]
        down = downsample_item(item, 2, tile_size=32)
        assert down.image.shape == (32, 32, 3)
        np.testing.assert_allclose(
            down.camera_info.camera_intrinsics[0, 0],
            item.camera_info.camera_intrinsics[0, 0] / 2,
        )

    def test_prefetch_loader_one_epoch(self, dataset_on_disk):
        ds = ImagePoseDataset(dataset_on_disk, tile_size=32)
        items = list(PrefetchLoader(ds, shuffle=True, loop=False, seed=1))
        assert sorted(i.index for i in items) == [0, 1, 2]

    def test_prefetch_loader_cycles(self, dataset_on_disk):
        ds = ImagePoseDataset(dataset_on_disk, tile_size=32)
        it = iter(PrefetchLoader(ds, shuffle=False, loop=True))
        seen = [next(it).index for _ in range(7)]
        assert seen[:3] == [0, 1, 2] and seen[3:6] == [0, 1, 2]


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "template.yaml"
        save_template(str(p))
        cfg = load_config(str(p))
        assert cfg == TrainConfig()

    def test_kebab_case_and_unknown_keys(self, tmp_path):
        data = {
            "num-iterations": 123,
            "position_learning_rateo": 1.0,  # typo'd key, tolerated
            "rasterisation_config": {"near-plane": 0.5, "bogus": 1},
            "loss_function_config": {"lambda_value": 0.3},
        }
        p = tmp_path / "c.yaml"
        p.write_text(yaml.safe_dump(data))
        cfg = load_config(str(p))
        assert cfg.num_iterations == 123
        assert cfg.rasterisation_config.near_plane == 0.5
        assert cfg.loss_function_config.lambda_value == 0.3
