"""Full-state checkpoint/resume tests (capability beyond the reference)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.training.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)


class TestCheckpointRoundtrip:
    def test_pytree_roundtrip(self, tmp_path):
        state = {
            "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
            "b": (jnp.ones(5, jnp.int32), jnp.zeros((2, 2))),
        }
        save_checkpoint(str(tmp_path / "ck"), state,
                        {"iteration": 7, "best_psnr": 21.5})
        template = jax.tree.map(jnp.zeros_like, state)
        restored, meta = load_checkpoint(str(tmp_path / "ck"), template)
        assert meta["iteration"] == 7
        for got, want in zip(jax.tree.leaves(restored),
                             jax.tree.leaves(state)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_shape_mismatch_rejected(self, tmp_path):
        save_checkpoint(str(tmp_path / "ck"), {"a": jnp.ones((3,))},
                        {"iteration": 0})
        try:
            load_checkpoint(str(tmp_path / "ck"), {"a": jnp.ones((4,))})
            raise RuntimeError("should have raised")
        except ValueError:  # data validation must survive python -O
            pass
        # dtype drift is rejected too
        try:
            load_checkpoint(str(tmp_path / "ck"),
                            {"a": jnp.ones((3,), jnp.int32)})
            raise RuntimeError("should have raised")
        except ValueError:
            pass


class TestTrainerResume:
    @pytest.mark.slow
    def test_resume_continues_training(self, tmp_path):
        """Train 4 iters (val@3 writes checkpoint_latest), resume to 6."""
        import json
        from PIL import Image
        import pandas as pd

        from taichi_3d_gaussian_splatting_tpu.training.config import from_dict
        from taichi_3d_gaussian_splatting_tpu.training.trainer import (
            GaussianPointCloudTrainer,
        )

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        y, x = np.mgrid[0:32, 0:32] / 32
        arr = (np.stack([x, y, x * y], -1) * 255).astype(np.uint8)
        p = img_dir / "0.png"
        Image.fromarray(arr).save(p)
        rec = [{
            "image_path": str(p),
            "T_pointcloud_camera": np.eye(4).tolist(),
            "camera_intrinsics": [[24.0, 0, 16], [0, 24.0, 16], [0, 0, 1]],
            "camera_height": 32, "camera_width": 32, "camera_id": 0,
        }]
        (tmp_path / "train.json").write_text(json.dumps(rec))
        (tmp_path / "val.json").write_text(json.dumps(rec))
        pts = np.stack([rng.uniform(-0.8, 0.8, 32), rng.uniform(-0.8, 0.8, 32),
                        rng.uniform(2, 4, 32)], -1)
        pd.DataFrame(pts, columns=["x", "y", "z"]).to_parquet(
            tmp_path / "pc.parquet")

        base = {
            "train_dataset_json_path": str(tmp_path / "train.json"),
            "val_dataset_json_path": str(tmp_path / "val.json"),
            "pointcloud_parquet_path": str(tmp_path / "pc.parquet"),
            "summary_writer_log_dir": str(tmp_path / "logs"),
            "num_iterations": 4,
            "val_interval": 3,
            "initial_downsample_factor": 1,
            "rasterisation_config": {
                "tile_size": 32, "key_cap": 2048, "interpret": True,
            },
            "loss_function_config": {"enable_regularization": False},
            "adaptive_controller_config": {"num_iterations_warm_up": 100},
        }
        trainer = GaussianPointCloudTrainer(from_dict(base))
        state1 = trainer.train()
        ck = tmp_path / "logs" / "checkpoint_latest"
        assert ck.exists()

        base2 = dict(base)
        base2["num_iterations"] = 6
        base2["resume_from"] = str(ck)
        trainer2 = GaussianPointCloudTrainer(from_dict(base2))
        state2 = trainer2.train()
        # resumed scene differs from the checkpointed one (training happened)
        assert not np.allclose(np.asarray(state1.scene.features),
                               np.asarray(state2.scene.features))
