"""Multi-host (multi-process) layer: sampler units + 2-process equivalence.

The equivalence test spawns two REAL processes (4 virtual CPU devices
each, Gloo collectives) running the shared smoke sequence
(`parallel/mh_smoke.py`) and pins the result against the single-process
8-device run of the exact same sequence — loss must match to float
round-off, parameters within Adam's amplification of f32 noise.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from taichi_3d_gaussian_splatting_tpu.parallel.multihost import (
    GlobalShuffleSampler,
    check_uniform_resolution,
    expected_resolution,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSampler:
    def test_stream_is_deterministic_across_hosts(self):
        a = GlobalShuffleSampler(10, seed=7)
        b = GlobalShuffleSampler(10, seed=7)
        for _ in range(5):
            assert a.next_global(8) == b.next_global(8)

    def test_epochs_cover_every_item(self):
        s = GlobalShuffleSampler(10, seed=1)
        seen = s.next_global(20)
        assert sorted(seen[:10]) == list(range(10))
        assert sorted(seen[10:]) == list(range(10))

    def test_local_slice_partitions_each_step(self):
        # window of 2 steps x 8 cameras, 2 hosts x 4 devices
        win = list(range(16))
        h0 = GlobalShuffleSampler.local_slice(win, 8, 4, 0)
        h1 = GlobalShuffleSampler.local_slice(win, 8, 4, 4)
        assert h0 == [0, 1, 2, 3, 8, 9, 10, 11]
        assert h1 == [4, 5, 6, 7, 12, 13, 14, 15]

    def test_no_shuffle_is_sequential(self):
        s = GlobalShuffleSampler(4, seed=0, shuffle=False)
        assert s.next_global(6) == [0, 1, 2, 3, 0, 1]


class TestResolutionCheck:
    def test_expected_resolution_plain(self):
        rec = {"camera_height": 546, "camera_width": 980}
        assert expected_resolution(rec, 32) == (544, 960)

    def test_expected_resolution_autodownscale(self):
        # 1920x1080: short edge -> 1024 would make long edge 1820 > 1600,
        # so scale = 1600/1920 (dataset._resize_min_edge semantics)
        rec = {"camera_height": 1080, "camera_width": 1920}
        h = round(1080 * 1600 / 1920)
        w = 1600
        assert expected_resolution(rec, 32) == (h - h % 32, w - w % 32)

    def test_uniform_check_raises_on_mixed(self):
        recs = [{"camera_height": 546, "camera_width": 980},
                {"camera_height": 640, "camera_width": 980}]
        with pytest.raises(ValueError, match="uniform-resolution"):
            check_uniform_resolution(recs, 32)
        assert check_uniform_resolution(recs[:1], 32) == (544, 960)


@pytest.mark.slow
class TestTrainerMultihost:
    def test_train_cli_two_processes(self, tmp_path):
        """The real surface: two `apps.train` processes with multihost
        configs train one job — main host writes checkpoints, both exit
        cleanly, losses agree across hosts."""
        import json

        import pandas as pd
        from PIL import Image

        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        records = []
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            p = img_dir / f"{i}.png"
            Image.fromarray(arr).save(p)
            records.append({
                "image_path": str(p),
                "T_pointcloud_camera": np.eye(4).tolist(),
                "camera_intrinsics": [[24.0, 0, 16.0], [0, 24.0, 16.0],
                                      [0, 0, 1.0]],
                "camera_height": 32, "camera_width": 32, "camera_id": 0,
            })
        (tmp_path / "train.json").write_text(json.dumps(records))
        (tmp_path / "val.json").write_text(json.dumps(records[:1]))
        pts = np.stack([rng.uniform(-0.8, 0.8, 48),
                        rng.uniform(-0.8, 0.8, 48),
                        rng.uniform(2, 4, 48)], -1)
        pd.DataFrame(pts, columns=["x", "y", "z"]).to_parquet(
            tmp_path / "pc.parquet")

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        import yaml
        base = {
            "train_dataset_json_path": str(tmp_path / "train.json"),
            "val_dataset_json_path": str(tmp_path / "val.json"),
            "pointcloud_parquet_path": str(tmp_path / "pc.parquet"),
            "num_iterations": 5,
            "val_interval": 4,
            "initial_downsample_factor": 1,
            "print_metrics_to_console": True,
            "log_loss_interval": 1,
            "save_full_checkpoint": False,
            "steps_per_dispatch": 2,  # windows x multihost batching
            "multihost": True,
            "coordinator_address": f"127.0.0.1:{port}",
            "num_processes": 2,
            "rasterisation_config": {"tile_size": 32, "key_cap": 2048,
                                     "interpret": True},
            "loss_function_config": {"enable_regularization": False},
            # densify at iteration 2 and 4, alpha reset at 4: the
            # find/apply/reset jits must accept mixed global-mesh +
            # host-local (rng key) inputs in the multi-process runtime
            "adaptive_controller_config": {
                "num_iterations_warm_up": 1,
                "num_iterations_densify": 2,
                "num_iterations_reset_alpha": 4,
                "iteration_start_remove_floater": 3,
            },
        }
        procs = []
        for pid in (0, 1):
            cfg = dict(base)
            cfg["process_id"] = pid
            cfg["summary_writer_log_dir"] = str(tmp_path / f"logs_{pid}")
            cfg_path = tmp_path / f"cfg_{pid}.yaml"
            cfg_path.write_text(yaml.safe_dump(cfg))
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
            # keep the session's TPU sitecustomize from registering the
            # axon backend (it would override JAX_PLATFORMS and turn the
            # cluster into independent single-host jobs)
            env.pop("PALLAS_AXON_POOL_IPS", None)
            procs.append(subprocess.Popen(
                [sys.executable, "-m",
                 "taichi_3d_gaussian_splatting_tpu.apps.train",
                 "--train_config", str(cfg_path)],
                cwd=REPO, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        logs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=840)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            logs.append(stdout)
            assert p.returncode == 0, f"trainer failed:\n{stdout[-5000:]}"
        # main host wrote checkpoints; the non-main host did not
        assert (tmp_path / "logs_0" / "scene_4.parquet").exists(), \
            logs[0][-3000:]
        assert not (tmp_path / "logs_1" / "scene_4.parquet").exists()
        # console metrics only on main
        assert "train_loss=" in logs[0]
        assert "train_loss=" not in logs[1]


@pytest.mark.slow
class TestTwoProcessEquivalence:
    def test_matches_single_process(self, tmp_path):
        """2 processes x 4 devices == 1 process x 8 devices, same math."""
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        out = tmp_path / "mh0.npz"
        procs = []
        for pid in (0, 1):
            cmd = [
                sys.executable, "-m",
                "taichi_3d_gaussian_splatting_tpu.parallel.mh_smoke",
                "--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(pid),
                "--local_devices", "4", "--steps", "2",
            ]
            if pid == 0:
                cmd += ["--out", str(out)]
            procs.append(subprocess.Popen(
                cmd, cwd=REPO, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True))
        logs = []
        for p in procs:
            try:
                stdout, _ = p.communicate(timeout=840)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            logs.append(stdout)
            assert p.returncode == 0, f"worker failed:\n{stdout[-4000:]}"
        assert out.exists(), logs[0][-2000:]

        from taichi_3d_gaussian_splatting_tpu.parallel.mh_smoke import (
            single_process_reference,
        )

        ref = single_process_reference(2)
        mh = dict(np.load(out))
        np.testing.assert_allclose(mh["losses"], ref["losses"], rtol=1e-6)
        np.testing.assert_allclose(mh["features"], ref["features"],
                                   atol=2e-3)
        np.testing.assert_allclose(mh["xyz"], ref["xyz"], atol=1e-5)
        np.testing.assert_array_equal(mh["num_in_camera"],
                                      ref["num_in_camera"])
