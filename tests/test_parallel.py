"""Data-parallel training tests on the virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import RasterizerConfig
from taichi_3d_gaussian_splatting_tpu.parallel.data_parallel import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl
from taichi_3d_gaussian_splatting_tpu.training.config import TrainConfig
from taichi_3d_gaussian_splatting_tpu.training.loss import LossConfig
from taichi_3d_gaussian_splatting_tpu.training.trainer import (
    TrainState,
    make_optimizers,
    make_train_step,
)

RCFG = RasterizerConfig(tile_size=32, key_cap=2048, interpret=True)
HW = 32
K32 = [[24.0, 0, 16.0], [0, 24.0, 16.0], [0, 0, 1.0]]
Q_ID = [0.0, 0.0, 0.0, 1.0]


def make_scene(n=96, seed=0):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
         rng.uniform(2.0, 4.0, n)], axis=-1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = -2.0
    feats[:, 8] = rng.normal(size=n)
    return GaussianScene(
        xyz=jnp.asarray(xyz), features=jnp.asarray(feats),
        invalid=jnp.zeros(n, bool), object_id=jnp.zeros(n, jnp.int32),
    )


def make_config():
    return TrainConfig(
        rasterisation_config=RCFG,
        loss_function_config=LossConfig(enable_regularization=False),
        feature_learning_rate=1e-2,
    )


def init_state(config, scene):
    ftx, ptx = make_optimizers(config)
    return TrainState(
        scene=scene, feat_opt=ftx.init(scene.features),
        pos_opt=ptx.init(scene.xyz), ctrl=ctrl.init_state(scene.capacity),
    )


def batch(images, qs, ts, Ks):
    return (jnp.asarray(np.stack(images)),
            jnp.asarray(np.stack(qs), jnp.float32),
            jnp.asarray(np.stack(ts), jnp.float32),
            jnp.asarray(np.stack(Ks), jnp.float32))


class TestDataParallel:
    def test_identical_cameras_match_single_device(self):
        """B identical cameras -> pmean(grads) == single-camera grads, so
        the updated scene must match the single-device step exactly."""
        config = make_config()
        scene = make_scene()
        rng = np.random.default_rng(1)
        img = rng.random((HW, HW, 3)).astype(np.float32)

        single = make_train_step(config, HW, HW)
        # the steps donate their input state, so each gets a fresh scene
        s1, m1, _ = single(
            init_state(config, make_scene()), jnp.asarray(img),
            jnp.asarray(Q_ID, jnp.float32), jnp.zeros(3), jnp.asarray(K32),
            jnp.asarray(3, jnp.int32),
        )

        mesh = make_mesh(2)
        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, init_state(config, make_scene()))
        imgs, qs, ts, Ks = shard_batch(
            mesh, *batch([img, img], [Q_ID, Q_ID],
                         [np.zeros(3), np.zeros(3)], [K32, K32]))
        s2, m2, fs = dp(state, imgs, qs, ts, Ks, jnp.asarray(3, jnp.int32))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        # Adam normalizes by sqrt(v): f32 rounding differences between the
        # two XLA programs get amplified to O(lr) near zero-gradient
        # crossings, so compare parameters at a fraction of lr (1e-2)
        np.testing.assert_allclose(
            np.asarray(s1.scene.features), np.asarray(s2.scene.features),
            atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(s1.scene.xyz), np.asarray(s2.scene.xyz), atol=1e-5)
        # densify stats: identical cameras count the frame twice (psum)
        np.testing.assert_allclose(
            np.asarray(s2.ctrl.num_in_camera),
            2 * np.asarray(s1.ctrl.num_in_camera))

    def test_different_cameras_average_gradients(self):
        config = make_config()
        scene = make_scene(seed=3)
        rng = np.random.default_rng(2)
        img_a = rng.random((HW, HW, 3)).astype(np.float32)
        img_b = rng.random((HW, HW, 3)).astype(np.float32)
        t_b = np.asarray([0.1, 0.0, -0.2], np.float32)

        mesh = make_mesh(2)
        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, init_state(config, make_scene(seed=3)))
        imgs, qs, ts, Ks = shard_batch(
            mesh, *batch([img_a, img_b], [Q_ID, Q_ID],
                         [np.zeros(3), t_b], [K32, K32]))
        s2, m2, fs = dp(state, imgs, qs, ts, Ks, jnp.asarray(3, jnp.int32))
        assert np.isfinite(float(m2["loss"]))
        # losses must be the mean of the two per-camera losses: recompute
        single = make_train_step(config, HW, HW)
        _, ma, _ = single(
            init_state(config, make_scene(seed=3)), jnp.asarray(img_a),
            jnp.asarray(Q_ID, jnp.float32), jnp.zeros(3), jnp.asarray(K32),
            jnp.asarray(3, jnp.int32))
        _, mb, _ = single(
            init_state(config, make_scene(seed=3)), jnp.asarray(img_b),
            jnp.asarray(Q_ID, jnp.float32), jnp.asarray(t_b),
            jnp.asarray(K32), jnp.asarray(3, jnp.int32))
        np.testing.assert_allclose(
            float(m2["loss"]), (float(ma["loss"]) + float(mb["loss"])) / 2,
            rtol=1e-5)

    def test_scan_window_matches_sequential_dp_steps(self):
        """A 2-step dispatch window (lax.scan inside shard_map) must replay
        the same math as two sequential dp dispatches."""
        config = make_config()
        rng = np.random.default_rng(5)
        imgs4 = [rng.random((HW, HW, 3)).astype(np.float32)
                 for _ in range(4)]
        ts4 = [np.zeros(3, np.float32),
               np.asarray([0.1, 0.0, -0.2], np.float32),
               np.asarray([-0.1, 0.05, 0.1], np.float32),
               np.zeros(3, np.float32)]

        mesh = make_mesh(2)
        sh3 = jnp.asarray(3, jnp.int32)

        # sequential: two dispatches of B=2
        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, init_state(config, make_scene(seed=7)))
        metrics_seq = []
        for s in range(2):
            b = shard_batch(
                mesh, *batch(imgs4[2 * s:2 * s + 2], [Q_ID, Q_ID],
                             ts4[2 * s:2 * s + 2], [K32, K32]))
            state, m, fs_seq = dp(state, *b, sh3)
            metrics_seq.append(m)

        # windowed: one dispatch of (S=2, B=2)
        dpw, _ = make_dp_train_step(config, HW, HW, mesh, scan_steps=2)
        statew = replicate(mesh, init_state(config, make_scene(seed=7)))
        stacked = batch(imgs4, [Q_ID] * 4, ts4, [K32] * 4)
        stacked = tuple(a.reshape((2, 2) + a.shape[1:]) for a in stacked)
        bw = shard_batch(mesh, *stacked, batch_axis=1)
        statew, mw, fs_win = dpw(statew, *bw, sh3)

        for s in range(2):
            np.testing.assert_allclose(
                float(mw["loss"][s]), float(metrics_seq[s]["loss"]),
                rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(statew.scene.features),
            np.asarray(state.scene.features), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(statew.scene.xyz), np.asarray(state.scene.xyz),
            atol=1e-7)
        # controller accumulators carried across the window
        np.testing.assert_allclose(
            np.asarray(statew.ctrl.num_in_camera),
            np.asarray(state.ctrl.num_in_camera))
        # frame_stats reflect the LAST scan step
        np.testing.assert_allclose(
            np.asarray(fs_win["in_camera"]),
            np.asarray(fs_seq["in_camera"]))


class TestDPDensifyFidelity:
    def test_densify_selection_matches_single_device(self):
        """find_densify on DP frame stats + accumulators must pick the SAME
        points as the single-device step when the batch holds identical
        cameras (vis-weighted-mean frame stats + ratio-form multi-frame
        criteria make the selection invariant to the duplication)."""
        config = make_config()
        scene = make_scene()
        rng = np.random.default_rng(1)
        img = rng.random((HW, HW, 3)).astype(np.float32)

        single = make_train_step(config, HW, HW)
        s1, m1, aux1 = single(
            init_state(config, make_scene()), jnp.asarray(img),
            jnp.asarray(Q_ID, jnp.float32), jnp.zeros(3), jnp.asarray(K32),
            jnp.asarray(3, jnp.int32),
        )

        mesh = make_mesh(2)
        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, init_state(config, make_scene()))
        imgs, qs, ts, Ks = shard_batch(
            mesh, *batch([img, img], [Q_ID, Q_ID],
                         [np.zeros(3), np.zeros(3)], [K32, K32]))
        s2, m2, fs = dp(state, imgs, qs, ts, Ks, jnp.asarray(3, jnp.int32))

        # frame stats equal the single-camera stats exactly
        np.testing.assert_array_equal(
            np.asarray(fs["in_camera"]), np.asarray(aux1["stats"].in_camera))
        np.testing.assert_allclose(
            np.asarray(fs["num_affected_pixels"]),
            np.asarray(aux1["stats"].num_affected_pixels), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fs["magnitude_grad_viewspace"]),
            np.asarray(aux1["stats"].magnitude_grad_viewspace), rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(fs["grad_uv"]), np.asarray(aux1["stats"].grad_uv),
            rtol=2e-5, atol=1e-12)
        vis = np.asarray(aux1["stats"].in_camera)
        np.testing.assert_allclose(
            np.asarray(fs["point_depth"])[vis],
            np.asarray(aux1["point_depth"])[vis], rtol=1e-6)

        # selection with thresholds low enough that points actually fire
        ccfg = ctrl.ControllerConfig(
            densification_view_space_position_gradients_threshold=1e-7,
            under_reconstructed_num_pixels_threshold=8,
        )
        info1 = ctrl.find_densify(
            s1.scene, s1.ctrl, aux1["stats"].in_camera,
            aux1["stats"].num_affected_pixels,
            aux1["stats"].magnitude_grad_viewspace, aux1["point_depth"],
            True, ccfg)
        info2 = ctrl.find_densify(
            s2.scene, s2.ctrl, fs["in_camera"], fs["num_affected_pixels"],
            fs["magnitude_grad_viewspace"], fs["point_depth"], True, ccfg)
        assert int(np.asarray(info1.densify_mask).sum()) > 0, (
            "test thresholds selected nothing — not a meaningful check")
        np.testing.assert_array_equal(np.asarray(info1.densify_mask),
                                      np.asarray(info2.densify_mask))
        np.testing.assert_array_equal(np.asarray(info1.remove_mask),
                                      np.asarray(info2.remove_mask))
        np.testing.assert_array_equal(np.asarray(info1.over_mask),
                                      np.asarray(info2.over_mask))

    def test_accumulators_sum_per_camera_gradients(self):
        """With DIFFERENT cameras the controller accumulators must hold the
        SUM of per-camera (pre-pmean) position gradients — B frames of the
        reference's sequential accumulation — not n_dev x the pmean'd
        global gradient."""
        config = make_config()
        rng = np.random.default_rng(2)
        img_a = rng.random((HW, HW, 3)).astype(np.float32)
        img_b = rng.random((HW, HW, 3)).astype(np.float32)
        t_b = np.asarray([0.1, 0.0, -0.2], np.float32)

        single = make_train_step(config, HW, HW)
        sa, _, _ = single(
            init_state(config, make_scene(seed=3)), jnp.asarray(img_a),
            jnp.asarray(Q_ID, jnp.float32), jnp.zeros(3), jnp.asarray(K32),
            jnp.asarray(3, jnp.int32))
        sb, _, _ = single(
            init_state(config, make_scene(seed=3)), jnp.asarray(img_b),
            jnp.asarray(Q_ID, jnp.float32), jnp.asarray(t_b),
            jnp.asarray(K32), jnp.asarray(3, jnp.int32))

        mesh = make_mesh(2)
        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, init_state(config, make_scene(seed=3)))
        imgs, qs, ts, Ks = shard_batch(
            mesh, *batch([img_a, img_b], [Q_ID, Q_ID],
                         [np.zeros(3), t_b], [K32, K32]))
        s2, _, _ = dp(state, imgs, qs, ts, Ks, jnp.asarray(3, jnp.int32))

        np.testing.assert_allclose(
            np.asarray(s2.ctrl.grad_position),
            np.asarray(sa.ctrl.grad_position)
            + np.asarray(sb.ctrl.grad_position),
            rtol=2e-4, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(s2.ctrl.grad_position_norm),
            np.asarray(sa.ctrl.grad_position_norm)
            + np.asarray(sb.ctrl.grad_position_norm),
            rtol=2e-4, atol=1e-10)


class TestDPPoseRefinement:
    def test_pose_rows_match_single_device(self):
        """Two identical cameras mapped to image rows 0 and 1: each row's
        sparse-Adam update must equal the single-device update for that
        camera (pose gradients are per-image, never batch-averaged)."""
        import dataclasses as dc

        config = dc.replace(make_config(), pose_refinement=True,
                            pose_learning_rate=1e-3,
                            pose_refinement_warm_up=0)
        rng = np.random.default_rng(4)
        img = rng.random((HW, HW, 3)).astype(np.float32)

        def pose_state(config, scene):
            from taichi_3d_gaussian_splatting_tpu.training.trainer import (
                init_pose_opt,
            )
            ftx, ptx = make_optimizers(config)
            return TrainState(
                scene=scene, feat_opt=ftx.init(scene.features),
                pos_opt=ptx.init(scene.xyz),
                ctrl=ctrl.init_state(scene.capacity),
                pose_deltas=jnp.zeros((2, 6), jnp.float32),
                pose_opt=init_pose_opt(2))

        single = make_train_step(config, HW, HW)
        s1, m1, _ = single(
            pose_state(config, make_scene(seed=9)), jnp.asarray(img),
            jnp.asarray(Q_ID, jnp.float32), jnp.zeros(3), jnp.asarray(K32),
            jnp.asarray(3, jnp.int32), jnp.asarray(0, jnp.int32))

        mesh = make_mesh(2)
        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, pose_state(config, make_scene(seed=9)))
        imgs, qs, ts, Ks, idxs = shard_batch(
            mesh, *batch([img, img], [Q_ID, Q_ID],
                         [np.zeros(3), np.zeros(3)], [K32, K32]),
            jnp.asarray([0, 1], jnp.int32))
        s2, m2, _ = dp(state, imgs, qs, ts, Ks, jnp.asarray(3, jnp.int32),
                       idxs)

        d1 = np.asarray(s1.pose_deltas)
        d2 = np.asarray(s2.pose_deltas)
        assert np.abs(d1[0]).max() > 0, "single-device pose never moved"
        np.testing.assert_allclose(d2[0], d1[0], rtol=1e-4, atol=1e-9)
        np.testing.assert_allclose(d2[1], d1[0], rtol=1e-4, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(s2.pose_opt["count"]), [1.0, 1.0])
        # identical cameras: scene updates match the single-device step
        np.testing.assert_allclose(
            np.asarray(s2.scene.xyz), np.asarray(s1.scene.xyz), atol=1e-5)

    def test_pose_scan_window_matches_sequential(self):
        """Pose refinement inside a DP dispatch window (lax.scan) must
        replay two sequential DP pose steps."""
        import dataclasses as dc

        config = dc.replace(make_config(), pose_refinement=True,
                            pose_learning_rate=1e-3,
                            pose_refinement_warm_up=0)
        rng = np.random.default_rng(8)
        imgs4 = [rng.random((HW, HW, 3)).astype(np.float32)
                 for _ in range(4)]
        idxs4 = [0, 1, 1, 0]

        from taichi_3d_gaussian_splatting_tpu.training.trainer import (
            init_pose_opt,
        )

        def pose_state():
            ftx, ptx = make_optimizers(config)
            scene = make_scene(seed=21)
            return TrainState(
                scene=scene, feat_opt=ftx.init(scene.features),
                pos_opt=ptx.init(scene.xyz),
                ctrl=ctrl.init_state(scene.capacity),
                pose_deltas=jnp.zeros((2, 6), jnp.float32),
                pose_opt=init_pose_opt(2))

        mesh = make_mesh(2)
        sh3 = jnp.asarray(3, jnp.int32)

        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, pose_state())
        for s in range(2):
            b = shard_batch(
                mesh, *batch(imgs4[2 * s:2 * s + 2], [Q_ID, Q_ID],
                             [np.zeros(3)] * 2, [K32, K32]),
                jnp.asarray(idxs4[2 * s:2 * s + 2], jnp.int32))
            state, m, _ = dp(state, *b[:4], sh3, b[4])

        dpw, _ = make_dp_train_step(config, HW, HW, mesh, scan_steps=2)
        statew = replicate(mesh, pose_state())
        stacked = batch(imgs4, [Q_ID] * 4, [np.zeros(3)] * 4, [K32] * 4)
        stacked = stacked + (jnp.asarray(idxs4, jnp.int32),)
        stacked = tuple(a.reshape((2, 2) + a.shape[1:]) for a in stacked)
        bw = shard_batch(mesh, *stacked, batch_axis=1)
        statew, mw, _ = dpw(statew, *bw[:4], sh3, bw[4])

        np.testing.assert_allclose(
            np.asarray(statew.pose_deltas), np.asarray(state.pose_deltas),
            rtol=1e-5, atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(statew.pose_opt["count"]),
            np.asarray(state.pose_opt["count"]))
        np.testing.assert_allclose(
            np.asarray(statew.scene.xyz), np.asarray(state.scene.xyz),
            atol=1e-7)

    def test_duplicate_index_sums_to_one_update(self):
        import dataclasses as dc

        config = dc.replace(make_config(), pose_refinement=True,
                            pose_learning_rate=1e-3,
                            pose_refinement_warm_up=0)
        rng = np.random.default_rng(4)
        img = rng.random((HW, HW, 3)).astype(np.float32)

        from taichi_3d_gaussian_splatting_tpu.training.trainer import (
            init_pose_opt,
        )
        ftx, ptx = make_optimizers(config)
        scene = make_scene(seed=9)
        state = TrainState(
            scene=scene, feat_opt=ftx.init(scene.features),
            pos_opt=ptx.init(scene.xyz), ctrl=ctrl.init_state(scene.capacity),
            pose_deltas=jnp.zeros((2, 6), jnp.float32),
            pose_opt=init_pose_opt(2))
        mesh = make_mesh(2)
        dp, _ = make_dp_train_step(config, HW, HW, mesh)
        state = replicate(mesh, state)
        imgs, qs, ts, Ks, idxs = shard_batch(
            mesh, *batch([img, img], [Q_ID, Q_ID],
                         [np.zeros(3), np.zeros(3)], [K32, K32]),
            jnp.asarray([0, 0], jnp.int32))
        s2, _, _ = dp(state, imgs, qs, ts, Ks, jnp.asarray(3, jnp.int32),
                      idxs)
        np.testing.assert_allclose(
            np.asarray(s2.pose_opt["count"]), [1.0, 0.0])
        assert np.abs(np.asarray(s2.pose_deltas)[1]).max() == 0.0


class TestTrainerDP:
    @pytest.mark.slow
    def test_trainer_runs_data_parallel(self, tmp_path):
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
        records = []
        for i in range(4):
            arr = rng.integers(0, 255, (HW, HW, 3), dtype=np.uint8)
            p = img_dir / f"{i}.png"
            Image.fromarray(arr).save(p)
            records.append({
                "image_path": str(p),
                "T_pointcloud_camera": np.eye(4).tolist(),
                "camera_intrinsics": K32,
                "camera_height": HW, "camera_width": HW, "camera_id": 0,
            })
        (tmp_path / "train.json").write_text(json.dumps(records))
        (tmp_path / "val.json").write_text(json.dumps(records[:1]))
        pts = np.stack([rng.uniform(-0.8, 0.8, 48), rng.uniform(-0.8, 0.8, 48),
                        rng.uniform(2, 4, 48)], -1)
        pd.DataFrame(pts, columns=["x", "y", "z"]).to_parquet(
            tmp_path / "pc.parquet")
        config = from_dict({
            "train_dataset_json_path": str(tmp_path / "train.json"),
            "val_dataset_json_path": str(tmp_path / "val.json"),
            "pointcloud_parquet_path": str(tmp_path / "pc.parquet"),
            "summary_writer_log_dir": str(tmp_path / "logs"),
            "num_iterations": 3,
            "val_interval": 2,
            "initial_downsample_factor": 1,
            "data_parallel_devices": 2,
            "steps_per_dispatch": 2,  # dp dispatch windows (lax.scan)
            "save_full_checkpoint": False,
            "rasterisation_config": {
                "tile_size": 32, "key_cap": 2048, "interpret": True,
            },
            "loss_function_config": {"enable_regularization": False},
            "adaptive_controller_config": {"num_iterations_warm_up": 100},
        })
        trainer = GaussianPointCloudTrainer(config)
        state = trainer.train()
        assert np.isfinite(np.asarray(state.scene.features)).all()


class TestPoseShardedRender:
    @pytest.mark.slow
    def test_dp_render_matches_plain_loop(self, tmp_path):
        """The renderer's pose-sharded path (shard_map over the device
        mesh, streamed in device-sized batches) must match the plain
        per-pose loop."""
        import pandas as pd
        from taichi_3d_gaussian_splatting_tpu.apps.render import (
            GaussianPointRenderer, RendererConfig,
        )
        from taichi_3d_gaussian_splatting_tpu.models import scene as scene_lib

        sc = make_scene(96, seed=17)
        pq = tmp_path / "s.parquet"
        scene_lib.to_parquet(sc, str(pq))
        rng = np.random.default_rng(3)
        poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
        poses[:, :3, 3] = rng.normal(0, 0.05, (5, 3))

        def cfg(dp):
            c = RendererConfig(parquet_paths=[str(pq)], data_parallel=dp)
            c.image_height = 64
            c.image_width = 64
            c.camera_intrinsics = np.asarray(K32, np.float32)
            return c

        plain = {i: f for i, f in
                 GaussianPointRenderer(cfg(False), poses).frames()}
        dp = {i: f for i, f in
              GaussianPointRenderer(cfg(True), poses).frames()}
        assert sorted(dp.keys()) == sorted(plain.keys()) == list(range(5))
        for i in range(5):
            np.testing.assert_array_equal(dp[i], plain[i])


class TestTPTrainStep:
    def test_matches_single_device_step(self):
        """Band-sharded training (2 bands x 32-px tiles, 64-px image) must
        reproduce the single-device step: loss, parameter updates and
        densification statistics all psum back exactly (pixels partition
        across bands; the loss cotangent is computed on the gathered full
        image)."""
        from taichi_3d_gaussian_splatting_tpu.parallel.tile_parallel import (
            make_band_mesh, make_tp_train_step,
        )

        h, w = 64, 32
        config = make_config()
        rng = np.random.default_rng(11)
        img = rng.random((h, w, 3)).astype(np.float32)
        K = [[30.0, 0, 16.0], [0, 30.0, 32.0], [0, 0, 1.0]]

        def scene96():
            # includes splats spanning the band boundary (large radii)
            s = make_scene(96, seed=13)
            feats = np.array(s.features)  # writable copy
            feats[:8, 4:7] = -0.5
            return GaussianScene(
                xyz=s.xyz, features=jnp.asarray(feats), invalid=s.invalid,
                object_id=s.object_id)

        single = make_train_step(config, h, w)
        s1, m1, aux1 = single(
            init_state(config, scene96()), jnp.asarray(img),
            jnp.asarray(Q_ID, jnp.float32), jnp.zeros(3), jnp.asarray(K),
            jnp.asarray(3, jnp.int32))

        mesh = make_band_mesh(2)
        tp, _ = make_tp_train_step(config, h, w, mesh)
        s2, m2, aux2 = tp(
            init_state(config, scene96()), jnp.asarray(img),
            jnp.asarray(Q_ID, jnp.float32), jnp.zeros(3), jnp.asarray(K),
            jnp.asarray(3, jnp.int32))

        np.testing.assert_allclose(float(m2["loss"]), float(m1["loss"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(m2["psnr"]), float(m1["psnr"]),
                                   rtol=1e-6)
        # Adam amplifies f32 round-off near zero-gradient crossings (the
        # band psum sums pixels in a different order), so parameters
        # compare at a fraction of the 1e-2 feature lr; the GRADIENT-level
        # checks below are the tight ones
        np.testing.assert_allclose(
            np.asarray(s2.scene.features), np.asarray(s1.scene.features),
            atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(s2.scene.xyz), np.asarray(s1.scene.xyz), atol=1e-5)
        # densification statistics psum back exactly
        st1, st2 = aux1["stats"], aux2["stats"]
        np.testing.assert_array_equal(np.asarray(st2.in_camera),
                                      np.asarray(st1.in_camera))
        np.testing.assert_allclose(
            np.asarray(st2.num_affected_pixels),
            np.asarray(st1.num_affected_pixels), atol=0)
        # atol floor: the blend kernels' stacked-Dekker color/acc matmuls
        # (blend_pallas._dot_dekker3) reassociate differently under the
        # band split — ~6e-10 absolute on near-zero grads (r4)
        np.testing.assert_allclose(
            np.asarray(st2.magnitude_grad_viewspace),
            np.asarray(st1.magnitude_grad_viewspace), rtol=2e-4,
            atol=2e-9)
        np.testing.assert_allclose(
            np.asarray(st2.grad_uv), np.asarray(st1.grad_uv), rtol=2e-4,
            atol=2e-9)
        np.testing.assert_allclose(
            np.asarray(s2.ctrl.grad_position),
            np.asarray(s1.ctrl.grad_position), rtol=2e-4, atol=1e-8)
        # full image reassembles
        np.testing.assert_allclose(np.asarray(aux2["pred"]),
                                   np.asarray(aux1["pred"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(aux2["point_uv"]),
                                   np.asarray(aux1["point_uv"]), atol=1e-4)

    @pytest.mark.slow

    def test_trainer_runs_tile_parallel(self, tmp_path):
        import json

        import pandas as pd
        from PIL import Image

        from taichi_3d_gaussian_splatting_tpu.training.config import from_dict
        from taichi_3d_gaussian_splatting_tpu.training.trainer import (
            GaussianPointCloudTrainer,
        )

        h, w = 64, 32
        rng = np.random.default_rng(0)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        records = []
        for i in range(2):
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            p = img_dir / f"{i}.png"
            Image.fromarray(arr).save(p)
            records.append({
                "image_path": str(p),
                "T_pointcloud_camera": np.eye(4).tolist(),
                "camera_intrinsics": [[30.0, 0, 16.0], [0, 30.0, 32.0],
                                      [0, 0, 1.0]],
                "camera_height": h, "camera_width": w, "camera_id": 0,
            })
        (tmp_path / "train.json").write_text(json.dumps(records))
        (tmp_path / "val.json").write_text(json.dumps(records[:1]))
        pts = np.stack([rng.uniform(-0.8, 0.8, 48),
                        rng.uniform(-0.8, 0.8, 48),
                        rng.uniform(2, 4, 48)], -1)
        pd.DataFrame(pts, columns=["x", "y", "z"]).to_parquet(
            tmp_path / "pc.parquet")
        config = from_dict({
            "train_dataset_json_path": str(tmp_path / "train.json"),
            "val_dataset_json_path": str(tmp_path / "val.json"),
            "pointcloud_parquet_path": str(tmp_path / "pc.parquet"),
            "summary_writer_log_dir": str(tmp_path / "logs"),
            "num_iterations": 3,
            "val_interval": 2,
            "initial_downsample_factor": 1,
            "tile_parallel_devices": 2,
            "save_full_checkpoint": False,
            "rasterisation_config": {
                "tile_size": 32, "key_cap": 2048, "interpret": True,
            },
            "loss_function_config": {"enable_regularization": False},
            "adaptive_controller_config": {"num_iterations_warm_up": 100},
        })
        trainer = GaussianPointCloudTrainer(config)
        state = trainer.train()
        assert np.isfinite(np.asarray(state.scene.features)).all()


class TestBandSharded:
    @pytest.mark.slow
    def test_matches_single_device_render(self):
        """Band-sharded output must equal the single-device render.

        4 CPU devices x 32-px tile rows => a 128-px-tall image; scenes
        include splats spilling across band boundaries (large radii).
        """
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            Camera, rasterize,
        )
        from taichi_3d_gaussian_splatting_tpu.parallel.tile_parallel import (
            make_band_mesh, rasterize_band_sharded,
        )

        rng = np.random.default_rng(3)
        n = 160
        xyz = np.stack(
            [rng.uniform(-1.2, 1.2, n), rng.uniform(-2.2, 2.2, n),
             rng.uniform(2.0, 6.0, n)], axis=-1).astype(np.float32)
        feats = np.zeros((n, 56), np.float32)
        quat = rng.normal(size=(n, 4)).astype(np.float32)
        feats[:, 0:4] = quat / np.linalg.norm(quat, axis=1, keepdims=True)
        feats[:, 4:7] = rng.uniform(-3.0, -0.5, (n, 3))  # some LARGE splats
        feats[:, 7] = rng.uniform(-1.0, 2.0, n)
        feats[:, 8:] = rng.normal(size=(n, 48)) * 0.3
        xyz, feats = jnp.asarray(xyz), jnp.asarray(feats)
        invalid = jnp.zeros((n,), bool)
        w, h = 32, 128
        cam = Camera(
            K=jnp.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                          jnp.float32), width=w, height=h)
        cfg = RasterizerConfig(tile_size=32, key_cap=2048, interpret=True)
        q = jnp.asarray(Q_ID, jnp.float32)
        t = jnp.zeros(3, jnp.float32)

        ref = rasterize(xyz, feats, invalid, q, t, cam, cfg)
        mesh = make_band_mesh(4)
        out = rasterize_band_sharded(
            xyz, feats, invalid, q, t, cam, cfg, mesh)
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(ref.rgb),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.alpha),
                                   np.asarray(ref.alpha), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.depth),
                                   np.asarray(ref.depth), atol=1e-4)
        assert np.abs(np.asarray(out.count).astype(np.int64)
                      - np.asarray(ref.count).astype(np.int64)).max() <= 1
