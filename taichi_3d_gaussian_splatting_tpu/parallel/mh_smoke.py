"""Multi-host smoke/equivalence harness: N processes, one DP train step fleet.

Runnable worker for multi-process validation on CPU rigs (the driver and
CI have no multi-host TPU): each process owns `--local_devices` virtual
CPU devices, joins the Gloo-backed distributed runtime, and runs a fixed
deterministic training sequence through the SAME
`data_parallel.make_dp_train_step` used on real meshes — cameras sharded
per host (`multihost.global_shard_batch`), state replicated
(`multihost.global_replicate`), psum/pmean spanning the process
boundary. Process 0 writes the final state to `--out` so a parent can
compare against the single-process result (`single_process_reference`).

Usage (2 hosts x 4 devices):
  python -m taichi_3d_gaussian_splatting_tpu.parallel.mh_smoke \
      --coordinator 127.0.0.1:PORT --num_processes 2 --process_id I \
      --local_devices 4 --steps 2 --out /tmp/mh_I.npz
"""
from __future__ import annotations

import argparse
import os


TOTAL_DEVICES = 8      # fixed global batch: results comparable across rigs
HW = 64
N_POINTS = 256
KEY_CAP = 2048


def _scene_and_batches(steps: int):
    """Deterministic scene + per-step global camera batches (host-agnostic:
    every process computes the identical stream)."""
    import numpy as np

    rng = np.random.default_rng(42)
    xyz = np.stack(
        [rng.uniform(-0.9, 0.9, N_POINTS), rng.uniform(-0.9, 0.9, N_POINTS),
         rng.uniform(2.0, 4.5, N_POINTS)], axis=-1).astype(np.float32)
    feats = np.zeros((N_POINTS, 56), np.float32)
    q = rng.normal(size=(N_POINTS, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-3.5, -2.0, (N_POINTS, 3))
    feats[:, 7] = rng.uniform(-1.5, 1.5, N_POINTS)
    feats[:, 8:] = (rng.normal(size=(N_POINTS, 48)) * 0.3).astype(np.float32)

    batches = []
    for _ in range(steps):
        images = rng.random((TOTAL_DEVICES, HW, HW, 3)).astype(np.float32)
        qs = np.tile(np.asarray([[0.0, 0.0, 0.0, 1.0]], np.float32),
                     (TOTAL_DEVICES, 1))
        ts = rng.normal(0, 0.05, (TOTAL_DEVICES, 3)).astype(np.float32)
        Ks = np.tile(np.asarray(
            [[[48.0, 0.0, HW / 2], [0.0, 48.0, HW / 2], [0.0, 0.0, 1.0]]],
            np.float32), (TOTAL_DEVICES, 1, 1))
        batches.append((images, qs, ts, Ks))
    return xyz, feats, batches


def _make_step_inputs():
    from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig,
    )
    from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl
    from taichi_3d_gaussian_splatting_tpu.training.config import TrainConfig
    from taichi_3d_gaussian_splatting_tpu.training.loss import LossConfig
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        TrainState, make_optimizers,
    )
    import jax.numpy as jnp

    config = TrainConfig(
        rasterisation_config=RasterizerConfig(
            tile_size=32, key_cap=KEY_CAP, interpret=True),
        loss_function_config=LossConfig(enable_regularization=False),
        feature_learning_rate=1e-2,
    )

    def build_state(xyz, feats):
        scene = GaussianScene(
            xyz=jnp.asarray(xyz), features=jnp.asarray(feats),
            invalid=jnp.zeros((N_POINTS,), bool),
            object_id=jnp.zeros((N_POINTS,), jnp.int32))
        ftx, ptx = make_optimizers(config)
        return TrainState(
            scene=scene, feat_opt=ftx.init(scene.features),
            pos_opt=ptx.init(scene.xyz),
            ctrl=ctrl.init_state(scene.capacity))

    return config, build_state


def run_worker(coordinator: str, num_processes: int, process_id: int,
               local_devices: int, steps: int, out: str | None) -> dict:
    """Join the cluster, run the sequence, return (and maybe save) results."""
    # replace (not append) any inherited device-count flag — e.g. the test
    # suite's 8-device conftest value — with this worker's local count
    import re
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                   os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    from taichi_3d_gaussian_splatting_tpu.parallel import multihost as mh

    mh.initialize(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    assert jax.process_count() == num_processes
    assert len(jax.devices()) == TOTAL_DEVICES, (
        f"need {TOTAL_DEVICES} global devices, got {len(jax.devices())}")

    import numpy as np
    import jax.numpy as jnp
    from taichi_3d_gaussian_splatting_tpu.parallel.data_parallel import (
        make_dp_train_step,
    )

    mesh = mh.make_global_mesh()
    config, build_state = _make_step_inputs()
    xyz, feats, batches = _scene_and_batches(steps)
    state = mh.global_replicate(mesh, build_state(xyz, feats))
    step, _ = make_dp_train_step(config, HW, HW, mesh)

    offset = mh.local_batch_offset()
    local_n = len(jax.local_devices())
    losses = []
    for images, qs, ts, Ks in batches:
        loc = slice(offset, offset + local_n)
        gimgs, gqs, gts, gKs = mh.global_shard_batch(
            mesh, images[loc], qs[loc], ts[loc], Ks[loc])
        state, metrics, _ = step(state, gimgs, gqs, gts, gKs,
                                 jnp.asarray(3, jnp.int32))
        losses.append(float(metrics["loss"]))

    result = {
        "losses": np.asarray(losses, np.float64),
        "features": np.asarray(state.scene.features),
        "xyz": np.asarray(state.scene.xyz),
        "num_in_camera": np.asarray(state.ctrl.num_in_camera),
    }
    if out and jax.process_index() == 0:
        np.savez(out, **result)
    print(f"mh_smoke process {process_id}/{num_processes}: "
          f"losses={losses}", flush=True)
    return result


def single_process_reference(steps: int) -> dict:
    """The same sequence on a single-process 8-device mesh (callers must
    already have >= 8 devices, e.g. the test suite's virtual CPU mesh)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from taichi_3d_gaussian_splatting_tpu.parallel.data_parallel import (
        make_dp_train_step, make_mesh, replicate, shard_batch,
    )

    assert len(jax.devices()) >= TOTAL_DEVICES
    mesh = make_mesh(TOTAL_DEVICES)
    config, build_state = _make_step_inputs()
    xyz, feats, batches = _scene_and_batches(steps)
    state = replicate(mesh, build_state(xyz, feats))
    step, _ = make_dp_train_step(config, HW, HW, mesh)
    losses = []
    for images, qs, ts, Ks in batches:
        gimgs, gqs, gts, gKs = shard_batch(mesh, images, qs, ts, Ks)
        state, metrics, _ = step(state, gimgs, gqs, gts, gKs,
                                 jnp.asarray(3, jnp.int32))
        losses.append(float(metrics["loss"]))
    return {
        "losses": np.asarray(losses, np.float64),
        "features": np.asarray(state.scene.features),
        "xyz": np.asarray(state.scene.xyz),
        "num_in_camera": np.asarray(state.ctrl.num_in_camera),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    run_worker(args.coordinator, args.num_processes, args.process_id,
               args.local_devices, args.steps, args.out)


if __name__ == "__main__":
    main()
