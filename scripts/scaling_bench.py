"""Data-parallel scaling-efficiency benchmark (BASELINE: >= 80% at
1 chip / 1 host / >= 2 hosts).

Measures steps/s of the data-parallel train step at every mesh size
1, 2, 4, ..., N over the available devices and prints the efficiency
relative to linear scaling of the 1-device throughput (global batch =
mesh size, so perfect scaling = constant step time while images/step
grows with the mesh).

On a real TPU pod run it under every topology you want the numbers for:
  python scripts/scaling_bench.py                 # single host, all chips
  # multi-host: launch one process per host with the multihost config
  # (see parallel/multihost.py); this script then meshes jax.devices()
  # globally and reports the global-batch throughput.

On this CI rig (one real chip + virtual CPU meshes) it documents the
methodology; the collective pattern it times (psum of a 428k-point
gradient + pmean of metrics per step) is exactly the training step's.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALING_FORCE_CPU", "") == "1":
    # must land before the first backend init; the session sitecustomize
    # pins JAX_PLATFORMS=axon, so plain env overrides are too late
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from bench import synthetic_truck_scene
    from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        RasterizerConfig,
    )
    from taichi_3d_gaussian_splatting_tpu.parallel.data_parallel import (
        make_dp_train_step, make_mesh, replicate, shard_batch,
    )
    from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl
    from taichi_3d_gaussian_splatting_tpu.training.config import TrainConfig
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        TrainState, make_optimizers,
    )

    n_points = int(os.environ.get("SCALE_POINTS", 428_687))
    h = w = int(os.environ.get("SCALE_HW", 512))
    steps = int(os.environ.get("SCALE_STEPS", 20))
    platform = jax.devices()[0].platform
    interpret = platform == "cpu"
    if interpret:
        # CPU methodology smoke: tiny shapes, the collective pattern only
        n_points, h, w, steps = 4096, 64, 64, 4

    xyz, feats = synthetic_truck_scene(n_points)
    xyz_h, feats_h = np.asarray(xyz), np.asarray(feats)
    config = TrainConfig(rasterisation_config=RasterizerConfig(
        tile_size=32, key_cap=2 ** (21 if not interpret else 12),
        interpret=interpret))

    def build_state(n):
        scene = GaussianScene(
            xyz=jnp.asarray(xyz_h), features=jnp.asarray(feats_h),
            invalid=jnp.zeros((n,), bool),
            object_id=jnp.zeros((n,), jnp.int32))
        ftx, ptx = make_optimizers(config)
        return TrainState(
            scene=scene, feat_opt=ftx.init(scene.features),
            pos_opt=ptx.init(scene.xyz), ctrl=ctrl.init_state(n))

    rng = np.random.default_rng(3)
    K = np.asarray([[w, 0.0, w / 2], [0.0, w, h / 2], [0.0, 0.0, 1.0]],
                   np.float32)
    n_total = len(jax.devices())
    sizes = []
    d = 1
    while d <= n_total:
        sizes.append(d)
        d *= 2
    base_rate = None
    print(f"platform={platform} devices={n_total} points={n_points} "
          f"{h}x{w} steps={steps}", flush=True)
    for nd in sizes:
        mesh = make_mesh(nd)
        step, _ = make_dp_train_step(config, h, w, mesh,
                                     scan_steps=steps)
        imgs = rng.random((steps, nd, h, w, 3)).astype(np.float32)
        qs = np.tile(np.asarray([[0.0, 0.0, 0.0, 1.0]], np.float32),
                     (steps * nd, 1)).reshape(steps, nd, 4)
        ts = rng.normal(0, 0.02, (steps, nd, 3)).astype(np.float32)
        Ks = np.tile(K, (steps, nd, 1, 1))
        sh = jnp.asarray(3, jnp.int32)

        def run():
            state = replicate(mesh, build_state(n_points))
            b = shard_batch(mesh, imgs, qs, ts, Ks, batch_axis=1)
            jax.block_until_ready(state)
            t0 = time.perf_counter()
            out = step(state, *b, sh)
            jax.block_until_ready(out[1]["loss"])
            return time.perf_counter() - t0

        run()  # compile + warm
        dt = min(run(), run())
        rate = steps * nd / dt  # images/s at global batch nd
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * nd) * 100.0
        # On a shared-core host (virtual devices time-slicing nproc < nd
        # cores) per-device efficiency is physically capped at
        # nproc/nd; aggregate-throughput retention >= 100% is the honest
        # "collectives add no overhead" signal there.
        retention = rate / base_rate * 100.0
        print(f"devices={nd:3d}  {dt / steps * 1e3:8.2f} ms/step  "
              f"{rate:8.2f} img/s  efficiency={eff:6.1f}%  "
              f"retention={retention:6.1f}%", flush=True)


if __name__ == "__main__":
    main()
