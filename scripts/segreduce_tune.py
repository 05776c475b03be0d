"""Tune segment_reduce's (POINT_BLOCK, WINDOW) on the real chip.

The backward regroup+segreduce is the largest off-roofline stage
(~10 ms vs a ~1.9 ms traffic floor at bench shapes). Its cost model:
  matmul   ~ windows x PB x win x 128(min tile) x 2 flops
  mask VPU ~ windows x PB x win
  windows  ~ total_keys/win + n_blocks (>=1 per block)
Smaller PB cuts per-window cost but adds blocks (DMA/grid overhead);
this sweeps the grid and prints ms per variant at bench shapes.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/segreduce_tune.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 100


def main():
    from bench import synthetic_truck_scene
    from taichi_3d_gaussian_splatting_tpu.ops import segment_reduce as sr
    from taichi_3d_gaussian_splatting_tpu.ops import tiling
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        Camera, RasterizerConfig, build_keys, compute_raw_attrs,
    )
    from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap

    n = 428_687
    h, w = 544, 960
    cam = Camera(
        K=jnp.asarray([[580.0, 0, w / 2], [0, 580.0, h / 2], [0, 0, 1]],
                      jnp.float32), width=w, height=h)
    xyz, feats = synthetic_truck_scene(n)
    invalid = jnp.zeros((n,), bool)
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)

    cfg0 = RasterizerConfig(tile_size=32, key_cap=2 ** 21, extra_info=False)
    raw, radius = jax.jit(
        lambda x, f: compute_raw_attrs(x, f, q, t, cam))(xyz, feats)
    k0, _, _ = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, cfg0))(raw, radius)
    import dataclasses as _dc
    cap = fit_key_cap(int(k0.total), headroom=1.0)
    cfg = _dc.replace(cfg0, key_cap=cap)
    keys, table, _ = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, cfg))(raw, radius)

    rng = np.random.default_rng(0)
    d_rows = jnp.asarray(rng.normal(size=(11, cap)).astype(np.float32))
    d_orig = jax.jit(lambda d: tiling.regroup_rows_by_slot(
        d, keys.orig_slot, cap))(d_rows)

    ref = None
    for pb, win in [(1024, 1024), (1024, 512), (512, 1024), (512, 512),
                    (256, 512), (2048, 1024)]:
        sr.POINT_BLOCK, sr.WINDOW = pb, win

        @jax.jit
        def run(d):
            def body(i, carry):
                out = sr.segment_reduce(d + carry * 0.0, keys.offsets,
                                        keys.counts)
                return out.ravel()[0] + out[-1, -1]
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        out = run(d_orig)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        _ = float(run(d_orig))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        # correctness vs numpy on a coarse probe
        got = np.asarray(jax.jit(lambda d: sr.segment_reduce(
            d, keys.offsets, keys.counts))(d_orig))[:, :n]
        if ref is None:
            off = np.asarray(keys.offsets)
            cnt = np.asarray(keys.counts)
            dr = np.asarray(d_orig)
            ref = np.stack([
                np.add.reduceat(dr[r], off, axis=0) * 0  # placeholder
                for r in range(1)])
            # exact check: sum rows for 200 random points
            idxs = rng.choice(n, 200, replace=False)
            ref_rows = {int(i): dr[:, off[i]:off[i] + cnt[i]].sum(axis=1)
                        for i in idxs}
        ok = all(np.allclose(got[:11, i], ref_rows[i], rtol=1e-5,
                             atol=1e-6) for i in ref_rows)
        print(f"PB={pb:5d} WIN={win:5d}  {dt:7.3f} ms  ok={ok}", flush=True)


if __name__ == "__main__":
    main()
