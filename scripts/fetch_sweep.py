"""Sweep blend_fetch (DMA window width) x tile shape on the real TPU.

The fetch/chunk decoupling (ops/blend_pallas.py) keeps the MXU cumsum at
the cheap 128-lane chunk width while one (16, fetch) DMA amortizes issue
and semaphore latency over fetch/128 compute sub-chunks, each of which
can be skipped when its lane span misses [start, end) or the tile has
saturated. This sweep finds the fetch that minimizes the full forward at
the three bench point counts (Truck 428k + official graphdeco 1.03M /
2.08M, reference benchmark/inference_benchmark.py:18-81).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
          stdbuf -oL python scripts/fetch_sweep.py > /tmp/fetch_sweep.log
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from taichi_3d_gaussian_splatting_tpu.ops.expand import MAX_CAND_SCALE  # noqa: E402
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (  # noqa: E402
    Camera, RasterizerConfig, build_keys, compute_raw_attrs, rasterize,
)
from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap  # noqa: E402

ITERS = 50


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def sweep(n_points, tile=(32, 32), fetches=(128, 256, 512, 1024),
          probe_cap=2 ** 22):
    tw, th = tile
    xyz, feats = bench.synthetic_truck_scene(n_points)
    invalid = jnp.zeros((n_points,), bool)
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    K = jnp.asarray([[580.0, 0.0, bench.WIDTH / 2],
                     [0.0, 580.0, bench.HEIGHT / 2], [0.0, 0.0, 1.0]],
                    jnp.float32)
    cam = Camera(K=K, width=bench.WIDTH, height=bench.HEIGHT)

    pcfg = RasterizerConfig(tile_size=tw, tile_h=th, key_cap=probe_cap,
                            extra_info=False)
    raw0, radius0 = jax.jit(
        lambda x, f: compute_raw_attrs(x, f, q, t, cam))(xyz, feats)
    keys0, _, _ = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, pcfg))(raw0, radius0)
    total = int(keys0.total)
    scale = int(keys0.cand_scale_req)
    direct = 0 < scale <= MAX_CAND_SCALE and total <= pcfg.key_cap

    for fetch in fetches:
        cap = fit_key_cap(total, headroom=1.0)
        if cap % fetch != 0:
            cap = ((cap + fetch - 1) // fetch) * fetch
        cfg = RasterizerConfig(
            tile_size=tw, tile_h=th, key_cap=cap, extra_info=False,
            rgb_only=True, blend_fetch=fetch,
            candidate_mode="direct" if direct else "partition",
            cand_scale=scale if direct else 1)

        @jax.jit
        def chain_full(x, f, cfg=cfg):
            def body(i, carry):
                out = rasterize(x + carry * 0.0, f, invalid, q, t, cam, cfg)
                return out.rgb[0, 0, 0].astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        ms = timed(chain_full, xyz, feats)
        print(f"n={n_points:>8} tile={tw}x{th:<2} fetch={fetch:<5} "
              f"keys={total:>8} cap={cap:>8} "
              f"mode={'direct' if direct else 'partition'} | "
              f"full={ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    sweep(428_687, (32, 32))
    sweep(1_030_000, (32, 32))
    sweep(2_080_000, (32, 32), probe_cap=2 ** 23)
    # fetch also changes the economics of short tiles: each (32, th) tile
    # touches the same key ranges but narrower tiles double the tile count,
    # so DMA-issue amortization matters more there.
    sweep(1_030_000, (32, 16), fetches=(256, 512, 1024))
    sweep(2_080_000, (32, 16), fetches=(256, 512, 1024),
          probe_cap=2 ** 23)
