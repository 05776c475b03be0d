"""Sweep blend_chunk (DMA window width) at bench shapes on the real chip.

The blend kernels stream (16, chunk) windows per grid step; at chunk=128
the per-window VPU work (~1.3 us at px=1024) barely covers the DMA latency,
so the tile-shape sweep showed per-chunk overhead dominating whenever px
shrinks. Wider chunks amortize the latency at the cost of coarser
early-exit granularity and (chunk/2 per tile) more alignment-padding lanes.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
          stdbuf -oL python scripts/chunk_sweep.py > /tmp/chunk_sweep.log
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from taichi_3d_gaussian_splatting_tpu.ops.expand import MAX_CAND_SCALE  # noqa: E402
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (  # noqa: E402
    Camera, RasterizerConfig, build_keys, compute_raw_attrs, rasterize,
)
from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap  # noqa: E402

TIMED = 30


def probe(n_points, chunks, tile=(32, 32), probe_cap=2 ** 22):
    tw, th = tile
    xyz, feats = bench.synthetic_truck_scene(n_points)
    invalid = jnp.zeros((n_points,), bool)
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    K = jnp.asarray([[580.0, 0.0, bench.WIDTH / 2],
                     [0.0, 580.0, bench.HEIGHT / 2], [0.0, 0.0, 1.0]],
                    jnp.float32)
    cam = Camera(K=K, width=bench.WIDTH, height=bench.HEIGHT)
    raw, radius = jax.jit(
        lambda x, f: compute_raw_attrs(x, f, q, t, cam))(xyz, feats)
    pcfg = RasterizerConfig(tile_size=tw, tile_h=th, key_cap=probe_cap,
                            extra_info=False)
    keys, _, _ = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, pcfg))(raw, radius)
    total = int(keys.total)
    scale = int(keys.cand_scale_req)
    direct = 0 < scale <= MAX_CAND_SCALE and total <= pcfg.key_cap

    for chunk in chunks:
        cap = fit_key_cap(total, headroom=1.0)
        if cap % chunk != 0:
            cap = ((cap + chunk - 1) // chunk) * chunk
        cfg = RasterizerConfig(
            tile_size=tw, tile_h=th, key_cap=cap, extra_info=False,
            rgb_only=True, blend_chunk=chunk,
            candidate_mode="direct" if direct else "partition",
            cand_scale=scale if direct else 1)

        @jax.jit
        def chain(x, f):
            def body(i, carry):
                out = rasterize(x + carry * 0.0, f, invalid, q, t, cam,
                                cfg).rgb
                return out[0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, TIMED, body, jnp.float32(0))

        jax.block_until_ready(chain(xyz, feats))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(xyz, feats))
        ms = (time.perf_counter() - t0) / TIMED * 1e3
        print(f"n={n_points:>8} tile={tw}x{th} chunk={chunk:<4} "
              f"keys={total:>8} fwd={ms:7.2f} ms "
              f"({bench.HEIGHT * bench.WIDTH / 1e6 / ms * 1e3:5.1f} Mpix/s)",
              flush=True)


if __name__ == "__main__":
    # fat chunks amortize per-window DMA latency; short tiles then cut
    # pair work without paying the latency tax the tile sweep measured
    probe(428_687, [256, 512])
    probe(428_687, [512], tile=(32, 8))
    probe(1_030_000, [256, 512])
    probe(1_030_000, [512, 1024], tile=(32, 8))
    probe(1_030_000, [512], tile=(32, 16))
    probe(2_080_000, [512], probe_cap=2 ** 23)
    probe(2_080_000, [512, 1024], tile=(32, 8), probe_cap=2 ** 23)
    probe(2_080_000, [512], tile=(32, 16), probe_cap=2 ** 23)
