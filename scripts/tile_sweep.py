"""Sweep tile shapes x point counts on the real chip: keys.total + fwd ms.

The blend kernels' pixel-pair work scales with tile area; the key count
scales with how many tiles a splat's extent covers — so the optimum tile
shape depends on the scene's splat-size distribution. This probe measures
both terms for the bench scenes (428k Truck-like, 1.03M/2.08M
density-normalized official-checkpoint stand-ins).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/tile_sweep.py
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


def probe(n_points, shapes, probe_cap=2 ** 22):
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

    for (tw, th) in shapes:
        pcfg = RasterizerConfig(tile_size=tw, tile_h=th, key_cap=probe_cap,
                                extra_info=False)
        keys, _, _ = jax.jit(
            lambda r, rad: build_keys(r, rad, invalid, cam, pcfg))(raw, radius)
        total = int(keys.total)
        live = int(jnp.sum(keys.tile_end - keys.tile_start))
        cap = fit_key_cap(total, headroom=1.0)
        scale = int(keys.cand_scale_req)
        direct = 0 < scale <= MAX_CAND_SCALE and total <= pcfg.key_cap
        cfg = RasterizerConfig(
            tile_size=tw, tile_h=th, key_cap=cap, extra_info=False,
            rgb_only=True,
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
        print(f"n={n_points:>8} tile={tw}x{th:<2} keys={total:>8} "
              f"live={live:>8} cap=2^{int(np.log2(cap * 8)) - 3 if cap else 0}"
              f" fwd={ms:7.2f} ms  ({bench.HEIGHT * bench.WIDTH / 1e6 / ms * 1e3:5.1f} Mpix/s)",
              flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()
    if args.full:
        plan = [(428_687, [(32, 32), (32, 16), (64, 16), (32, 8), (64, 8),
                           (64, 32)], 2 ** 22),
                (1_030_000, [(32, 32), (32, 16), (64, 16), (32, 8)], 2 ** 22),
                (2_080_000, [(32, 32), (32, 16), (64, 16)], 2 ** 23)]
    else:
        plan = [(428_687, [(32, 16), (64, 16), (64, 32)], 2 ** 22),
                (1_030_000, [(32, 32), (32, 16), (64, 16)], 2 ** 22),
                (2_080_000, [(32, 32), (32, 16), (64, 16)], 2 ** 23)]
    for n, shapes, cap in plan:
        probe(n, shapes, probe_cap=cap)
