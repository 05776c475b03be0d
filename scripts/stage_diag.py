"""Stage attribution per (points, tile shape): attrs / keys / blend split.

Times three in-jit chains (DCE-proof: every output leaf is consumed into
the carried scalar) and prints the candidate mode actually used — the
tile-shape sweeps need this to separate key-pipeline growth, blend pair
work, and mode fallbacks (a shape whose cand_scale_req exceeds
MAX_CAND_SCALE silently pays the N-length partition sort).

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
          stdbuf -oL python scripts/stage_diag.py > /tmp/stage_diag.log
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

ITERS = 50


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def diag(n_points, tile=(32, 32), chunk=128, probe_cap=2 ** 22):
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
    align = chunk
    cap = fit_key_cap(total, headroom=1.0)
    if cap % align != 0:
        cap = ((cap + align - 1) // align) * align
    cfg = RasterizerConfig(
        tile_size=tw, tile_h=th, key_cap=cap, extra_info=False,
        rgb_only=True, blend_chunk=chunk,
        candidate_mode="direct" if direct else "partition",
        cand_scale=scale if direct else 1)

    @jax.jit
    def chain_attrs(x, f):
        def body(i, carry):
            raw, radius = compute_raw_attrs(x + carry * 0.0, f, q, t, cam)
            s = sum(jnp.sum(v) for v in raw) + jnp.sum(radius)
            return s.astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def chain_keys(x, f):
        def body(i, carry):
            raw, radius = compute_raw_attrs(x + carry * 0.0, f, q, t, cam)
            keys, table, vis = build_keys(raw, radius, invalid, cam, cfg)
            s = (jnp.sum(table) + jnp.sum(keys.tile_start)
                 + jnp.sum(keys.tile_end) + jnp.sum(keys.real)
                 + keys.total + jnp.sum(keys.offsets) + jnp.sum(keys.counts)
                 + jnp.sum(keys.tile_of_slot) + jnp.sum(vis))
            return s.astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    @jax.jit
    def chain_full(x, f):
        def body(i, carry):
            out = rasterize(x + carry * 0.0, f, invalid, q, t, cam, cfg)
            return out.rgb[0, 0, 0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    ms_a = timed(chain_attrs, xyz, feats)
    ms_k = timed(chain_keys, xyz, feats)
    ms_f = timed(chain_full, xyz, feats)
    live = int(jnp.sum(keys0.tile_end - keys0.tile_start)) if tile == (
        32, 32) else None
    print(f"n={n_points:>8} tile={tw}x{th:<2} chunk={chunk:<4} "
          f"keys={total:>8} cap={cap:>8} "
          f"mode={'direct' if direct else 'partition'}(scale={scale}) | "
          f"attrs={ms_a:6.2f}  +keys={ms_k:6.2f}  full={ms_f:6.2f} ms  "
          f"[keys-stage={ms_k - ms_a:6.2f}, blend={ms_f - ms_k:6.2f}]",
          flush=True)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also sweep short-tile shapes")
    args = ap.parse_args()
    diag(1_030_000, (32, 32))
    diag(2_080_000, (32, 32), probe_cap=2 ** 23)
    if args.full:
        diag(428_687, (32, 32))
        diag(428_687, (32, 16))
        diag(1_030_000, (32, 8))
