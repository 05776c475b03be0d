"""Benchmark harness: rasterizer forward on a Truck-scale synthetic scene.

Protocol mirrors the reference benchmark/inference_benchmark.py (warm-up
then timed frames); scene size matches the published Truck 30k checkpoint
(~4.3e5 points) and the ~980x545 val views, cropped to the 32-px TPU tile
(960x544). Timing runs as an in-jit fori_loop chain (out-of-jit dispatch
timing under-reports through the remote-TPU tunnel).

Reference baseline (benchmark/README.md:13-17): 20.07 ms/frame forward on
an RTX 3090 at 4.6e5 points -> 26.0 Mpix/s. vs_baseline below is the ratio
of our forward Mpix/s to that number (>1 = faster than the reference on its
own headline benchmark).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


N_POINTS = 428_687          # Truck 30k checkpoint size (README.md:70)
HEIGHT, WIDTH = 544, 960    # ~980x546 val views cropped to 32-px tiles
TIMED = 20

REF_MS = 20.07              # RTX 3090 forward ms/frame (benchmark/README.md)
REF_MPIX_S = (980 * 546 / 1e6) / (REF_MS / 1e3)


def synthetic_truck_scene(n: int, seed: int = 0):
    """Synthetic stand-in with Truck-like screen statistics: points spread
    over a street-scale shell around the camera, log-scales sized so splats
    cover a handful of pixels at depth."""
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-8.0, 8.0, n), rng.uniform(-4.0, 4.0, n),
         rng.uniform(1.0, 30.0, n)], axis=-1
    ).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-4.5, -2.0, (n, 3))
    feats[:, 7] = rng.uniform(-2.0, 3.0, n)
    feats[:, 8:] = (rng.normal(size=(n, 48)) * 0.3).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(feats)


def main():
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        Camera, RasterizerConfig, rasterize,
    )
    from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap

    platform = jax.devices()[0].platform
    interpret = platform == "cpu"
    xyz, feats = synthetic_truck_scene(N_POINTS)
    invalid = jnp.zeros((N_POINTS,), bool)
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    K = jnp.asarray(
        [[580.0, 0.0, WIDTH / 2], [0.0, 580.0, HEIGHT / 2], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    camera = Camera(K=K, width=WIDTH, height=HEIGHT)

    def render(cfg, x, f):
        return rasterize(x, f, invalid, q, t, camera, cfg).rgb

    # size the static key capacity to the live key count (what the trainer
    # does continuously via fit_key_cap)
    probe_cfg = RasterizerConfig(tile_size=32, key_cap=2**21,
                                 interpret=interpret, extra_info=False)
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        build_keys, compute_raw_attrs,
    )

    raw, radius = jax.jit(
        lambda x, f: compute_raw_attrs(x, f, q, t, camera))(xyz, feats)
    keys, _, _ = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, camera, probe_cfg)
    )(raw, radius)
    # static scene + fixed pose: the key total is exactly repeatable, so
    # fit with no headroom beyond the bucket roundup — the analogue of the
    # reference's exact per-frame M-sized buffer allocation (training uses
    # 1.3 to ride out camera motion between re-bucketing checks)
    cap = fit_key_cap(int(keys.total), headroom=1.0)
    # direct candidate mode when the fitted window scale is modest: skips
    # the N-length partition sort entirely (exact at the fitted scale;
    # static scene + fixed pose, so no jitter headroom needed). The req is
    # only measured for windows existing at the probe's key_cap, and
    # partition mode must keep cand_scale=1 (window/VMEM sizing).
    from taichi_3d_gaussian_splatting_tpu.ops.expand import MAX_CAND_SCALE
    scale = int(keys.cand_scale_req)
    direct = (0 < scale <= MAX_CAND_SCALE
              and int(keys.total) <= probe_cfg.key_cap)
    # rgb_only matches the reference benchmark protocol
    # (benchmark/inference_benchmark.py uses the rgb-only rasterizer)
    cfg = RasterizerConfig(tile_size=32, key_cap=cap, interpret=interpret,
                           extra_info=False, rgb_only=True,
                           candidate_mode="direct" if direct else "partition",
                           cand_scale=scale if direct else 1)

    @jax.jit
    def timed_chain(x, f):
        def body(i, carry):
            out = render(cfg, x + carry * 0.0, f)
            return out[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, TIMED, body, jnp.float32(0))

    out = timed_chain(xyz, feats)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    _ = float(timed_chain(xyz, feats))
    ms = (time.perf_counter() - t0) / TIMED * 1e3

    mpix_s = (HEIGHT * WIDTH / 1e6) / (ms / 1e3)
    print(json.dumps({
        "metric": f"truck428k_render_fwd_mpix_per_s_{platform}",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REF_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
