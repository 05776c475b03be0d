"""Capture a jax.profiler trace of the rasterizer and attribute device time.

The reference ships an `nsys profile` recipe (benchmark/profiling.sh); the
TPU equivalent is a jax.profiler trace plus this summarizer, which
aggregates per-op device time by source line — the only reliable
attribution on this hardware (isolated stage benches mislead: XLA hoists
loop-invariant subgraphs and dead-code-eliminates unused outputs).

Usage:
  python benchmark/profile_attribution.py [--points 428000] [--out /tmp/trace]
  python benchmark/profile_attribution.py --analyze-only /tmp/trace
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json


def analyze(trace_dir: str, runs: int) -> None:
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    by_src = collections.Counter()
    total = 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        args = e.get("args", {})
        if "device_duration_ps" not in args or e["name"].startswith("jit_"):
            continue
        dur = int(args["device_duration_ps"]) / 1e9
        by_src[args.get("source", e["name"].split(".")[0])] += dur
        total += dur
    print(f"\ndevice total: {total / runs:.2f} ms/run")
    print("by source (ms/run):")
    for src, dur in by_src.most_common(25):
        print(f"  {dur / runs:7.2f}  {src}")


def capture(trace_dir: str, n_points: int, runs: int,
            grad: bool = False, rgb_only: bool = False,
            fit_cap: bool = False) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        Camera, RasterizerConfig, rasterize,
    )

    w, h = 1024, 544
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(np.stack(
        [rng.uniform(-4, 4, n_points), rng.uniform(-4, 4, n_points),
         rng.uniform(2, 20, n_points)], -1).astype(np.float32))
    feats = np.zeros((n_points, 56), np.float32)
    q = rng.normal(size=(n_points, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-4.5, -2.5, (n_points, 3))
    feats[:, 7] = rng.uniform(-1, 3, n_points)
    feats[:, 8:] = rng.normal(size=(n_points, 48)) * 0.3
    feats = jnp.asarray(feats)
    invalid = jnp.zeros(n_points, bool)
    Q = jnp.asarray([0.0, 0, 0, 1], jnp.float32)
    T = jnp.zeros(3)
    cam = Camera(
        K=jnp.asarray([[1000.0, 0, w / 2], [0, 1000.0, h / 2], [0, 0, 1]],
                      jnp.float32), width=w, height=h)
    interpret = jax.devices()[0].platform == "cpu"
    cap = 2**21
    if fit_cap:
        # mirror bench.py: probe the live key count, fit the static capacity
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            build_keys, compute_raw_attrs,
        )
        from taichi_3d_gaussian_splatting_tpu.training.trainer import (
            fit_key_cap,
        )
        probe_cfg = RasterizerConfig(tile_size=32, key_cap=cap,
                                     interpret=interpret, extra_info=False)
        raw, radius = jax.jit(lambda x, f: compute_raw_attrs(
            x, f, Q, T, cam))(xyz, feats)
        keys, _, _ = jax.jit(lambda r, rad: build_keys(
            r, rad, invalid, cam, probe_cfg))(raw, radius)
        cap = fit_key_cap(int(keys.total), headroom=1.1)
        print(f"fitted key_cap={cap} (total={int(keys.total)})")
    cfg = RasterizerConfig(tile_size=32, key_cap=cap, interpret=interpret,
                           extra_info=False, rgb_only=rgb_only)
    if grad:
        f = jax.jit(lambda x, fe: jax.grad(
            lambda a, b: jnp.sum(rasterize(a, b, invalid, Q, T, cam, cfg).rgb),
            argnums=(0, 1))(x, fe)[0])
    else:
        f = jax.jit(
            lambda x, fe: rasterize(x, fe, invalid, Q, T, cam, cfg).rgb)
    o = f(xyz, feats)
    jax.block_until_ready(o)
    with jax.profiler.trace(trace_dir):
        for _ in range(runs):
            o = f(xyz, feats)
        jax.block_until_ready(o)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=428_000)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--out", type=str, default="/tmp/gs_trace")
    parser.add_argument("--analyze-only", type=str, default=None)
    parser.add_argument("--grad", action="store_true",
                        help="profile the fwd+bwd step instead of forward")
    parser.add_argument("--rgb-only", action="store_true",
                        help="inference path (bench.py protocol)")
    parser.add_argument("--fit-cap", action="store_true",
                        help="fit key_cap to the live key count (bench.py)")
    args = parser.parse_args()
    if args.analyze_only:
        analyze(args.analyze_only, args.runs)
        return
    capture(args.out, args.points, args.runs, grad=args.grad,
            rgb_only=args.rgb_only, fit_cap=args.fit_cap)
    analyze(args.out, args.runs)


if __name__ == "__main__":
    main()
