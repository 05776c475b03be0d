"""Roofline attribution: measured stage time vs hardware-limit time.

For each pipeline stage at bench shapes this prints: measured ms, the
bytes it must move through HBM, the equivalent achieved bandwidth, the
bandwidth-limit time, and (for the blend kernels) the MXU-utilization of
the modeled matmul FLOPs — i.e. how far each stage sits from
speed-of-light on this chip (BASELINE.json "per-chip speed-of-light").

Hardware model (TPU v5e, public specs): HBM ~819 GB/s, bf16 MXU ~197
TFLOP/s, f32 VPU ~ 9.8 TFLOP/s class. The bytes models below count
MANDATORY HBM traffic only (inputs read once, outputs written once;
sort passes modeled explicitly) — a stage at 100% of the model is at the
memory-bandwidth speed-of-light for this algorithm choice.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

HBM_GBS = 819.0       # v5e HBM bandwidth
MXU_TFLOPS = 197.0    # v5e bf16 peak
ITERS = 100

Q_ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
T_ID = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)


def bench_injit(stage_fn, perturb_arg, *args):
    """In-jit fori_loop chain timing (see scripts/tpu_breakdown.py)."""
    def probe(out):
        # consume EVERY leaf: probing only one output lets XLA dead-code
        # eliminate the rest of the stage (caught via a 0.2 ms "full
        # attrs" at 2M points)
        leaves = jax.tree.leaves(out)
        return sum(l.ravel()[0].astype(jnp.float32) for l in leaves)

    def nudge(tree, carry):
        done = [False]

        def f(leaf):
            if not done[0] and jnp.issubdtype(leaf.dtype, jnp.floating):
                done[0] = True
                return leaf + carry * 0.0
            return leaf
        return jax.tree.map(f, tree)

    @jax.jit
    def run(*a):
        def body(i, carry):
            a2 = list(a)
            a2[perturb_arg] = nudge(a2[perturb_arg], carry)
            return probe(stage_fn(*a2))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    _ = float(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


def row(name, ms, bytes_moved, mxu_flops=None):
    gbs = bytes_moved / 1e9 / (ms / 1e3)
    limit_ms = bytes_moved / 1e9 / HBM_GBS * 1e3
    pct = 100.0 * limit_ms / ms
    mxu = ""
    if mxu_flops:
        mxu_pct = 100.0 * (mxu_flops / (ms / 1e3)) / (MXU_TFLOPS * 1e12)
        mxu = f"{mxu_pct:6.1f}%"
    print(f"{name:28s} {ms:8.2f}  {bytes_moved / 1e6:9.1f}  {gbs:8.1f} "
          f"{limit_ms:9.2f}  {pct:6.1f}% {mxu}", flush=True)
    return {"stage": name, "ms": ms, "mb": bytes_moved / 1e6,
            "achieved_gbs": gbs, "hbm_limit_ms": limit_ms,
            "pct_of_light": pct}


def main():
    import argparse
    from bench import (  # same scenes as the driver bench
        synthetic_truck_scene, synthetic_truck_scene_surround,
    )
    from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas, tiling
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        Camera, RasterizerConfig, build_keys, compute_raw_attrs, rasterize,
    )
    from taichi_3d_gaussian_splatting_tpu.ops.segment_reduce import (
        segment_reduce,
    )
    from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap

    global ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=428_687)
    ap.add_argument("--scene", choices=("surround", "allvis"),
                    default="allvis",
                    help="allvis = the round-2 attribution protocol")
    ap.add_argument("--blend_strips", type=int, default=1)
    ap.add_argument("--iters", type=int, default=ITERS)
    args = ap.parse_args()
    ITERS = args.iters

    n = args.points
    h, w = 544, 960
    cam = Camera(
        K=jnp.asarray([[580.0, 0, w / 2], [0, 580.0, h / 2], [0, 0, 1]],
                      jnp.float32), width=w, height=h)
    if args.scene == "surround":
        xyz, feats = synthetic_truck_scene_surround(n)
    else:
        xyz, feats = synthetic_truck_scene(n)
    invalid = jnp.zeros((n,), bool)
    print("devices:", jax.devices(), flush=True)

    cfg0 = RasterizerConfig(tile_size=32, key_cap=2 ** 22, interpret=False,
                            extra_info=False)
    raw, radius = jax.jit(
        lambda x, f: compute_raw_attrs(x, f, Q_ID, T_ID, cam))(xyz, feats)
    k0, _, _ = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, cfg0))(raw, radius)
    cap = fit_key_cap(int(k0.total), headroom=1.0)
    scale = int(k0.cand_scale_req)
    from taichi_3d_gaussian_splatting_tpu.ops.expand import MAX_CAND_SCALE
    direct = 0 < scale <= MAX_CAND_SCALE and int(k0.total) <= cfg0.key_cap
    import dataclasses as _dc
    cfg = _dc.replace(cfg0, key_cap=cap,
                      candidate_mode="direct" if direct else "partition",
                      cand_scale=scale if direct else 1)

    keys, table, visible = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, cfg))(raw, radius)
    total = int(keys.total)
    live = int(jnp.sum(keys.tile_end - keys.tile_start))
    tiles_x, tiles_y = w // 32, h // 32
    num_tiles = tiles_x * tiles_y
    px = 32 * 32
    pairs = live * px
    print(f"keys {total} (cap {cap}), live {live}, "
          f"mode {cfg.candidate_mode}(x{cfg.cand_scale}), "
          f"pixel-pairs {pairs / 1e6:.0f}M", flush=True)
    print(f"{'stage':28s} {'ms':>8}  {'MB':>9}  {'GB/s':>8} "
          f"{'limit_ms':>9}  {'%light':>6} {'MXU':>7}", flush=True)

    rows = []
    # attrs: read xyz(12B)+feats(224B), write uv/cov/conic/op/color/depth/
    # radius ~ (2+3+4+1+3+1+2)*4 = 64B per point
    ms = bench_injit(lambda x, f: compute_raw_attrs(x, f, Q_ID, T_ID, cam),
                     0, xyz, feats)
    rows.append(row("attrs (project+SH)", ms, n * (12 + 224 + 64)))

    # build_keys: attrs in (n*40B for the 10 cols + uv/depth/radius), the
    # expand kernel writes key+10 cols+slot (12*4B per cap lane), the sort
    # moves 12 operands x cap lanes through ~log2(cap) merge passes
    # (read+write each pass), histogram reads cap ids once
    # consume the WHOLE tuple (keys pytree + table + visible): probing
    # only the table lets XLA prune unused sort outputs AND the whole
    # tile-range histogram/cumsum stage (variadic-sort outputs are
    # individually dead-code-eliminable)
    ms = bench_injit(lambda r, rad: build_keys(r, rad, invalid, cam, cfg),
                     1, raw, radius)
    passes = int(np.ceil(np.log2(max(cap, 2))))
    sort_bytes = 2 * passes * 12 * 4 * cap
    expand_bytes = n * 40 + 12 * 4 * cap
    rows.append(row("build_keys (expand+sort)", ms,
                    expand_bytes + sort_bytes + 4 * cap))

    # blend fwd: table rows stream once per owning tile (live*12*4B),
    # tiles written once (num_tiles*px*8ch*4B). MXU: log-transmittance
    # triangular matmuls, 2*px*chunk flops per (pair in chunk) => 2*chunk
    # flops per pair, plus the one-hot conic evaluation ~ VPU.
    ms = bench_injit(
        functools.partial(blend_pallas.blend_forward, tile=32,
                          tiles_x=tiles_x, tiles_y=tiles_y,
                          chunk=cfg.blend_chunk,
                          strips=args.blend_strips),
        0, table, keys.tile_start, keys.tile_end)
    blend_bytes = live * 12 * 4 + num_tiles * px * 8 * 4
    mxu_flops = 2.0 * pairs * cfg.blend_chunk
    rows.append(row("blend fwd", ms, blend_bytes, mxu_flops))

    out_tiles = jax.jit(functools.partial(
        blend_pallas.blend_forward, tile=32, tiles_x=tiles_x,
        tiles_y=tiles_y, chunk=cfg.blend_chunk,
        strips=args.blend_strips))(
            table, keys.tile_start, keys.tile_end)
    g3 = jnp.ones((num_tiles, px, 3), jnp.float32)
    cfin = out_tiles[..., 0:3]
    ms = bench_injit(
        functools.partial(blend_pallas.blend_backward, tile=32,
                          tiles_x=tiles_x, tiles_y=tiles_y, extra_info=False,
                          chunk=cfg.blend_chunk,
                          strips=args.blend_strips),
        0, table, keys.tile_start, keys.tile_end, g3, cfin)
    # bwd reads table + g4 + cfin, writes 12 grad rows per cap lane
    bwd_bytes = live * 12 * 4 + 2 * num_tiles * px * 4 * 4 + cap * 12 * 4
    rows.append(row("blend bwd", ms, bwd_bytes, 2 * mxu_flops))

    d_table = jax.jit(functools.partial(
        blend_pallas.blend_backward, tile=32, tiles_x=tiles_x,
        tiles_y=tiles_y, extra_info=False, chunk=cfg.blend_chunk,
        strips=args.blend_strips))(
            table, keys.tile_start, keys.tile_end, g3, cfin)[0]

    def bwd_tail(d_sorted, keys):
        # mirror rasterizer._blend_bwd_impl EXACTLY: only the 11
        # meaningful rows ride the regroup sort (11 + the slot key = 12
        # operands, at the variadic-sort budget; regrouping the full
        # 16-row table would be a 17-operand sort, 3x past the cliff —
        # an earlier version of this script measured that by mistake)
        d_rows = jnp.concatenate([d_sorted[0:9], d_sorted[10:12]], axis=0)
        d_orig = tiling.regroup_rows_by_slot(d_rows, keys.orig_slot,
                                             cfg.key_cap)
        return segment_reduce(d_orig, keys.offsets, keys.counts)

    ms = bench_injit(bwd_tail, 0, d_table, keys)
    # regroup sort: 12 operands x cap lanes x log2(cap) passes; segment
    # reduce: reads 11 rows x cap, writes n x 11
    rows.append(row("bwd regroup+segreduce", ms,
                    2 * passes * 12 * 4 * cap + 11 * 4 * cap + n * 11 * 4))

    ms = bench_injit(
        lambda x, f: rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg).rgb,
        0, xyz, feats)
    full_bytes = (n * (12 + 224 + 64) + expand_bytes + sort_bytes
                  + blend_bytes + num_tiles * px * 3 * 4)
    rows.append(row("FULL forward", ms, full_bytes))

    import json
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
