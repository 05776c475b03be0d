"""Train-step stage attribution at bench shapes (ask: train < 35 ms).

Times each component of trainer.make_train_step separately with DCE-proof
in-jit chains (every output leaf consumed), then the full step, so the
gap between the component sum and the whole shows scheduling/fusion wins
or losses. Components:

  fwd_ctx       rasterize_fwd_ctx (attrs under vjp + build_keys +
                8-channel blend fwd + assemble)
  loss_grad     SSIM+L1 value_and_grad w.r.t. pred
  blend_bwd     Pallas backward kernel alone
  bwd_tail      regroup sort + segment reduce + raw-cotangent algebra
  attrs_vjp     per-point chain rule (vjp of compute_raw_attrs)
  opt+ctrl      grad factors, 2x Adam, controller accumulate

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
          stdbuf -oL python scripts/train_diag.py [--scene surround]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera, RasterizerConfig, build_keys, compute_raw_attrs,
    rasterize_fwd_ctx, rasterize_bwd, _blend_bwd_impl, _image_to_tiles,
)
from taichi_3d_gaussian_splatting_tpu.training.config import TrainConfig
from taichi_3d_gaussian_splatting_tpu.training.loss import compute_loss
from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap
from taichi_3d_gaussian_splatting_tpu.ops.expand import MAX_CAND_SCALE

ITERS = 50
Q_ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
T_ID = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)


def bench_injit(stage_fn, *args, perturb=0):
    def probe(out):
        leaves = jax.tree.leaves(out)
        return sum(l.ravel()[0].astype(jnp.float32) for l in leaves
                   if hasattr(l, "ravel") and l.size)

    def nudge(tree, carry):
        done = [False]

        def f(leaf):
            if (not done[0] and hasattr(leaf, "dtype")
                    and jnp.issubdtype(leaf.dtype, jnp.floating)):
                done[0] = True
                return leaf + carry * 0.0
            return leaf
        return jax.tree.map(f, tree)

    @jax.jit
    def run(*a):
        def body(i, carry):
            a2 = list(a)
            a2[perturb] = nudge(a2[perturb], carry)
            return probe(stage_fn(*a2))
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    jax.block_until_ready(run(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="allvis",
                    choices=("allvis", "surround"))
    ap.add_argument("--points", type=int, default=428_687)
    args = ap.parse_args()

    n = args.points
    h, w = 544, 960
    cam = Camera(
        K=jnp.asarray([[580.0, 0, w / 2], [0, 580.0, h / 2], [0, 0, 1]],
                      jnp.float32), width=w, height=h)
    if args.scene == "surround":
        xyz, feats = bench.synthetic_truck_scene_surround(n)
    else:
        xyz, feats = bench.synthetic_truck_scene(n)
    invalid = jnp.zeros((n,), bool)
    print("devices:", jax.devices(), flush=True)

    cfg0 = RasterizerConfig(tile_size=32, key_cap=2 ** 22, interpret=False)
    raw, radius = jax.jit(
        lambda x, f: compute_raw_attrs(x, f, Q_ID, T_ID, cam))(xyz, feats)
    k0, _, _ = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, cfg0))(raw, radius)
    cap = fit_key_cap(int(k0.total))  # trainer headroom 1.3
    scale = int(k0.cand_scale_req)
    direct = 0 < scale <= MAX_CAND_SCALE and int(k0.total) <= cfg0.key_cap
    import dataclasses as _dc
    cfg = _dc.replace(cfg0, key_cap=cap,
                      candidate_mode="direct" if direct else "partition",
                      cand_scale=scale if direct else 1)
    print(f"keys {int(k0.total)} cap {cap} mode {cfg.candidate_mode} "
          f"x{cfg.cand_scale}", flush=True)

    lcfg = TrainConfig().loss_function_config
    gt = jnp.asarray(np.random.default_rng(3).random((h, w, 3)),
                     jnp.float32)

    results = {}

    def rec(name, ms):
        results[name] = ms
        print(f"{name:14s} {ms:8.2f} ms", flush=True)

    # 1. fwd ctx
    def fwd(x, f):
        out, ctx, _ = rasterize_fwd_ctx(x, f, invalid, Q_ID, T_ID, cam, cfg)
        return out.rgb, out.depth, ctx.out_tiles
    rec("fwd_ctx", bench_injit(fwd, xyz, feats))

    out, ctx, attrs_vjp = jax.jit(
        lambda x, f: rasterize_fwd_ctx(x, f, invalid, Q_ID, T_ID, cam, cfg)
    )(xyz, feats)
    pred = jnp.clip(out.rgb, 0.0, 1.0)

    # 2. loss grad
    def lg(p, f):
        def loss_fn(p2, f2):
            loss, l1, ssim_v = compute_loss(p2, gt, lcfg, features=f2,
                                            invalid_mask=invalid)
            return loss, (l1, ssim_v)
        return jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(p, f)
    rec("loss_grad", bench_injit(lg, pred, feats))

    # 3. blend bwd kernel
    tiles_x, tiles_y = w // 32, h // 32
    px = 32 * 32
    num_tiles = tiles_x * tiles_y
    g3 = jnp.ones((num_tiles, px, 3), jnp.float32)
    cfin = ctx.out_tiles[..., 0:3]
    rec("blend_bwd", bench_injit(
        functools.partial(blend_pallas.blend_backward, tile=(32, 32),
                          tiles_x=tiles_x, tiles_y=tiles_y, extra_info=True,
                          chunk=cfg.blend_chunk),
        ctx.table, ctx.keys.tile_start, ctx.keys.tile_end, g3, cfin))

    # 4+5. full bwd impl (blend bwd + regroup + segreduce + raw algebra)
    d_rgb = jnp.ones((h, w, 3), jnp.float32)
    d_rgb_tiles = _image_to_tiles(d_rgb, tiles_x, tiles_y, (32, 32))

    def bwd_impl(drt):
        d_raw, stats = _blend_bwd_impl(ctx.raw, ctx.keys, ctx.table,
                                       ctx.out_tiles, drt, (32, 32),
                                       (tiles_x, tiles_y), cfg)
        return d_raw, stats[0], stats[1]
    rec("blend_bwd+tail", bench_injit(bwd_impl, d_rgb_tiles))

    # 6. attrs vjp
    d_raw, _ = jax.jit(bwd_impl)(d_rgb_tiles)[0:2], None
    d_raw = d_raw[0]

    def avjp(dr):
        return attrs_vjp((dr, jnp.zeros((n, 2), jnp.float32)))
    rec("attrs_vjp", bench_injit(avjp, d_raw))

    # full manual bwd via rasterize_bwd (= blend_bwd+tail + attrs_vjp).
    # ctx rides as an ARGUMENT: closure-captured residuals get inlined as
    # constants into the fori chain and blow the remote-compile request
    # size limit (HTTP 413) at bench shapes.
    def full_bwd(drgb, c):
        grads, stats = rasterize_bwd(c, attrs_vjp, drgb, cam, cfg)
        return grads, stats.magnitude_grad_viewspace
    rec("rasterize_bwd", bench_injit(full_bwd, d_rgb, ctx))

    # 7. full train step (the bench's own measurement, for the same run)
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        make_train_step,
    )
    tms = bench.bench_train_step(xyz, feats, cam, cfg)
    rec("TRAIN_STEP", tms)

    comp = (results["fwd_ctx"] + results["loss_grad"]
            + results["blend_bwd+tail"] + results["attrs_vjp"])
    print(f"component sum (fwd+loss+bwd_tail+avjp) = {comp:.2f} ms "
          f"vs TRAIN_STEP {tms:.2f} (opt/ctrl/overhead = "
          f"{tms - comp:.2f})", flush=True)
    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
