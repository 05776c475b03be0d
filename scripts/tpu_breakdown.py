"""Stage-by-stage timing of the rasterization pipeline on the real TPU.

IMPORTANT measurement note: through the axon tunnel, out-of-jit dispatch
timing (block_until_ready loops) under-reports wildly — only in-jit
`fori_loop` chains with data dependencies measure real device time. Every
stage below is timed that way: the loop output feeds a scalar that the
next iteration consumes, and one value is downloaded at the end.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas, tiling
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera, RasterizerConfig, build_keys, compute_raw_attrs,
    rasterize,
)

Q_ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
T_ID = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
ITERS = 10


def make_scene(n, seed=7, spread=4.0, zmax=20.0):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-spread, spread, n), rng.uniform(-spread, spread, n),
         rng.uniform(2.0, zmax, n)], axis=-1).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-4.5, -2.5, (n, 3))
    feats[:, 7] = rng.uniform(-1.0, 3.0, n)
    feats[:, 8:] = rng.normal(size=(n, 48)) * 0.3
    return jnp.asarray(xyz), jnp.asarray(feats), jnp.zeros((n,), bool)


def bench_injit(stage_fn, perturb_arg, *args, name=""):
    """Time ITERS data-dependent executions of stage_fn inside one jit.

    stage_fn(*args) -> pytree; perturb_arg: index of the float array arg to
    nudge by (prev_result * 0) to chain iterations without changing values.
    """
    def probe(out):
        leaves = [l for l in jax.tree.leaves(out)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        if not leaves:
            leaves = [jax.tree.leaves(out)[0].astype(jnp.float32)]
        return leaves[0].ravel()[0].astype(jnp.float32)

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
    _ = float(out)  # download forces real completion
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:30s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n = 428_000
    w, h = 1024, 544
    cam = Camera(
        K=jnp.asarray([[1000.0, 0, w / 2], [0, 1000.0, h / 2], [0, 0, 1]],
                      jnp.float32), width=w, height=h)
    import os

    cfg = RasterizerConfig(tile_size=32, key_cap=2 ** 21, interpret=False,
                           extra_info=False)
    xyz, feats, invalid = make_scene(n)
    print("devices:", jax.devices(), flush=True)

    # measurement knobs: BD_CAP=fit refits the capacity to the live keys;
    # BD_MODE=direct (+auto-fitted scale) drops the partition sort;
    # BD_CHUNK=256 widens the blend DMA chunks
    import dataclasses as _dc
    if os.environ.get("BD_CAP") == "fit" or os.environ.get("BD_MODE") \
            or os.environ.get("BD_CHUNK"):
        from taichi_3d_gaussian_splatting_tpu.training.trainer import (
            fit_key_cap,
        )
        raw0, rad0 = jax.jit(
            lambda x, f: compute_raw_attrs(x, f, Q_ID, T_ID, cam))(xyz, feats)
        k0, _, _ = jax.jit(
            lambda r, rad: build_keys(r, rad, invalid, cam, cfg))(raw0, rad0)
        if os.environ.get("BD_CAP") == "fit":
            cfg = _dc.replace(cfg, key_cap=fit_key_cap(int(k0.total),
                                                       headroom=1.0))
        if os.environ.get("BD_MODE") == "direct":
            cfg = _dc.replace(cfg, candidate_mode="direct",
                              cand_scale=int(k0.cand_scale_req))
        if os.environ.get("BD_CHUNK"):
            cfg = _dc.replace(cfg, blend_chunk=int(os.environ["BD_CHUNK"]))
        print(f"  knobs: key_cap={cfg.key_cap} mode={cfg.candidate_mode}"
              f"(x{cfg.cand_scale}) chunk={cfg.blend_chunk}", flush=True)

    bench_injit(
        lambda x, f: compute_raw_attrs(x, f, Q_ID, T_ID, cam),
        0, xyz, feats, name="attrs (project+SH)")

    (raw, radius) = jax.jit(
        lambda x, f: compute_raw_attrs(x, f, Q_ID, T_ID, cam))(xyz, feats)
    keys, table, visible = jax.jit(
        lambda r, rad: build_keys(r, rad, invalid, cam, cfg))(raw, radius)
    live = int(jnp.sum(keys.tile_end - keys.tile_start))
    print(f"  total keys: {int(keys.total)} / cap {cfg.key_cap}; "
          f"live after exact tile cull: {live} "
          f"({100.0 * live / max(int(keys.total), 1):.1f}%)", flush=True)

    bench_injit(lambda r, rad: build_keys(r, rad, invalid, cam, cfg)[1],
                1, raw, radius, name="build_keys+table (expand+sort)")

    tiles_x = w // cfg.tile_size
    tiles_y = h // cfg.tile_size

    bench_injit(
        functools.partial(blend_pallas.blend_forward, tile=cfg.tile_size,
                          tiles_x=tiles_x, tiles_y=tiles_y,
                          chunk=cfg.blend_chunk),
        0, table, keys.tile_start, keys.tile_end, name="blend fwd (pallas)")

    out_tiles = jax.jit(functools.partial(
        blend_pallas.blend_forward, tile=cfg.tile_size, tiles_x=tiles_x,
        tiles_y=tiles_y, chunk=cfg.blend_chunk))(
            table, keys.tile_start, keys.tile_end)
    g3 = jnp.ones((tiles_x * tiles_y, cfg.tile_size ** 2, 3), jnp.float32)
    cfin = out_tiles[..., 0:3]

    bench_injit(
        functools.partial(blend_pallas.blend_backward, tile=cfg.tile_size,
                          tiles_x=tiles_x, tiles_y=tiles_y, extra_info=False,
                          chunk=cfg.blend_chunk),
        0, table, keys.tile_start, keys.tile_end, g3, cfin,
        name="blend bwd (pallas)")

    d_table = jax.jit(functools.partial(
        blend_pallas.blend_backward, tile=cfg.tile_size, tiles_x=tiles_x,
        tiles_y=tiles_y, extra_info=False, chunk=cfg.blend_chunk))(
            table, keys.tile_start, keys.tile_end, g3, cfin)[0]

    from taichi_3d_gaussian_splatting_tpu.ops.segment_reduce import (
        segment_reduce,
    )

    def bwd_tail(d_sorted, keys):
        d_orig = tiling.regroup_rows_by_slot(
            d_sorted, keys.orig_slot, cfg.key_cap)
        return segment_reduce(d_orig, keys.offsets, keys.counts)

    bench_injit(bwd_tail, 0, d_table, keys, name="bwd regroup+segreduce")

    bench_injit(
        lambda x, f: rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg).rgb,
        0, xyz, feats, name="FULL forward")

    bench_injit(
        lambda x, f: jax.grad(
            lambda a, b: jnp.sum(
                rasterize(a, b, invalid, Q_ID, T_ID, cam, cfg).rgb),
            argnums=(0, 1))(x, f)[0],
        0, xyz, feats, name="FULL fwd+bwd")


if __name__ == "__main__":
    main()
