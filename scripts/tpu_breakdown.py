"""Stage-by-stage timing of the rasterization pipeline on the real TPU.

Separates: attribute projection (jnp), tile-key build (sort-based), table
build (gather+finalize), Pallas blend forward, blend backward, segment
reduce — so optimization effort goes where the time is.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas, tiling
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera, RasterizerConfig, RawAttrs, _build_table, build_keys,
    compute_raw_attrs, rasterize, rasterize_bwd, rasterize_fwd_ctx,
)

Q_ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
T_ID = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)


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


def bench(fn, *args, iters=20, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:8.2f} ms")
    return out, dt


def main():
    n = 428_000
    w, h = 1024, 544
    cam = Camera(
        K=jnp.asarray([[1000.0, 0, w / 2], [0, 1000.0, h / 2], [0, 0, 1]],
                      jnp.float32), width=w, height=h)
    cfg = RasterizerConfig(tile_size=32, key_cap=2 ** 21, interpret=False,
                           extra_info=False)
    xyz, feats, invalid = make_scene(n)
    print("devices:", jax.devices())

    attrs_fn = jax.jit(lambda x, f: compute_raw_attrs(x, f, Q_ID, T_ID, cam))
    (raw, radius), _ = bench(attrs_fn, xyz, feats, name="attrs (project+SH)")

    keys_fn = jax.jit(lambda r, rad: build_keys(r, rad, invalid, cam, cfg))
    (keys, visible), _ = bench(keys_fn, raw, radius, name="build_keys (sort)")
    print(f"  total keys: {int(keys.total)} / cap {cfg.key_cap}")

    tiles_x = w // cfg.tile_size
    table_fn = jax.jit(lambda r, k: _build_table(r, k, tiles_x, cfg.tile_size))
    table, _ = bench(table_fn, raw, keys, name="build table (gather)")

    tiles_y = h // cfg.tile_size
    fwd_fn = jax.jit(lambda t, s, e: blend_pallas.blend_forward(
        t, s, e, tile=cfg.tile_size, tiles_x=tiles_x, tiles_y=tiles_y))
    out_tiles, _ = bench(fwd_fn, table, keys.tile_start, keys.tile_end,
                         name="blend fwd (pallas)")

    g4 = jnp.ones((tiles_x * tiles_y, cfg.tile_size ** 2, 4), jnp.float32)
    bwd_fn = jax.jit(lambda t, s, e, g, c: blend_pallas.blend_backward(
        t, s, e, g, c, tile=cfg.tile_size, tiles_x=tiles_x, tiles_y=tiles_y,
        extra_info=False))
    cfin = jnp.concatenate(
        [out_tiles[..., 0:3], jnp.zeros_like(out_tiles[..., 0:1])], axis=-1)
    (d_table, _), _ = bench(bwd_fn, table, keys.tile_start, keys.tile_end,
                            g4, cfin, name="blend bwd (pallas)")

    from taichi_3d_gaussian_splatting_tpu.ops.segment_reduce import (
        segment_reduce,
    )
    inv_fn = jax.jit(lambda k: tiling.inverse_permutation(k.orig_slot))
    inv, _ = bench(inv_fn, keys, name="inverse permutation")

    def gather_and_reduce(d_sorted, inv, keys):
        d_orig = d_sorted[:, inv[: cfg.key_cap]]
        slot = jnp.arange(cfg.key_cap, dtype=jnp.int32)
        d_orig = jnp.where((slot < keys.total)[None, :], d_orig, 0.0)
        d_orig = jnp.pad(d_orig, ((0, 0), (0, 128)))
        return segment_reduce(d_orig, keys.offsets, keys.counts)

    red_fn = jax.jit(gather_and_reduce)
    bench(red_fn, d_table, inv, keys, name="bwd gather+segreduce")

    full_fwd = jax.jit(lambda x, f: rasterize(
        x, f, invalid, Q_ID, T_ID, cam, cfg).rgb)
    bench(full_fwd, xyz, feats, name="FULL forward")

    gfun = jax.jit(jax.grad(lambda x, f: jnp.sum(rasterize(
        x, f, invalid, Q_ID, T_ID, cam, cfg).rgb), argnums=(0, 1)))
    bench(gfun, xyz, feats, name="FULL fwd+bwd")


if __name__ == "__main__":
    main()
