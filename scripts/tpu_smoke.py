"""Real-TPU smoke test: compile the Pallas kernels and compare against the
oracle on a small scene, then time a Truck-sized forward+backward.

Run directly on the TPU host (JAX_PLATFORMS=axon): python scripts/tpu_smoke.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops.blend_reference import render_reference
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera, RasterizerConfig, rasterize, rasterize_bwd, rasterize_fwd_ctx,
)


def make_scene(n, seed=7, spread=1.5, zmax=8.0):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-spread, spread, n), rng.uniform(-spread, spread, n),
         rng.uniform(2.0, zmax, n)], axis=-1
    ).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-4.5, -2.5, (n, 3))
    feats[:, 7] = rng.uniform(-1.0, 3.0, n)
    feats[:, 8:] = rng.normal(size=(n, 48)) * 0.3
    return jnp.asarray(xyz), jnp.asarray(feats), jnp.zeros((n,), bool)


Q_ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
T_ID = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)


def main():
    print("devices:", jax.devices(), flush=True)

    # --- correctness on small scene (compiled, not interpret) ---
    cfg = RasterizerConfig(tile_size=32, key_cap=4096, interpret=False)
    cam = Camera(
        K=jnp.asarray([[60.0, 0, 32], [0, 60.0, 32], [0, 0, 1]], jnp.float32),
        width=64, height=64,
    )
    xyz, feats, invalid = make_scene(200)
    t0 = time.time()
    out = jax.jit(
        lambda x, f: rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg)
    )(xyz, feats)
    rgb = np.asarray(out.rgb)
    print(f"fwd compile+run {time.time()-t0:.1f}s", flush=True)
    rgb_ref, depth_ref, alpha_ref, count_ref = map(
        np.asarray, render_reference(xyz, feats, invalid, Q_ID, T_ID, cam, cfg)
    )
    print("fwd max|diff| rgb:", np.abs(rgb - rgb_ref).max(),
          "alpha:", np.abs(np.asarray(out.alpha) - alpha_ref).max(),
          "count mismatches:", (np.asarray(out.count) != count_ref).sum(),
          flush=True)

    gproj = jnp.asarray(
        np.random.default_rng(0).normal(size=(64, 64, 3)).astype(np.float32))

    def loss_prod(x, f):
        o = rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg)
        return jnp.sum(o.rgb * gproj)

    t0 = time.time()
    gx, gf = jax.jit(jax.grad(loss_prod, argnums=(0, 1)))(xyz, feats)
    gx = np.asarray(gx)
    print(f"bwd compile+run {time.time()-t0:.1f}s", flush=True)

    def loss_ref(x, f):
        rgb, *_ = render_reference(x, f, invalid, Q_ID, T_ID, cam, cfg)
        return jnp.sum(rgb * gproj)

    gx_r, gf_r = map(np.asarray, jax.grad(loss_ref, argnums=(0, 1))(xyz, feats))
    print("grad max|diff| xyz:", np.abs(gx - gx_r).max(),
          "feat:", np.abs(np.asarray(gf) - gf_r).max(), flush=True)

    # --- Truck-scale timing ---
    n = 428_000
    w, h = 1024, 544   # ~ the 980x546 val views, tile-aligned
    cam_big = Camera(
        K=jnp.asarray([[1000.0, 0, w / 2], [0, 1000.0, h / 2], [0, 0, 1]],
                      jnp.float32),
        width=w, height=h,
    )
    cfg_big = RasterizerConfig(tile_size=32, key_cap=2 ** 21, interpret=False)
    xyz, feats, invalid = make_scene(n, spread=4.0, zmax=20.0)

    fwd = jax.jit(lambda x, f: rasterize(x, f, invalid, Q_ID, T_ID,
                                         cam_big, cfg_big).rgb)
    t0 = time.time()
    r = fwd(xyz, feats)
    jax.block_until_ready(r)
    print(f"big fwd compile+first {time.time()-t0:.1f}s", flush=True)
    # timed: loop inside jit to amortize dispatch
    iters = 10
    timed = jax.jit(
        lambda x, f: jax.lax.fori_loop(
            0, iters,
            lambda i, acc: acc + fwd(x + acc * 0.0, f)[0, 0, 0] * 1e-9,
            jnp.float32(0),
        )
    )
    float(timed(xyz, feats))
    t0 = time.time()
    float(timed(xyz, feats))
    dt = (time.time() - t0) / iters * 1e3
    print(f"big fwd: {dt:.2f} ms/frame ({w*h/1e6/dt*1e3:.1f} Mpix/s)", flush=True)

    gfun = jax.jit(jax.grad(
        lambda x, f: jnp.sum(rasterize(x, f, invalid, Q_ID, T_ID, cam_big,
                                       cfg_big).rgb)))
    t0 = time.time()
    gg = gfun(xyz, feats)
    jax.block_until_ready(gg)
    print(f"big fwd+bwd compile+first {time.time()-t0:.1f}s", flush=True)
    timed_g = jax.jit(
        lambda x, f: jax.lax.fori_loop(
            0, iters,
            lambda i, acc: acc + gfun(x + acc * 0.0, f)[0, 0] * 1e-9,
            jnp.float32(0),
        )
    )
    float(timed_g(xyz, feats))
    t0 = time.time()
    float(timed_g(xyz, feats))
    dt = (time.time() - t0) / iters * 1e3
    print(f"big fwd+bwd: {dt:.2f} ms/step ({w*h/1e6/dt*1e3:.1f} Mpix/s)",
          flush=True)


if __name__ == "__main__":
    main()
