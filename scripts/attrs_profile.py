"""Sub-stage profile of compute_point_attributes (the per-point stage).

At official-checkpoint point counts (1-2M) the per-point stage becomes a
top-3 cost; this isolates its pieces to show which sub-computation is off
the bandwidth roofline.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/attrs_profile.py [n_points]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 200


def bench(fn, *args, name=""):
    @jax.jit
    def run(*a):
        def body(i, carry):
            a2 = list(a)
            a2[0] = a2[0] + carry * 0.0
            out = fn(*a2)
            # consume EVERY leaf or XLA dead-code-eliminates the rest
            leaves = jax.tree.leaves(out)
            return sum(l.ravel()[0].astype(jnp.float32) for l in leaves)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

    out = run(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    _ = float(run(*args))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    from bench import synthetic_truck_scene
    from taichi_3d_gaussian_splatting_tpu.ops import projection as proj
    from taichi_3d_gaussian_splatting_tpu.ops.attributes import (
        compute_point_attributes,
    )
    from taichi_3d_gaussian_splatting_tpu.ops.sh import sh_basis
    from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
        quaternion_to_rotation_matrix,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 428_687
    xyz, feats = synthetic_truck_scene(n)
    K = jnp.asarray([[580.0, 0, 480.0], [0, 580.0, 272.0], [0, 0, 1.0]],
                    jnp.float32)
    q_cam = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    t_cam = jnp.zeros((3,), jnp.float32)
    center = jnp.zeros((3,), jnp.float32)
    R_cw = quaternion_to_rotation_matrix(q_cam)
    print(f"n = {n}", flush=True)

    bench(lambda x, f: compute_point_attributes(x, f, q_cam, t_cam, K,
                                                center),
          xyz, feats, name="FULL attrs")

    bench(lambda x: proj.project_point(x, R_cw, t_cam, K), xyz,
          name="project_point")

    quat = feats[:, 0:4]
    quat = quat / jnp.maximum(
        jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    log_scale = feats[:, 4:7]
    _, xyz_cam = jax.jit(
        lambda x: proj.project_point(x, R_cw, t_cam, K))(xyz)

    bench(lambda qn, ls, xc: proj.project_cov2d_components(
        qn, ls, R_cw, K, xc), quat, log_scale, xyz_cam,
        name="project_cov2d_components")

    a, b, c = jax.jit(lambda qn, ls, xc: proj.project_cov2d_components(
        qn, ls, R_cw, K, xc))(quat, log_scale, xyz_cam)
    bench(lambda aa, bb, cc: proj.conic_rescale_radius_components(
        aa, bb, cc), a, b, c, name="conic_rescale_radius")

    bench(lambda x: sh_basis(x - center), xyz, name="sh_basis")

    sh = feats[:, 8:56].reshape(-1, 3, 16)
    basis = jax.jit(lambda x: sh_basis(x - center))(xyz)
    bench(lambda s, bs: jnp.sum(s * bs[:, None, :], axis=-1), sh, basis,
          name="sh contract")

    # raw slicing cost: stream the feature matrix once
    bench(lambda f: (f[:, 0:4].sum() + f[:, 4:7].sum() + f[:, 7].sum()
                     + f[:, 8:].sum()), feats, name="feature stream (sum)")


if __name__ == "__main__":
    main()
