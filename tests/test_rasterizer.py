"""Pipeline integration tests: Pallas path vs the dense jnp oracle.

Ports the reference test strategy (tests/GaussianPointCloudRasterisation_test.py):
tile-range unit checks, forward allclose, gradient checks against an
independent implementation (here: jax.grad of the dense oracle renderer).
Pallas kernels run in interpreter mode on CPU.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops import tiling
from taichi_3d_gaussian_splatting_tpu.ops.blend_reference import render_reference
from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
    Camera,
    RasterizerConfig,
    rasterize,
    rasterize_bwd,
    rasterize_fwd_ctx,
)

RNG = np.random.default_rng(7)


def make_scene(n=200, seed=7):
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-1.5, 1.5, n), rng.uniform(-1.5, 1.5, n),
         rng.uniform(2.0, 8.0, n)], axis=-1
    ).astype(np.float32)
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    feats[:, 4:7] = rng.uniform(-3.5, -1.5, (n, 3))  # log scales
    feats[:, 7] = rng.uniform(-1.0, 3.0, n)          # opacity logit
    feats[:, 8:] = rng.normal(size=(n, 48)) * 0.3
    invalid = np.zeros((n,), bool)
    invalid[: n // 20] = True  # a few invalid slots like the pool padding
    return jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(invalid)


def make_camera(w=64, h=64):
    K = jnp.asarray(
        [[60.0, 0.0, w / 2], [0.0, 60.0, h / 2], [0.0, 0.0, 1.0]], jnp.float32
    )
    return Camera(K=K, width=w, height=h)


# identity camera pose: camera at origin looking down +z
Q_ID = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
T_ID = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)

CFG = RasterizerConfig(tile_size=32, key_cap=4096, interpret=True)


class TestTiling:
    def test_bbox_and_counts_vs_bruteforce(self):
        n = 100
        uv = jnp.asarray(RNG.uniform(-30, 90, (n, 2)).astype(np.float32))
        radius = jnp.asarray(RNG.uniform(0.0, 40.0, n).astype(np.float32))
        w = h = 64
        tile = 32
        bbox = tiling.tile_bbox(uv, radius, w, h, tile)
        for i in range(n):
            r = max(float(radius[i]), 1.0)
            min_u = max(0.0, float(uv[i, 0]) - r)
            max_u = float(uv[i, 0]) + r
            min_v = max(0.0, float(uv[i, 1]) - r)
            max_v = float(uv[i, 1]) + r
            mtu = min(int(min_u // tile), w // tile)
            xtu = min(max(int(max_u // tile) + 1, mtu + 1), w // tile)
            mtv = min(int(min_v // tile), h // tile)
            xtv = min(max(int(max_v // tile) + 1, mtv + 1), h // tile)
            # splats whose extent misses the image get an EMPTY box
            # (output-lossless; the reference would clamp to one edge tile)
            if max_u <= 0 or min_u >= w or max_v <= 0 or min_v >= h:
                xtu, xtv = mtu, mtv
            assert bbox.min_u[i] == mtu and bbox.max_u[i] == xtu
            assert bbox.min_v[i] == mtv and bbox.max_v[i] == xtv

    def test_keys_cover_exactly_the_bbox_tiles(self):
        n = 50
        uv = jnp.asarray(RNG.uniform(0, 64, (n, 2)).astype(np.float32))
        radius = jnp.asarray(RNG.uniform(1.0, 30.0, n).astype(np.float32))
        depth = jnp.asarray(RNG.uniform(1.0, 10.0, n).astype(np.float32))
        visible = jnp.asarray(RNG.random(n) > 0.2)
        w = h = 64
        tile = 32
        keys = tiling.build_tile_keys(
            uv, depth, radius, visible, w, h, tile, key_cap=1024,
            interpret=True,
        )
        # brute-force expected (tile -> set of point ids)
        bbox = tiling.tile_bbox(uv, radius, w, h, tile)
        tiles_u = w // tile
        expected = {t: set() for t in range(tiles_u * (h // tile))}
        for i in range(n):
            if not bool(visible[i]):
                continue
            for tu in range(int(bbox.min_u[i]), int(bbox.max_u[i])):
                for tv in range(int(bbox.min_v[i]), int(bbox.max_v[i])):
                    expected[tu + tv * tiles_u].add(i)
        for t in expected:
            s, e = int(keys.tile_start[t]), int(keys.tile_end[t])
            got = set(np.asarray(keys.point_idx[s:e]).tolist())
            assert got == expected[t], f"tile {t}"
            # depth-sorted within tile
            d = np.asarray(depth)[np.asarray(keys.point_idx[s:e])]
            dq = (d * 1024).astype(np.int32)
            assert np.all(np.diff(dq) >= 0)

    def test_odd_multiple_key_cap(self):
        """fit_key_cap's eighth-octave buckets below 2^15 can be odd
        multiples of 512 (e.g. 6144) that WKEYS does not divide; the
        expand window must fall back to a power-of-two divisor."""
        n = 50
        uv = jnp.asarray(RNG.uniform(0, 64, (n, 2)).astype(np.float32))
        radius = jnp.asarray(RNG.uniform(1.0, 20.0, n).astype(np.float32))
        depth = jnp.asarray(RNG.uniform(1.0, 10.0, n).astype(np.float32))
        visible = jnp.ones((n,), bool)
        keys = tiling.build_tile_keys(
            uv, depth, radius, visible, 64, 64, 32, key_cap=6144,
            interpret=True,
        )
        assert int(keys.total) > 0
        assert int(jnp.sum(keys.tile_end - keys.tile_start)) == min(
            int(keys.total), 6144)

    @pytest.mark.slow

    def test_direct_candidate_mode_matches_partition(self):
        """Direct mode (no N-length partition sort) must reproduce the
        partition path bit-for-bit at the fitted candidate scale, at both
        high and low visibility density."""
        import dataclasses
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            build_keys, compute_raw_attrs,
        )
        xyz, feats, _ = make_scene(400, seed=9)
        cam = make_camera(w=128, h=64)
        rng = np.random.default_rng(2)
        for invalid in (jnp.zeros((400,), bool),
                        jnp.asarray(rng.random(400) > 0.06)):
            base = RasterizerConfig(tile_size=32, key_cap=4096,
                                    interpret=True)
            raw, radius = compute_raw_attrs(xyz, feats, Q_ID, T_ID, cam)
            keys_p, _, _ = build_keys(raw, radius, invalid, cam, base)
            cfg_d = dataclasses.replace(
                base, candidate_mode="direct",
                cand_scale=int(keys_p.cand_scale_req))
            out_p = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, base)
            out_d = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, cfg_d)
            np.testing.assert_array_equal(np.asarray(out_p.rgb),
                                          np.asarray(out_d.rgb))
            np.testing.assert_array_equal(np.asarray(out_p.count),
                                          np.asarray(out_d.count))

        # gradients flow through the same regroup/segment intervals in
        # both modes (stable partition preserves owner offsets): exact
        def loss(cfg):
            def f(x, ft):
                o = rasterize(x, ft, jnp.zeros((400,), bool), Q_ID, T_ID,
                              cam, cfg)
                return jnp.sum(o.rgb * o.rgb)
            return jax.grad(f, argnums=(0, 1))(xyz, feats)
        gp = loss(base)
        gd = loss(cfg_d)
        np.testing.assert_array_equal(np.asarray(gp[0]), np.asarray(gd[0]))
        np.testing.assert_array_equal(np.asarray(gp[1]), np.asarray(gd[1]))

    def test_under_scaled_direct_mode_drops_cleanly(self):
        """Span overflow in direct mode must DEGRADE (surplus keys retired
        to the sentinel) — never emit garbage keys: the rendered tiles'
        blend ranges must be a strict subset of the correctly-scaled run's
        keys (same tile totals or fewer, no foreign content)."""
        import dataclasses
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            build_keys, compute_raw_attrs,
        )
        n = 4000  # enough candidate lanes that sparse visibility spans
        # multiple CSUB windows (400 would fit one window at scale 1)
        xyz, feats, _ = make_scene(n, seed=9)
        cam = make_camera(w=128, h=64)
        rng = np.random.default_rng(2)
        invalid = jnp.asarray(rng.random(n) > 0.05)
        base = RasterizerConfig(tile_size=32, key_cap=4096, interpret=True)
        raw, radius = compute_raw_attrs(xyz, feats, Q_ID, T_ID, cam)
        keys_p, _, _ = build_keys(raw, radius, invalid, cam, base)
        req = int(keys_p.cand_scale_req)
        assert req > 1, "scene not sparse enough to exercise overflow"
        good = dataclasses.replace(base, candidate_mode="direct",
                                   cand_scale=req)
        under = dataclasses.replace(base, candidate_mode="direct",
                                    cand_scale=1)
        kg, tg, _ = build_keys(raw, radius, invalid, cam, good)
        ku, tu, _ = build_keys(raw, radius, invalid, cam, under)
        live_g = int(jnp.sum(kg.tile_end - kg.tile_start))
        live_u = int(jnp.sum(ku.tile_end - ku.tile_start))
        assert live_u < live_g  # keys actually dropped
        # every surviving (key, attr-column) of the under-scaled run must
        # appear in the good run: compare multisets of fused-key+attr rows
        def rowset(keys, table):
            rows = []
            ts, te = np.asarray(keys.tile_start), np.asarray(keys.tile_end)
            tab = np.asarray(table)
            for t in range(ts.shape[0]):
                for s in range(ts[t], te[t]):
                    rows.append((t,) + tuple(np.round(tab[:10, s], 5)))
            return rows
        good_rows = rowset(kg, tg)
        under_rows = rowset(ku, tu)
        from collections import Counter
        cg, cu = Counter(good_rows), Counter(under_rows)
        assert all(cu[r] <= cg[r] for r in cu), "foreign keys emitted"

    @pytest.mark.slow

    @pytest.mark.parametrize("chunk", [256, 512])
    def test_blend_fat_chunks_match_128(self, chunk):
        """Larger blend DMA chunks stay within the oracle-gate tolerance
        class: chunk boundaries move the cumsum rounding splits and can
        flip lanes at the 1e-4 saturation threshold, so 256/512 vs 128 is
        compared at the same atol/rtol the production-vs-oracle gradient
        gates use (the fat-chunk paths also pass those gates directly;
        their forward rgb is 1-ulp from the oracle via the 3-term cumsum).
        Fat chunks are the production default on TPU — at chunk=128 the
        per-window VPU work barely covers the DMA latency."""
        import dataclasses
        xyz, feats, _ = make_scene(500, seed=13)
        cam = make_camera(w=128, h=64)
        invalid = jnp.zeros((500,), bool)
        base = RasterizerConfig(tile_size=32, key_cap=4096, interpret=True)
        big = dataclasses.replace(base, blend_chunk=chunk)
        out_a = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, base)
        out_b = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, big)
        np.testing.assert_allclose(np.asarray(out_a.rgb),
                                   np.asarray(out_b.rgb), atol=1e-4)

        def loss(cfg):
            def f(x, ft):
                o = rasterize(x, ft, invalid, Q_ID, T_ID, cam, cfg)
                return jnp.sum(o.rgb * o.rgb)
            return jax.grad(f, argnums=(0, 1))(xyz, feats)
        ga = loss(base)
        gb = loss(big)
        # a lane sitting exactly at the T<1e-4 saturation cutoff can flip
        # inclusion between chunkings, toggling its whole contribution
        # (~1e-3-scale on this dense scene) — the gate is sized for that
        # flip class while still catching structural O(1) breakage
        np.testing.assert_allclose(np.asarray(ga[0]), np.asarray(gb[0]),
                                   atol=5e-3, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(ga[1]), np.asarray(gb[1]),
                                   atol=5e-3, rtol=1e-2)

    def test_degenerate_splats_keep_gradients_finite(self):
        """Collapsed scales (exp underflow), a point at the camera plane
        (z ~ 0), and a point behind the camera must not leak NaN into ANY
        gradient row — culling only zeroes their cotangents, and
        0 * inf = NaN without the projection/rescale VJP guards."""
        xyz, feats, _ = make_scene(64, seed=21)
        xyz = xyz.at[0].set(jnp.asarray([0.1, 0.1, 1e-15]))   # on the plane
        xyz = xyz.at[1].set(jnp.asarray([0.2, -0.1, -2.0]))   # behind
        feats = feats.at[2, 4:7].set(-100.0)                  # exp underflow
        feats = feats.at[3, 4:7].set(-100.0)
        xyz = xyz.at[3].set(jnp.asarray([0.0, 0.0, 3.0]))     # on-axis too
        invalid = jnp.zeros((64,), bool)
        cam = make_camera()

        def loss(x, f):
            out = rasterize(x, f, invalid, Q_ID, T_ID, cam, CFG)
            return jnp.sum(out.rgb)

        gx, gf = jax.grad(loss, argnums=(0, 1))(xyz, feats)
        assert bool(jnp.isfinite(gx).all()), np.asarray(gx)[:5]
        assert bool(jnp.isfinite(gf).all())

    def test_inverse_permutation(self):
        slots = jnp.asarray(RNG.permutation(256).astype(np.int32))
        inv = tiling.inverse_permutation(slots)
        np.testing.assert_array_equal(
            np.asarray(slots)[np.asarray(inv)], np.arange(256)
        )


class TestForward:
    def test_matches_oracle(self):
        xyz, feats, invalid = make_scene()
        cam = make_camera()
        out = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, CFG)
        rgb_ref, depth_ref, alpha_ref, count_ref = render_reference(
            xyz, feats, invalid, Q_ID, T_ID, cam, CFG
        )
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb_ref),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.alpha), np.asarray(alpha_ref),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.depth), np.asarray(depth_ref),
                                   atol=5e-4)
        np.testing.assert_array_equal(np.asarray(out.count),
                                      np.asarray(count_ref))

    def test_exact_tile_cull_lossless(self):
        """The expand-kernel tile cull removes dead (point, tile) pairs
        without touching any live one: the per-pixel blended-splat count
        must be bit-identical with the cull on and off, while the live key
        total shrinks (corner tiles of anisotropic splats)."""
        import dataclasses
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            build_keys, compute_raw_attrs,
        )
        xyz, feats, invalid = make_scene(300, seed=5)
        cam = make_camera(w=128, h=64)
        outs, live = {}, {}
        for cull in (False, True):
            cfg = dataclasses.replace(CFG, exact_tile_cull=cull)
            raw, radius = compute_raw_attrs(xyz, feats, Q_ID, T_ID, cam)
            keys, _, _ = build_keys(raw, radius, invalid, cam, cfg)
            live[cull] = int(jnp.sum(keys.tile_end - keys.tile_start))
            outs[cull] = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, cfg)
        assert live[True] < live[False]
        np.testing.assert_array_equal(np.asarray(outs[True].count),
                                      np.asarray(outs[False].count))
        np.testing.assert_allclose(np.asarray(outs[True].rgb),
                                   np.asarray(outs[False].rgb), atol=1e-5)

    def test_empty_scene(self):
        xyz, feats, _ = make_scene(64)
        invalid = jnp.ones((64,), bool)
        cam = make_camera()
        out = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, CFG)
        assert np.all(np.asarray(out.rgb) == 0)
        assert np.all(np.asarray(out.alpha) == 0)

    def test_nonidentity_pose(self):
        xyz, feats, invalid = make_scene(150, seed=3)
        cam = make_camera()
        q = jnp.asarray([0.05, -0.1, 0.02, 0.99], jnp.float32)
        q = q / jnp.linalg.norm(q)
        t = jnp.asarray([0.2, -0.1, -0.5], jnp.float32)
        out = rasterize(xyz, feats, invalid, q, t, cam, CFG)
        rgb_ref, *_ = render_reference(xyz, feats, invalid, q, t, cam, CFG)
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb_ref),
                                   atol=1e-4)

    def test_saturation_path(self):
        # many opaque splats on top of each other -> early termination
        n = 300
        rng = np.random.default_rng(11)
        xyz = np.stack(
            [rng.uniform(-0.1, 0.1, n), rng.uniform(-0.1, 0.1, n),
             rng.uniform(2.0, 3.0, n)], -1
        ).astype(np.float32)
        feats = np.zeros((n, 56), np.float32)
        feats[:, 3] = 1.0
        feats[:, 4:7] = -0.5
        feats[:, 7] = 8.0  # nearly opaque
        feats[:, 8] = rng.normal(size=n)
        xyz, feats = jnp.asarray(xyz), jnp.asarray(feats)
        invalid = jnp.zeros((n,), bool)
        cam = make_camera()
        out = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, CFG)
        rgb_ref, _, alpha_ref, count_ref = render_reference(
            xyz, feats, invalid, Q_ID, T_ID, cam, CFG
        )
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb_ref),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.count),
                                      np.asarray(count_ref))
        assert np.asarray(out.alpha).max() > 0.999  # saturated somewhere


class TestGradients:
    def test_custom_vjp_matches_oracle_autodiff(self):
        xyz, feats, invalid = make_scene(120, seed=5)
        cam = make_camera()
        gproj = jnp.asarray(
            np.random.default_rng(0).normal(size=(64, 64, 3)).astype(np.float32)
        )

        def loss_prod(x, f):
            out = rasterize(x, f, invalid, Q_ID, T_ID, cam, CFG)
            return jnp.sum(out.rgb * gproj)

        def loss_ref(x, f):
            rgb, *_ = render_reference(x, f, invalid, Q_ID, T_ID, cam, CFG)
            return jnp.sum(rgb * gproj)

        gx, gf = jax.grad(loss_prod, argnums=(0, 1))(xyz, feats)
        gx_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(xyz, feats)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                                   atol=5e-4, rtol=1e-3)

    @pytest.mark.slow

    def test_explicit_bwd_matches_custom_vjp(self):
        xyz, feats, invalid = make_scene(100, seed=9)
        cam = make_camera()
        g = jnp.ones((64, 64, 3), jnp.float32) * 0.5

        def loss(x, f):
            out = rasterize(x, f, invalid, Q_ID, T_ID, cam, CFG)
            return jnp.sum(out.rgb * g)

        gx, gf = jax.grad(loss, argnums=(0, 1))(xyz, feats)

        out, ctx, vjp = rasterize_fwd_ctx(
            xyz, feats, invalid, Q_ID, T_ID, cam, CFG
        )
        (gx2, gf2), stats = rasterize_bwd(ctx, vjp, g, cam, CFG)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf2), atol=1e-6)
        # stats sanity
        assert np.asarray(stats.num_affected_pixels).max() > 0
        assert np.asarray(stats.magnitude_grad_viewspace).max() > 0
        assert stats.magnitude_grad_viewspace_on_image.shape == (64, 64, 2)


class TestRectangularTiles:
    """Wide, short tiles (the production default shape on TPU) must match
    the oracle exactly like square tiles do. The oracle mirrors the
    tile-shape-dependent parts (depth-key bits, bbox membership), so each
    config is compared against its own oracle."""

    @pytest.mark.parametrize("tile_wh", [(32, 8), (32, 16)])
    def test_forward_matches_oracle(self, tile_wh):
        import dataclasses
        cfg = dataclasses.replace(CFG, tile_size=tile_wh[0], tile_h=tile_wh[1])
        xyz, feats, invalid = make_scene(200, seed=13)
        cam = make_camera()
        out = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, cfg)
        rgb_ref, depth_ref, alpha_ref, count_ref = render_reference(
            xyz, feats, invalid, Q_ID, T_ID, cam, cfg
        )
        np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(rgb_ref),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.alpha),
                                   np.asarray(alpha_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.depth),
                                   np.asarray(depth_ref), atol=5e-4)
        np.testing.assert_array_equal(np.asarray(out.count),
                                      np.asarray(count_ref))

    def test_gradients_match_oracle(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, tile_size=32, tile_h=8)
        xyz, feats, invalid = make_scene(120, seed=5)
        cam = make_camera()
        gproj = jnp.asarray(
            np.random.default_rng(0).normal(size=(64, 64, 3)).astype(np.float32)
        )

        def loss_prod(x, f):
            out = rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg)
            return jnp.sum(out.rgb * gproj)

        def loss_ref(x, f):
            rgb, *_ = render_reference(x, f, invalid, Q_ID, T_ID, cam, cfg)
            return jnp.sum(rgb * gproj)

        gx, gf = jax.grad(loss_prod, argnums=(0, 1))(xyz, feats)
        gx_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(xyz, feats)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_r),
                                   atol=5e-4, rtol=1e-3)

    def test_explicit_bwd_and_stats(self):
        import dataclasses
        cfg = dataclasses.replace(CFG, tile_size=32, tile_h=8)
        xyz, feats, invalid = make_scene(100, seed=9)
        cam = make_camera()
        g = jnp.ones((64, 64, 3), jnp.float32) * 0.5
        out, ctx, vjp = rasterize_fwd_ctx(
            xyz, feats, invalid, Q_ID, T_ID, cam, cfg
        )
        (gx2, gf2), stats = rasterize_bwd(ctx, vjp, g, cam, cfg)
        assert np.isfinite(np.asarray(gx2)).all()
        assert np.asarray(stats.num_affected_pixels).max() > 0
        assert stats.magnitude_grad_viewspace_on_image.shape == (64, 64, 2)

    def test_tile_h_must_divide_tile_size(self):
        with pytest.raises(ValueError):
            RasterizerConfig(tile_size=32, tile_h=12)


class TestSlim:
    def test_slim_train_path_matches_full(self):
        """slim (the training fast path: rgb-only blend channels, no depth
        sort payload, orig_slot kept) must leave BOTH the rgb image and
        every gradient/stat bit-identical to the full path — the dropped
        depth column has a structurally-zero cotangent."""
        import dataclasses

        xyz, feats, invalid = make_scene(120, seed=11)
        cam = make_camera()
        g = jnp.ones((64, 64, 3), jnp.float32) * 0.5
        cfg_slim = dataclasses.replace(CFG, slim=True)

        out_f, ctx_f, vjp_f = rasterize_fwd_ctx(
            xyz, feats, invalid, Q_ID, T_ID, cam, CFG)
        out_s, ctx_s, vjp_s = rasterize_fwd_ctx(
            xyz, feats, invalid, Q_ID, T_ID, cam, cfg_slim)
        np.testing.assert_array_equal(np.asarray(out_s.rgb),
                                      np.asarray(out_f.rgb))
        assert np.all(np.asarray(out_s.depth) == 0.0)
        assert np.all(np.asarray(out_s.count) == 0.0)

        (gx_f, gf_f), st_f = rasterize_bwd(ctx_f, vjp_f, g, cam, CFG)
        (gx_s, gf_s), st_s = rasterize_bwd(ctx_s, vjp_s, g, cam, cfg_slim)
        np.testing.assert_array_equal(np.asarray(gx_s), np.asarray(gx_f))
        np.testing.assert_array_equal(np.asarray(gf_s), np.asarray(gf_f))
        np.testing.assert_array_equal(
            np.asarray(st_s.magnitude_grad_viewspace),
            np.asarray(st_f.magnitude_grad_viewspace))
        np.testing.assert_array_equal(
            np.asarray(st_s.num_affected_pixels),
            np.asarray(st_f.num_affected_pixels))

    def test_slim_excludes_rgb_only(self):
        with pytest.raises(ValueError):
            RasterizerConfig(slim=True, rgb_only=True)


class TestRgbOnly:
    def test_rgb_matches_full_path(self):
        """rgb_only (reference K6 template flag) must not change the rgb."""
        import dataclasses

        xyz, feats, invalid = make_scene(150, seed=2)
        cam = make_camera()
        full = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, CFG)
        cfg2 = dataclasses.replace(CFG, rgb_only=True)
        fast = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, cfg2)
        np.testing.assert_array_equal(np.asarray(fast.rgb),
                                      np.asarray(full.rgb))
        # rgb_only skips the extras entirely (reference K6 rgb_only
        # template also leaves them unwritten): zeros, not garbage
        assert np.all(np.asarray(fast.alpha) == 0.0)
        assert np.all(np.asarray(fast.depth) == 0.0)
        assert np.all(np.asarray(fast.count) == 0.0)


class TestBlendStrips:
    """Strip-granular saturation termination (blend_strips > 1) must be
    output-identical: a saturated strip's pixels all carry the sticky
    T < 1e-4 mask, so every skipped contribution is exactly zero."""

    def test_forward_bitwise_identical_across_strips(self):
        import dataclasses as dc
        xyz, feats, invalid = make_scene(300, seed=11)
        cam = make_camera(w=64, h=64)
        base = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, CFG)
        for strips in (2, 4):
            cfg = dc.replace(CFG, blend_strips=strips)
            out = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, cfg)
            np.testing.assert_array_equal(
                np.asarray(out.rgb), np.asarray(base.rgb))
            np.testing.assert_array_equal(
                np.asarray(out.depth), np.asarray(base.depth))
            np.testing.assert_array_equal(
                np.asarray(out.count), np.asarray(base.count))

    def test_backward_matches_dense_oracle(self):
        """Same gradient gate as the strips=1 path: jax.grad of the dense
        reference renderer (strip-blocked moment sums only reassociate
        pixel reductions, bounded by f32 rounding)."""
        import dataclasses as dc
        xyz, feats, invalid = make_scene(120, seed=13)
        cam = make_camera(w=64, h=64)
        cfg = dc.replace(CFG, blend_strips=4)
        g = jnp.asarray(
            RNG.uniform(0.1, 1.0, (64, 64, 3)).astype(np.float32))

        def loss_pallas(x, f):
            out = rasterize(x, f, invalid, Q_ID, T_ID, cam, cfg)
            return jnp.sum(out.rgb * g)

        def loss_oracle(x, f):
            rgb, *_ = render_reference(x, f, invalid, Q_ID, T_ID, cam, cfg)
            return jnp.sum(rgb * g)

        gx, gf = jax.grad(loss_pallas, argnums=(0, 1))(xyz, feats)
        ox, of = jax.grad(loss_oracle, argnums=(0, 1))(xyz, feats)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(ox),
                                   atol=5e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(of),
                                   atol=5e-4, rtol=1e-3)

    def test_backward_stats_match_across_strips(self):
        import dataclasses as dc
        from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
            rasterize_bwd, rasterize_fwd_ctx,
        )
        xyz, feats, invalid = make_scene(150, seed=17)
        cam = make_camera(w=64, h=64)
        g = jnp.ones((64, 64, 3), jnp.float32) * 0.5
        results = []
        for strips in (1, 4):
            cfg = dc.replace(CFG, blend_strips=strips)
            out, ctx, vjp = rasterize_fwd_ctx(
                xyz, feats, invalid, Q_ID, T_ID, cam, cfg)
            (gx, gf), stats = rasterize_bwd(ctx, vjp, g, cam, cfg)
            results.append((gx, gf, stats))
        (gx1, gf1, st1), (gx4, gf4, st4) = results
        np.testing.assert_allclose(np.asarray(gx4), np.asarray(gx1),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf4), np.asarray(gf1),
                                   atol=1e-6)
        # densify stats: npix is a sum of exact 0/1 counts -> bitwise
        np.testing.assert_array_equal(
            np.asarray(st4.num_affected_pixels),
            np.asarray(st1.num_affected_pixels))
        np.testing.assert_allclose(
            np.asarray(st4.magnitude_grad_viewspace),
            np.asarray(st1.magnitude_grad_viewspace), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(st4.magnitude_grad_viewspace_on_image),
            np.asarray(st1.magnitude_grad_viewspace_on_image), atol=1e-6)


class TestPackedSortColors:
    """pack_sort_colors (rgb_only inference opt-in): r/g ride the key sort
    as one bf16 pair. The rounding must stay under display quantization —
    pinned as PSNR >= 55 dB against the unpacked render."""

    def test_packed_render_psnr_vs_unpacked(self):
        import dataclasses as dc
        xyz, feats, invalid = make_scene(300, seed=23)
        cam = make_camera(w=64, h=64)
        base_cfg = dc.replace(CFG, rgb_only=True)
        pack_cfg = dc.replace(CFG, rgb_only=True, pack_sort_colors=True)
        a = np.asarray(rasterize(
            xyz, feats, invalid, Q_ID, T_ID, cam, base_cfg).rgb)
        b = np.asarray(rasterize(
            xyz, feats, invalid, Q_ID, T_ID, cam, pack_cfg).rgb)
        a, b = np.clip(a, 0, 1), np.clip(b, 0, 1)
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr >= 55.0, f"packed-color rounding too visible: {psnr:.1f} dB"
        # and it rounds, not corrupts: worst-case pixel error well under
        # one 8-bit display step
        assert np.abs(a - b).max() < 1.5 / 255

    def test_pack_ignored_outside_rgb_only(self):
        """Training paths must silently keep exact f32 payloads (the knob
        documents itself as inference-only)."""
        import dataclasses as dc
        xyz, feats, invalid = make_scene(120, seed=29)
        cam = make_camera(w=64, h=64)
        base = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, CFG)
        cfg = dc.replace(CFG, pack_sort_colors=True)
        out = rasterize(xyz, feats, invalid, Q_ID, T_ID, cam, cfg)
        np.testing.assert_array_equal(np.asarray(out.rgb),
                                      np.asarray(base.rgb))
