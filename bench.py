"""Benchmark harness: rasterizer forward AND full train step (fwd+bwd).

Protocol mirrors the reference benchmark/inference_benchmark.py (warm-up
then timed frames; the reference times 100 frames after 1000 warm-ups with
CUDA events, :13-14); here each measurement is an in-jit fori_loop/scan
chain of >= 100 frames (out-of-jit dispatch timing under-reports through
the remote-TPU tunnel), run 3x with the median reported. Scene size
defaults to the published Truck 30k checkpoint (~4.3e5 points,
README.md:70) at the ~980x546 val views cropped to the 32-px TPU tile
(960x544); `--points` rescales to the official graphdeco checkpoint sizes
(1.03e6 / 2.08e6, reference benchmark/inference_benchmark.py:18-81).

Baselines:
- forward: 20.07 ms/frame on an RTX 3090 at 4.6e5 points
  (reference benchmark/README.md:13-17) -> 26.0 Mpix/s. `vs_baseline` is
  the ratio of our forward Mpix/s to that.
- train step (fwd+bwd+optimizers): two anchors, both labeled. (a)
  `train_vs_ref_baseline`: the reference's own checked-in 30k Truck
  baseline run (logs/tat_truck_every_8_experiment_baseline/scalars.csv,
  train/loss wall_time deltas) has a median 58.2 ms per training
  iteration (60.0 ms over the >=15k-iteration half at ~860k points,
  ~980x546 views, 2193 s total wall) on the local GPU whose val renders
  take 7.45 ms/frame — the only reference-hardware training rate on
  record; its wall time includes the controller/logging host work, where
  ours is the pure scanned device step, so the ratio flatters us
  somewhat at equal point counts. (b) `train_vs_t4_ci`: the cloud CI
  trains 30k iterations in ~2-3 h on a T4 (README.md:303) => ~300
  ms/step (the weaker, older anchor; kept for round continuity).

Prints ONE JSON line with the forward metric as `metric`/`value` and the
train-step numbers as extra fields.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# Persistent compile cache: bench configs recompile identically between
# invocations (same static shapes); round 3's 2.08M bench failed to even
# finish inside 10 minutes because probe+compile dominated. Harmless if
# the backend can't serialize executables (cache misses, nothing breaks).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache_bench")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


N_POINTS = 428_687          # Truck 30k checkpoint size (README.md:70)
HEIGHT, WIDTH = 544, 960    # ~980x546 val views cropped to 32-px tiles
TIMED_FWD = 100             # frames per timed chain (reference: 100 timed)
TIMED_TRAIN = 50            # optimizer steps per timed scan chain
REPEATS = 3                 # timed-chain repeats; median reported

REF_MS = 20.07              # RTX 3090 forward ms/frame (benchmark/README.md)
REF_MPIX_S = (980 * 546 / 1e6) / (REF_MS / 1e3)
REF_TRAIN_MS_T4 = 300.0     # ~2.5 h / 30k iters on the T4 cloud CI
REF_TRAIN_MS_BASELINE = 58.2  # median ms/iter of the reference's checked-in
                            # 30k Truck baseline (see module docstring)


def synthetic_truck_scene(n: int, seed: int = 0):
    """Synthetic stand-in with Truck-like screen statistics: points spread
    over a street-scale shell around the camera, log-scales sized so splats
    cover a handful of pixels at depth.

    Splat scales shrink with sqrt(n / 428k): real checkpoints at 1-2M
    points (the official graphdeco plys the reference benchmarks,
    benchmark/inference_benchmark.py:18-81) have MORE, SMALLER splats at
    roughly constant total screen coverage — without this, scaling n
    multiplies the key count instead of matching that regime."""
    rng = np.random.default_rng(seed)
    xyz = np.stack(
        [rng.uniform(-8.0, 8.0, n), rng.uniform(-4.0, 4.0, n),
         rng.uniform(1.0, 30.0, n)], axis=-1
    ).astype(np.float32)
    feats = _truck_feats(rng, n)
    return jnp.asarray(xyz), jnp.asarray(feats)


def synthetic_truck_scene_surround(n: int, seed: int = 0,
                                   visible_frac: float = 0.6):
    """Truck-like scene with REALISTIC per-view visibility.

    Real capture reconstructions surround the camera path: any single val
    view frustum-culls the points behind and beside it (the reference
    benchmark renders the official graphdeco plys with exactly that
    culling active, benchmark/inference_benchmark.py:18-81). The original
    all-in-frustum synthetic scene is strictly HARDER than a real
    checkpoint frame at equal point count — every point pays keys and
    blend pairs. This variant keeps the visible subset's screen
    statistics identical (same spatial box, scales, depth range) and
    places the remaining (1 - visible_frac) of the points on the
    surrounding shell outside the test camera's frustum (behind and
    laterally), where the frustum cull drops them exactly like a real
    frame. visible_frac=0.6 is a conservative stand-in for object-orbit
    captures such as Truck (a ~270-degree orbit sees well under half the
    reconstruction per view; 0.6 keeps the bench harder than that)."""
    rng = np.random.default_rng(seed)
    n_vis = int(n * visible_frac)
    n_out = n - n_vis
    vis = np.stack(
        [rng.uniform(-8.0, 8.0, n_vis), rng.uniform(-4.0, 4.0, n_vis),
         rng.uniform(1.0, 30.0, n_vis)], axis=-1)
    # out-of-frustum shell: behind the camera and far beside the frustum
    theta = rng.uniform(np.pi * 0.6, np.pi * 1.4, n_out)  # away from +z
    rad = rng.uniform(5.0, 30.0, n_out)
    out = np.stack(
        [rad * np.sin(theta), rng.uniform(-4.0, 4.0, n_out),
         rad * np.cos(theta)], axis=-1)
    xyz = np.concatenate([vis, out], axis=0).astype(np.float32)
    perm = rng.permutation(n)  # interleave so culling isn't block-shaped
    feats = _truck_feats(rng, n)
    return jnp.asarray(xyz[perm]), jnp.asarray(feats)


def _truck_feats(rng, n: int) -> np.ndarray:
    feats = np.zeros((n, 56), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    feats[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    scale_shift = -0.5 * np.log(max(n / N_POINTS, 1.0))
    feats[:, 4:7] = rng.uniform(-4.5, -2.0, (n, 3)) + scale_shift
    feats[:, 7] = rng.uniform(-2.0, 3.0, n)
    feats[:, 8:] = (rng.normal(size=(n, 48)) * 0.3).astype(np.float32)
    return feats


def _probe_code_fingerprint() -> str:
    """Short hash over this file and the key-count-determining modules
    (scene synthesis + culling + key expansion), so cached probe results
    invalidate whenever any of them changes."""
    import hashlib
    pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "taichi_3d_gaussian_splatting_tpu", "ops")
    h = hashlib.sha256()
    for path in (os.path.abspath(__file__),
                 os.path.join(pkg, "tiling.py"),
                 os.path.join(pkg, "expand.py"),
                 os.path.join(pkg, "attributes.py")):
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:10]


def _median_timed(fn, *args, repeats: int = REPEATS):
    """Compile+warm once, then time `repeats` runs; median seconds."""
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_forward(xyz, feats, invalid, q, t, camera, cfg):
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import rasterize

    @jax.jit
    def timed_chain(x, f):
        def body(i, carry):
            out = rasterize(x + carry * 0.0, f, invalid, q, t, camera,
                            cfg).rgb
            return out[0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, TIMED_FWD, body, jnp.float32(0))

    sec = _median_timed(timed_chain, xyz, feats)
    return sec / TIMED_FWD * 1e3  # ms/frame


def bench_train_step(xyz, feats, camera, rcfg):
    """The actual training hot loop: trainer.make_train_step (rasterize
    fwd ctx + loss + manual bwd + grad factors + controller accumulate +
    both Adam updates), scanned TIMED_TRAIN steps in one dispatch."""
    from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
    from taichi_3d_gaussian_splatting_tpu.training import controller as ctrl
    from taichi_3d_gaussian_splatting_tpu.training.config import TrainConfig
    from taichi_3d_gaussian_splatting_tpu.training.trainer import (
        TrainState, make_optimizers, make_train_step,
    )

    n = xyz.shape[0]
    config = TrainConfig(rasterisation_config=rcfg)
    step = make_train_step(config, HEIGHT, WIDTH, scan_steps=TIMED_TRAIN)
    # the step DONATES its input state: each run needs fresh device copies
    # (reusing the donated xyz/feats buffers raises deleted-array errors —
    # surfaced as bare INVALID_ARGUMENT through the remote-TPU tunnel)
    xyz_h = np.asarray(xyz)
    feats_h = np.asarray(feats)

    def build_state():
        scene = GaussianScene(
            xyz=jnp.asarray(xyz_h), features=jnp.asarray(feats_h),
            invalid=jnp.zeros((n,), bool),
            object_id=jnp.zeros((n,), jnp.int32))
        ftx, ptx = make_optimizers(config)
        return TrainState(
            scene=scene, feat_opt=ftx.init(scene.features),
            pos_opt=ptx.init(scene.xyz), ctrl=ctrl.init_state(n))

    rng = np.random.default_rng(7)
    images = jnp.asarray(
        rng.random((TIMED_TRAIN, HEIGHT, WIDTH, 3)).astype(np.float32))
    qs = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32),
                  (TIMED_TRAIN, 1))
    ts = jnp.zeros((TIMED_TRAIN, 3), jnp.float32)
    Ks = jnp.tile(camera.K[None], (TIMED_TRAIN, 1, 1))
    sh = jnp.asarray(3, jnp.int32)

    def run(state):
        new_state, metrics, _ = step(state, images, qs, ts, Ks, sh)
        return metrics["loss"]

    # the step donates its input state: fresh state per run
    jax.block_until_ready(run(build_state()))  # compile + warm
    times = []
    for _ in range(REPEATS):
        state = build_state()
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        jax.block_until_ready(run(state))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / TIMED_TRAIN * 1e3  # ms/step


def bench_scene(scene: str, n_points: int, tile: int, tile_h, skip_train: bool,
                fwd_frames: int, train_steps: int,
                blend_strips: int = 1, pack_colors: bool = False):
    """Measure one scene variant; returns a dict of its numbers."""
    global TIMED_FWD, TIMED_TRAIN
    TIMED_FWD = fwd_frames
    TIMED_TRAIN = train_steps
    from taichi_3d_gaussian_splatting_tpu.ops.rasterizer import (
        Camera, RasterizerConfig, build_keys, compute_raw_attrs,
    )
    from taichi_3d_gaussian_splatting_tpu.training.trainer import fit_key_cap

    platform = jax.devices()[0].platform
    interpret = platform == "cpu"
    if scene == "surround":
        xyz, feats = synthetic_truck_scene_surround(n_points)
    else:
        xyz, feats = synthetic_truck_scene(n_points)
    invalid = jnp.zeros((n_points,), bool)
    q = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)
    t = jnp.zeros((3,), jnp.float32)
    K = jnp.asarray(
        [[580.0, 0.0, WIDTH / 2], [0.0, 580.0, HEIGHT / 2], [0.0, 0.0, 1.0]],
        jnp.float32,
    )
    camera = Camera(K=K, width=WIDTH, height=HEIGHT)

    # size the static key capacity to the live key count (what the trainer
    # does continuously via fit_key_cap). Probe results are cached on disk:
    # the scenes are seed-deterministic, so (scene, points, tile) fully
    # determines the totals — skipping the 2^22-cap probe jit is most of
    # what made the 2.08M bench terminate.
    cache_path = os.path.join(_CACHE_DIR, "probe_cache.json")
    # salt the key with a fingerprint of the key-generating code: a stale
    # (total, cand_scale) mis-sizes key_cap and can silently flip the
    # direct-mode decision if scene synthesis/culling/keying changes
    ck = (f"{scene}_{n_points}_{tile}x{tile_h or tile}"
          f"_{_probe_code_fingerprint()}")
    probe = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            probe = json.load(f)
    if ck in probe:
        total, scale = probe[ck]
    else:
        probe_cfg = RasterizerConfig(tile_size=tile, tile_h=tile_h,
                                     key_cap=2 ** 22,
                                     interpret=interpret, extra_info=False)
        raw, radius = jax.jit(
            lambda x, f: compute_raw_attrs(x, f, q, t, camera))(xyz, feats)
        keys, _, _ = jax.jit(
            lambda r, rad: build_keys(r, rad, invalid, camera, probe_cfg)
        )(raw, radius)
        total, scale = int(keys.total), int(keys.cand_scale_req)
        probe[ck] = [total, scale]
        os.makedirs(_CACHE_DIR, exist_ok=True)
        with open(cache_path, "w") as f:
            json.dump(probe, f)
    # static scene + fixed pose: the key total is exactly repeatable, so
    # fit with no headroom beyond the bucket roundup — the analogue of the
    # reference's exact per-frame M-sized buffer allocation (training uses
    # 1.3 to ride out camera motion between re-bucketing checks)
    cap = fit_key_cap(total, headroom=1.0)
    # direct candidate mode when the fitted window scale is modest: skips
    # the N-length partition sort entirely (exact at the fitted scale;
    # static scene + fixed pose, so no jitter headroom needed). The req is
    # only measured for windows existing at the probe's key_cap, and
    # partition mode must keep cand_scale=1 (window/VMEM sizing).
    from taichi_3d_gaussian_splatting_tpu.ops.expand import MAX_CAND_SCALE
    direct = 0 < scale <= MAX_CAND_SCALE and total <= 2 ** 22
    # rgb_only matches the reference benchmark protocol
    # (benchmark/inference_benchmark.py uses the rgb-only rasterizer)
    fwd_cfg = RasterizerConfig(
        tile_size=tile, tile_h=tile_h, key_cap=cap, interpret=interpret,
        extra_info=False, rgb_only=True,
        blend_strips=blend_strips, pack_sort_colors=pack_colors,
        candidate_mode="direct" if direct else "partition",
        cand_scale=scale if direct else 1)
    fwd_ms = bench_forward(xyz, feats, invalid, q, t, camera, fwd_cfg)
    mpix = HEIGHT * WIDTH / 1e6
    fwd_mpix_s = mpix / (fwd_ms / 1e3)

    result = {
        "value": round(fwd_mpix_s, 3),
        "vs_baseline": round(fwd_mpix_s / REF_MPIX_S, 4),
        "fwd_ms": round(fwd_ms, 3),
        "timed_frames": TIMED_FWD,
        "scene": scene,
        "num_keys": total,
    }

    if not skip_train:
        # the train step keeps the robust partition path + densify stats,
        # exactly like real training (trainer._active_config defaults)
        train_cfg = RasterizerConfig(
            tile_size=tile, tile_h=tile_h,
            key_cap=fit_key_cap(total),
            interpret=interpret,
            blend_strips=blend_strips,
            candidate_mode="direct" if direct else "partition",
            cand_scale=scale if direct else 1)
        try:
            train_ms = bench_train_step(xyz, feats, camera, train_cfg)
            result.update({
                "train_step_ms": round(train_ms, 3),
                "train_mpix_per_s": round(mpix / (train_ms / 1e3), 3),
                "train_vs_ref_baseline": round(
                    REF_TRAIN_MS_BASELINE / train_ms, 3),
                "train_vs_t4_ci": round(REF_TRAIN_MS_T4 / train_ms, 3),
                "train_timed_steps": TIMED_TRAIN,
            })
        except Exception as e:  # forward metric still ships
            result["train_step_error"] = f"{type(e).__name__}: {e}"[:200]
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=N_POINTS)
    ap.add_argument("--skip_train", action="store_true",
                    help="forward metric only")
    ap.add_argument("--tile_size", type=int, default=32,
                    help="tile width in pixels")
    ap.add_argument("--tile_h", type=int, default=None,
                    help="tile height (None = square tile_size, the "
                    "measured-optimal shape; short tiles pay 1.2-2x key "
                    "inflation — see RESULTS.md sweeps)")
    ap.add_argument("--scene", choices=("surround", "allvis", "both"),
                    default=None,
                    help="surround: realistic per-view visibility (60%% of "
                    "points in frustum, like rendering a real checkpoint); "
                    "allvis: every point in frustum (strictly harder than "
                    "any real frame; the round-1/2 protocol). Default "
                    "measures BOTH so the tracked metric can never be "
                    "silently re-based (round-3 post-mortem, RESULTS.md) — "
                    "EXCEPT at --points >= 1.5M, where the default is "
                    "surround only (the allvis duplicate doubled the "
                    "2.08M bench past any practical regression-tracking "
                    "budget; ask for it explicitly with --scene)")
    ap.add_argument("--frames", type=int, default=None,
                    help="timed forward frames per chain (default 100; "
                    "50 at --points >= 1.5M — at ~36 ms/frame the shorter "
                    "chain still amortizes dispatch overhead to <2%%, and "
                    "with the probe + compile caches warm the whole 2.08M "
                    "bench lands in ~5 min, ~10 cold)")
    ap.add_argument("--train_steps", type=int, default=None,
                    help="timed optimizer steps per scan chain (default "
                    "50; 20 at --points >= 1.5M)")
    ap.add_argument("--blend_strips", type=int, default=1,
                    help="per-strip saturation termination granularity in "
                    "the blend kernels (1 = whole-tile, the r4 behavior; "
                    "output-identical at any divisor of the tile height)")
    ap.add_argument("--pack_colors", action="store_true",
                    help="rgb_only forward only: r/g ride the key sort as "
                    "one bf16 pair (~2^-9 color rounding, >=55 dB vs f32; "
                    "the metric name gains a _packed tag)")
    ap.add_argument("--skip_extra_scale", action="store_true",
                    help="skip the 1.03M-point forward-only entries the "
                    "default run appends (official graphdeco 7k-checkpoint "
                    "scale, reference benchmark/README.md:3)")
    args = ap.parse_args()

    platform = jax.devices()[0].platform
    n_points = args.points
    tile = args.tile_size
    tile_h = args.tile_h
    th = tile if tile_h is None else tile_h
    tile_tag = "" if (tile, th) == (32, 32) else f"_t{tile}x{th}"
    if args.pack_colors:
        tile_tag += "_packed"

    # scale-aware defaults (see --help): the 2M bench must be a practical
    # regression tracker, not a patience test (round-3/4 asks)
    big = n_points >= 1_500_000
    if args.scene is None:
        args.scene = "surround" if big else "both"
    if args.frames is None:
        args.frames = 50 if big else TIMED_FWD
    if args.train_steps is None:
        args.train_steps = 20 if big else TIMED_TRAIN

    scenes = (("surround", "allvis") if args.scene == "both"
              else (args.scene,))
    per_scene = {
        s: bench_scene(s, n_points, tile, tile_h, args.skip_train,
                       args.frames, args.train_steps,
                       blend_strips=args.blend_strips,
                       pack_colors=args.pack_colors)
        for s in scenes
    }

    # headline = surround (the realistic-visibility protocol, tracked since
    # r03); the allvis numbers ship in the same line under "allvis" so both
    # protocols stay continuously comparable across rounds.
    head = per_scene.get("surround") or per_scene[scenes[0]]
    result = {
        "metric": f"truck{n_points // 1000}k_render_fwd_mpix_per_s_"
                  f"{platform}{tile_tag}",
        "unit": "Mpix/s",
        "repeats": REPEATS,
    }
    result.update(head)
    for s in scenes:
        if per_scene[s] is not head:
            result[s] = per_scene[s]

    if n_points == N_POINTS and not args.skip_extra_scale:
        # official-checkpoint scale rides along (forward-only; the 3090
        # renders this 1.03M ply at 18.83 ms, benchmark/README.md:3) so
        # the driver-recorded BENCH line tracks both scales every round
        for s in scenes:
            r = bench_scene(s, 1_030_000, tile, tile_h, True,
                            args.frames, args.train_steps)
            result[f"p1030k_{s}"] = r

    print(json.dumps(result))


if __name__ == "__main__":
    main()
