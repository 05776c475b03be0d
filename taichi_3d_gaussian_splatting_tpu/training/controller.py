"""Adaptive density controller: densify / split / prune over the fixed pool.

Behavioral reference: taichi_3d_gaussian_splatting/GaussianPointAdaptiveController.py.
The reference mutates torch parameters in place from a backward hook; here the
controller is a set of pure, jit-compatible functions over the fixed-capacity
scene pytree (the pool-with-invalid-slots design is the reference's own,
:47-52, and is exactly the static-shape discipline XLA wants):

- `accumulate`        <- reference update() accumulators (:130-146)
- `find_densify`      <- _find_densify_points (:170-283), producing masks +
                         recorded positions instead of compacted id lists
- `apply_densify`     <- _add_densify_points (:290-353): rank-matching of
                         densify sources to invalid slots replaces
                         torch.where(invalid)[0][:k] (slot-fill is realized
                         with two stable sorts, no dynamic shapes)
- `reset_alpha`       <- reset_alpha (:355-358)

The trainer drives the schedule (warm-up, densify interval, alpha reset) at
the Python level since iteration count is host-known.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.models.scene import GaussianScene
from taichi_3d_gaussian_splatting_tpu.ops.transforms import quaternion_to_rotation_matrix


@dataclasses.dataclass(frozen=True)
class ControllerConfig:
    """Mirrors GaussianPointAdaptiveControllerConfig (reference :54-87)."""

    num_iterations_warm_up: int = 500
    num_iterations_densify: int = 100
    transparent_alpha_threshold: float = -0.5
    densification_view_space_position_gradients_threshold: float = 6e-6
    densification_view_avg_space_position_gradients_threshold: float = 1e3
    densification_multi_frame_view_space_position_gradients_threshold: float = 1e3
    densification_multi_frame_view_pixel_avg_space_position_gradients_threshold: float = 1e3
    densification_multi_frame_position_gradients_threshold: float = 1e3
    gaussian_split_factor_phi: float = 1.6
    num_iterations_reset_alpha: int = 3000
    reset_alpha_value: float = 0.1
    floater_num_pixels_threshold: int = 10000
    floater_near_camrea_num_pixels_threshold: int = 10000
    floater_depth_threshold: float = 100.0
    iteration_start_remove_floater: int = 2000
    plot_densify_interval: int = 200
    under_reconstructed_num_pixels_threshold: int = 512
    under_reconstructed_move_factor: float = 100.0
    enable_ellipsoid_offset: bool = False
    enable_sample_from_point: bool = True


class ControllerState(NamedTuple):
    """Per-point accumulators across frames (reference __init__ :114-125)."""

    num_pixels: jnp.ndarray          # (N,) f32 affected-pixel count sum
    num_in_camera: jnp.ndarray       # (N,) f32 frames-visible count
    grad_viewspace: jnp.ndarray      # (N,) f32 sum of |grad_uv|
    grad_viewspace_avg: jnp.ndarray  # (N,) f32 sum of per-pixel-avg |grad_uv|
    grad_position: jnp.ndarray       # (N, 3) f32 sum of xyz grads
    grad_position_norm: jnp.ndarray  # (N,) f32 sum of |xyz grad|


def init_state(capacity: int) -> ControllerState:
    # distinct buffers per field: donated arguments must not alias
    def z():
        return jnp.zeros((capacity,), jnp.float32)

    return ControllerState(
        num_pixels=z(), num_in_camera=z(), grad_viewspace=z(),
        grad_viewspace_avg=z(),
        grad_position=jnp.zeros((capacity, 3), jnp.float32),
        grad_position_norm=z(),
    )


class DensifyInfo(NamedTuple):
    """What _find_densify_points records (reference DensifyPointInfo
    :100-107), as dense masks over the pool."""

    remove_mask: jnp.ndarray       # (N,) bool: floater | transparent
    densify_mask: jnp.ndarray      # (N,) bool
    position_before: jnp.ndarray   # (N, 3) xyz snapshot (pre-optimizer-step)
    size_reduction: jnp.ndarray    # (N,) log(phi) where split else 0
    grad_position: jnp.ndarray     # (N, 3) averaged accumulated position grad
    over_mask: jnp.ndarray         # (N,) bool: split (vs clone)


def accumulate(
    state: ControllerState,
    in_camera: jnp.ndarray,             # (N,) bool, this frame
    num_affected_pixels: jnp.ndarray,   # (N,) f32
    magnitude_grad_viewspace: jnp.ndarray,  # (N,) f32
    grad_xyz: jnp.ndarray,              # (N, 3)
) -> ControllerState:
    """Reference update() accumulation (:133-142); dense-masked instead of
    indexed by the compacted in-camera list."""
    vis = in_camera.astype(jnp.float32)
    avg = magnitude_grad_viewspace / num_affected_pixels
    # the reference only zeroes NaN (:138) and lets x/0 = inf leak into the
    # accumulator; zeroing every non-finite value is strictly safer
    avg = jnp.where(jnp.isfinite(avg), avg, 0.0)
    return ControllerState(
        num_pixels=state.num_pixels + vis * num_affected_pixels,
        num_in_camera=state.num_in_camera + vis,
        grad_viewspace=state.grad_viewspace + vis * magnitude_grad_viewspace,
        grad_viewspace_avg=state.grad_viewspace_avg + vis * avg,
        grad_position=state.grad_position + vis[:, None] * grad_xyz,
        grad_position_norm=state.grad_position_norm
        + vis * jnp.linalg.norm(grad_xyz, axis=-1),
    )


def _nan_to_zero(x):
    return jnp.where(jnp.isnan(x), 0.0, x)


def find_densify(
    scene: GaussianScene,
    state: ControllerState,
    in_camera: jnp.ndarray,            # (N,) bool this frame
    num_affected_pixels: jnp.ndarray,  # (N,) f32 this frame
    magnitude_grad_viewspace: jnp.ndarray,  # (N,) f32 this frame
    point_depth: jnp.ndarray,          # (N,) camera-frame z this frame
    remove_floaters: bool,
    cfg: ControllerConfig,
) -> DensifyInfo:
    """Selection pass (reference _find_densify_points :170-283).

    The reference snapshots PRE-optimizer-step positions (:171-175) so
    clones differ from their source by one Adam step; the trainer here
    deliberately runs this on the post-step scene to keep a single jitted
    step, so ``position_before`` equals the current positions and clone
    separation comes from apply_densify's unconditional grad-move /
    sampling / foci offset instead."""
    valid = jnp.logical_not(scene.invalid)

    # floaters: huge near-camera splats, only after warm-in (:194-202)
    floater = jnp.logical_and(
        in_camera,
        jnp.logical_and(
            num_affected_pixels > cfg.floater_near_camrea_num_pixels_threshold,
            point_depth < cfg.floater_depth_threshold,
        ),
    )
    if not remove_floaters:
        floater = jnp.zeros_like(floater)
    floater = jnp.logical_and(floater, valid)

    # transparent or NaN-poisoned points (:204-209)
    alpha = scene.features[:, 7]
    nan_mask = jnp.any(jnp.isnan(scene.features), axis=-1)
    transparent = jnp.logical_and(
        jnp.logical_or(alpha < cfg.transparent_alpha_threshold, nan_mask),
        jnp.logical_and(valid, jnp.logical_not(floater)),
    )
    remove_mask = jnp.logical_or(floater, transparent)

    # single-frame selection (:219-226)
    single = jnp.logical_and(
        in_camera,
        magnitude_grad_viewspace
        > cfg.densification_view_space_position_gradients_threshold,
    )
    per_pixel = magnitude_grad_viewspace / num_affected_pixels
    per_pixel = _nan_to_zero(per_pixel)
    single = jnp.logical_or(
        single,
        jnp.logical_and(
            in_camera,
            per_pixel
            > cfg.densification_view_avg_space_position_gradients_threshold,
        ),
    )

    # multi-frame averaged selections (:232-243)
    mf_view = _nan_to_zero(state.grad_viewspace / state.num_in_camera)
    multi = mf_view > cfg.densification_multi_frame_view_space_position_gradients_threshold
    avg_pixels = _nan_to_zero(state.num_pixels / state.num_in_camera)
    mf_view_avg = _nan_to_zero(state.grad_viewspace_avg / state.num_in_camera)
    multi = jnp.logical_or(
        multi,
        mf_view_avg / jnp.maximum(avg_pixels, 1e-12)
        > cfg.densification_multi_frame_view_pixel_avg_space_position_gradients_threshold,
    )
    mf_pos = _nan_to_zero(state.grad_position_norm / state.num_in_camera)
    multi = jnp.logical_or(
        multi, mf_pos > cfg.densification_multi_frame_position_gradients_threshold
    )

    densify = jnp.logical_and(
        jnp.logical_and(jnp.logical_or(single, multi), valid),
        jnp.logical_not(remove_mask),
    )

    # split vs clone by accumulated pixel footprint (:254-257)
    over = jnp.logical_and(
        densify,
        state.num_pixels > cfg.under_reconstructed_num_pixels_threshold,
    )
    size_reduction = jnp.where(
        over, jnp.log(cfg.gaussian_split_factor_phi), 0.0
    ).astype(jnp.float32)

    grad_pos = state.grad_position / jnp.maximum(
        state.num_in_camera[:, None], 1.0
    )
    grad_pos = _nan_to_zero(grad_pos)

    return DensifyInfo(
        remove_mask=remove_mask,
        densify_mask=densify,
        position_before=scene.xyz,
        size_reduction=size_reduction,
        grad_position=grad_pos,
        over_mask=over,
    )


def _sample_from_gaussian(key, xyz, features):
    """Sample positions from each point's own Gaussian (reference
    GaussianPoint3D.py:390-406: Box-Muller in the ellipsoid frame)."""
    q = features[:, 0:4]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    s = jnp.exp(features[:, 4:7])
    r = quaternion_to_rotation_matrix(q)  # (N, 3, 3)
    eps = jax.random.normal(key, xyz.shape, xyz.dtype)
    return xyz + jnp.einsum("nij,nj->ni", r, eps * s)


def _ellipsoid_foci_offset(features):
    """Center->focus vector of the ellipsoid (reference GaussianPoint3D.py:
    375-388): along the major axis, length sqrt(a^2 - b^2) with a the
    largest and b the SMALLEST semi-axis exp(s) (the reference's
    get_ellipsoid_foci_vector uses min over the axes)."""
    q = features[:, 0:4]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    s = jnp.exp(features[:, 4:7])
    r = quaternion_to_rotation_matrix(q)
    major = jnp.argmax(s, axis=-1)
    a = jnp.max(s, axis=-1)
    b = jnp.min(s, axis=-1)
    c = jnp.sqrt(jnp.maximum(a * a - b * b, 0.0))
    axis = jnp.take_along_axis(r, major[:, None, None], axis=2)[..., 0]
    return axis * c[:, None]


def apply_densify(
    scene: GaussianScene,
    info: DensifyInfo,
    key: jax.Array,
    cfg: ControllerConfig,
) -> GaussianScene:
    """Mutation pass on the post-optimizer-step scene (reference
    _add_densify_points :290-353), fully functional.

    Fill-slot assignment: densify source ranked r (in pool order) lands in
    the r-th invalid slot (pool order) — identical to the reference's
    torch.where(invalid)[0][:k] — realized with two stable sorts.
    """
    n = scene.capacity
    idx = jnp.arange(n, dtype=jnp.int32)

    invalid_after = jnp.logical_or(scene.invalid, info.remove_mask)

    # r-th invalid slot in index order
    slot_key = jnp.where(invalid_after, idx, n + idx)
    slot_of_rank = jax.lax.sort((slot_key, idx), num_keys=1)[1]
    # r-th densify source in index order
    src_key = jnp.where(info.densify_mask, idx, n + idx)
    src_of_rank = jax.lax.sort((src_key, idx), num_keys=1)[1]

    num_densify = jnp.sum(info.densify_mask)
    num_invalid = jnp.sum(invalid_after)
    num_fill = jnp.minimum(num_densify, num_invalid)
    rank = jnp.arange(n, dtype=jnp.int32)
    active = rank < num_fill            # ranks actually filled

    src = src_of_rank                    # (N,) source point per rank
    dst = slot_of_rank                   # (N,) destination slot per rank

    # new-point payload per rank (reference :299-322)
    new_xyz = info.position_before[src]
    new_feat = scene.features[src]
    new_feat = new_feat.at[:, 4:7].add(-info.size_reduction[src][:, None])
    new_oid = scene.object_id[src]

    over = info.over_mask[src]
    k1, k2 = jax.random.split(key)
    # reference order (:323-345): foci offset first, THEN over-points get
    # overwritten by a sample (centered at the stored — possibly offset —
    # position) and under-points move along the accumulated gradient. The
    # grad-move applies regardless of the sampling flag so clones always
    # separate from their source (the trainer selects on the
    # post-optimizer-step scene, so position_before == current xyz).
    if cfg.enable_ellipsoid_offset:
        new_xyz = new_xyz + _ellipsoid_foci_offset(new_feat)
    if cfg.enable_sample_from_point:
        sampled_new = _sample_from_gaussian(k1, new_xyz, new_feat)
    else:
        sampled_new = new_xyz
    new_xyz = jnp.where(
        over[:, None], sampled_new,
        new_xyz + info.grad_position[src] * cfg.under_reconstructed_move_factor,
    )

    # scatter new points into their slots
    dst_masked = jnp.where(active, dst, n)  # out-of-range -> dropped
    xyz = scene.xyz.at[dst_masked].set(new_xyz, mode="drop")
    features = scene.features.at[dst_masked].set(new_feat, mode="drop")
    object_id = scene.object_id.at[dst_masked].set(new_oid, mode="drop")
    invalid = invalid_after.at[dst_masked].set(False, mode="drop")

    # shrink the ORIGINAL split points too (:313-322) and resample their
    # positions (:329-341)
    filled_src_mask = jnp.zeros((n,), bool).at[
        jnp.where(active, src, n)
    ].set(True, mode="drop")
    shrink = jnp.where(filled_src_mask, info.size_reduction, 0.0)
    features = features.at[:, 4:7].add(-shrink[:, None])
    # same ordering as the new-point side: offset first, over-points then
    # overwritten by a resample
    if cfg.enable_ellipsoid_offset:
        off_all = _ellipsoid_foci_offset(features)
        xyz = jnp.where(filled_src_mask[:, None], xyz - off_all, xyz)
    if cfg.enable_sample_from_point:
        resampled = _sample_from_gaussian(k2, xyz, features)
        resample_mask = jnp.logical_and(filled_src_mask, info.over_mask)
        xyz = jnp.where(resample_mask[:, None], resampled, xyz)

    return GaussianScene(
        xyz=xyz, features=features, invalid=invalid, object_id=object_id
    )


def reset_alpha(scene: GaussianScene, cfg: ControllerConfig) -> GaussianScene:
    """Clamp alpha logits down to reset_alpha_value (reference :355-358)."""
    features = scene.features.at[:, 7].set(
        jnp.minimum(scene.features[:, 7], cfg.reset_alpha_value)
    )
    return scene._replace(features=features)
