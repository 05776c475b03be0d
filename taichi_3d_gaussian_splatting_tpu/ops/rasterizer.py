"""The differentiable tile rasterizer: full pipeline + custom VJP.

Behavioral reference: GaussianPointCloudRasterisation.py:775-1204 (the
torch.autograd.Function orchestrating K1..K7). TPU-native layout:

  attrs (pure jnp, autodiff)  ->  tile keys + sorted blend table (non-diff:
      Pallas one-hot expansion kernel, attributes riding the key sort as
      payloads)  ->  Pallas blend fwd  ->  image
  backward: Pallas blend bwd -> per-key grad rows -> payload-riding
      regroup sort to expansion order -> Pallas ragged segment-reduce
      -> per-point raw-attr grads
      -> (outside, via jax.vjp of the attrs fn) -> param grads

The custom_vjp boundary is `_blend_core`, whose differentiable input is the
per-point raw attribute bundle; everything upstream (projection, EWA, SH,
sigmoid) differentiates with JAX autodiff, replacing the reference's
hand-derived Jacobians (its backward phase 2, :707-772).

Gradient semantics:
- only the rgb image output backpropagates (depth/alpha/count cotangents
  are ignored), matching the reference (:1025-1163);
- the alpha clamp at 0.99 is straight-through, matching the reference;
- unlike the reference (which approximates d_cov2d by the filtered conic,
  utils.py:335-348), the kernel emits EXACT conic/rescale gradients and the
  conic -> cov2d -> (q, s) chain is differentiated exactly by autodiff.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from taichi_3d_gaussian_splatting_tpu.ops import blend_pallas
from taichi_3d_gaussian_splatting_tpu.ops import packing
from taichi_3d_gaussian_splatting_tpu.ops import tiling
from taichi_3d_gaussian_splatting_tpu.ops.attributes import (
    compute_point_attributes,
    frustum_cull_mask,
)
from taichi_3d_gaussian_splatting_tpu.ops.segment_reduce import segment_reduce
from taichi_3d_gaussian_splatting_tpu.ops.transforms import (
    inverse_qt,
)

CHUNK = blend_pallas.CHUNK


@dataclass(frozen=True)
class RasterizerConfig:
    """Mirrors GaussianPointCloudRasterisationConfig (reference :777-786)
    plus TPU-specific static sizing knobs."""

    near_plane: float = 0.8
    far_plane: float = 1000.0
    depth_to_sort_key_scale: float = 100.0
    rgb_only: bool = False
    grad_color_factor: float = 5.0
    grad_high_order_color_factor: float = 1.0
    grad_s_factor: float = 0.5
    grad_q_factor: float = 1.0
    grad_alpha_factor: float = 20.0
    # TPU static sizing
    tile_size: int = 32          # tile width in pixels (reference: 16, CUDA)
    tile_h: Optional[int] = None # tile height; None = square (tile_size,
                                 # the measured-optimal shape at every
                                 # bench point count — ops/tiling.py).
    key_cap: int = 2 ** 21       # static capacity of the tile-key buffer
    extra_info: bool = True      # densification stats in backward
    slim: bool = False           # training fast path: blend only the rgb
                                 # channels (no depth/alpha/count images —
                                 # they feed TB image grids only, which
                                 # re-render on demand) and drop the depth
                                 # column from the key sort, while KEEPING
                                 # the orig_slot payload the backward
                                 # regroup needs. ~4 ms/step at 428k.
                                 # Mutually exclusive with rgb_only.
    exact_tile_cull: bool = True # retire (point, tile) pairs whose max
                                 # in-tile alpha < 1/255 to the sentinel
                                 # inside the expand kernel (bit-identical
                                 # output, smaller blend ranges)
    blend_chunk: int = 128       # key lanes per blend-kernel compute
                                 # sub-chunk (multiple of 128; wider chunks
                                 # pay quadratic MXU cumsum width)
    blend_strips: int = 1        # saturation-termination granularity: the
                                 # tile's pixel rows split into this many
                                 # strips, each carrying its own early-exit
                                 # flag (output-identical; strips that
                                 # saturate early stop paying pair work
                                 # while deeper rows continue). Must divide
                                 # tile height with 8-aligned strip rows.
    candidate_mode: str = "partition"  # "partition": N-length sort packs
                                 # key owners into a prefix (robust at any
                                 # visibility density); "direct": skip that
                                 # sort, candidate runs interleave
                                 # zero-count lanes (needs cand_scale >=
                                 # TileKeys.cand_scale_req or surplus keys
                                 # drop)
    cand_scale: int = 1          # direct-mode candidate window multiplier
    pack_sort_colors: bool = False  # rgb_only inference opt-in: r and g
                                 # ride the key sort as one bf16 pair
                                 # (<= 2^-9 color rounding, under display
                                 # quantization; fails the 1e-4 oracle
                                 # gates by design, so never a default)
    interpret: bool = False      # run Pallas kernels in interpreter mode
    cull_pad_v_tiles: Optional[int] = None  # vertical cull pad override
                                 # (tile ROWS of tile_h px); band-sharded
                                 # rendering widens it

    def __post_init__(self):
        if self.slim and self.rgb_only:
            raise ValueError(
                "slim is the training fast path (keeps backward payloads); "
                "rgb_only is the inference fast path — pick one")
        if self.tile_h is not None and self.tile_size % self.tile_h != 0:
            # datasets crop images to tile_size multiples (both axes);
            # a tile_h that divides tile_size keeps every such image
            # divisible into tile rows
            raise ValueError(
                f"tile_h={self.tile_h} must divide tile_size={self.tile_size}")


class Camera(NamedTuple):
    """Pinhole camera. Frame: x right, y down, z forward (Camera.py:17)."""

    K: jnp.ndarray        # (3, 3) intrinsics
    width: int
    height: int


class RasterizeOutput(NamedTuple):
    rgb: jnp.ndarray      # (H, W, 3)
    depth: jnp.ndarray    # (H, W) alpha-weighted normalized depth
    alpha: jnp.ndarray    # (H, W) accumulated opacity (1 - T_final)
    count: jnp.ndarray    # (H, W) number of blended splats per pixel


class RawAttrs(NamedTuple):
    """Differentiable inputs of the blend core, all f32, dense over N."""

    uv: jnp.ndarray       # (N, 2)
    cov2d: jnp.ndarray    # (N, 3) unfiltered (a, b, c)
    conic: jnp.ndarray    # (N, 4) filtered inverse + rescale
    opacity: jnp.ndarray  # (N,)
    color: jnp.ndarray    # (N, 3)
    depth: jnp.ndarray    # (N,)


class GradStats(NamedTuple):
    """Densification statistics from the backward pass (the reference's
    BackwardValidPointHookInput, :806-817), dense over pool slots."""

    grad_uv: jnp.ndarray                   # (N, 2) viewspace position grad
    magnitude_grad_viewspace: jnp.ndarray  # (N,) sum over pixels of |grad_uv|
    num_affected_pixels: jnp.ndarray       # (N,)
    num_overlap_tiles: jnp.ndarray         # (N,)
    in_camera: jnp.ndarray                 # (N,) bool visibility this frame
    magnitude_grad_viewspace_on_image: jnp.ndarray  # (H, W, 2)


def _cfg_tile(cfg: RasterizerConfig) -> tuple:
    """(tile_w, tile_h) of a config (tile_h=None means square)."""
    th = cfg.tile_size if cfg.tile_h is None else cfg.tile_h
    return (cfg.tile_size, th)


def _tiles_to_image(tiles: jnp.ndarray, tiles_x: int, tiles_y: int, tile):
    """(num_tiles, tile_w*tile_h, C) -> (H, W, C)."""
    tw, th = tiling.tile_wh(tile)
    c = tiles.shape[-1]
    img = tiles.reshape(tiles_y, tiles_x, th, tw, c)
    return img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * th, tiles_x * tw, c)


def _image_to_tiles(img: jnp.ndarray, tiles_x: int, tiles_y: int, tile):
    tw, th = tiling.tile_wh(tile)
    c = img.shape[-1]
    t = img.reshape(tiles_y, th, tiles_x, tw, c)
    return t.transpose(0, 2, 1, 3, 4).reshape(tiles_y * tiles_x, th * tw, c)


def _zero_cot(x):
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# ---------------------------------------------------------------------------
# custom_vjp blend core
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _blend_core(raw: RawAttrs, table: jnp.ndarray, keys: tiling.TileKeys,
                tile: int, grid_hw: tuple, cfg: RasterizerConfig):
    out, _ = _blend_core_fwd(raw, table, keys, tile, grid_hw, cfg)
    return out


def _blend_core_fwd(raw: RawAttrs, table: jnp.ndarray, keys: tiling.TileKeys,
                    tile: int, grid_hw: tuple, cfg: RasterizerConfig):
    # `table` is the sorted attribute table from the tiling stage (the
    # attribute values rode the key sort as payloads); it is numerically a
    # function of `raw` but arrives stop_gradient'd — the manual backward
    # below (segment-reduce of per-key rows) IS its adjoint, returned as
    # the cotangent of `raw`.
    tiles_x, tiles_y = grid_hw
    out_tiles = blend_pallas.blend_forward(
        table, keys.tile_start, keys.tile_end,
        tile=tile, tiles_x=tiles_x, tiles_y=tiles_y,
        rgb_only=cfg.rgb_only or cfg.slim,
        chunk=cfg.blend_chunk, strips=cfg.blend_strips,
        interpret=cfg.interpret,
    )
    residuals = (raw, keys, table, out_tiles)
    return out_tiles, residuals


def _blend_core_bwd(tile, grid_hw, cfg, residuals, d_out_tiles):
    raw, keys, table, out_tiles = residuals
    d_raw, _ = _blend_bwd_impl(
        raw, keys, table, out_tiles, d_out_tiles[..., 0:3], tile, grid_hw, cfg
    )
    return d_raw, jnp.zeros_like(table), jax.tree.map(_zero_cot, keys)


def _blend_bwd_impl(raw, keys, table, out_tiles, d_rgb_tiles, tile, grid_hw,
                    cfg):
    """Shared by the custom_vjp and the trainer's explicit backward (which
    also needs the densification statistics)."""
    tiles_x, tiles_y = grid_hw

    d_table_sorted, imggrad_tiles = blend_pallas.blend_backward(
        table, keys.tile_start, keys.tile_end, d_rgb_tiles,
        out_tiles[..., 0:3],
        tile=tile, tiles_x=tiles_x, tiles_y=tiles_y,
        extra_info=cfg.extra_info,
        # the per-pixel |grad_uv| image is a TB diagnostic the slim
        # training path skips (its kernel accumulate + image transpose
        # cost ~1 ms/step; nothing in the hot loop consumes it)
        imggrad=not cfg.slim,
        chunk=cfg.blend_chunk, strips=cfg.blend_strips,
        interpret=cfg.interpret,
    )

    # tile-layout order -> original-key order, realized as one
    # payload-riding sort (tiling.regroup_rows_by_slot), then per-point
    # rows via the ragged segment reduction. No masking/padding glue: the
    # blend backward zero-fills unwritten lanes (aliased output) and the
    # reduction kernel clamps its windows to the array. Sort cost is
    # ~linear in operand bytes (and cliffs above 12 operands: 13 measured
    # 5x slower at 2M lanes), so only meaningful rows ride (row 9 is
    # structurally zero; rows 12-15 unused) and the two densification
    # STAT rows (|grad_uv| magnitude, affected-pixel count) ride as ONE
    # bf16 pair packed into an f32 bit pattern — they only feed densify
    # heuristics, where truncating to 8 mantissa bits is harmless, and
    # the pair is unpacked (3 rows of elementwise traffic, ~free) before
    # the per-point reduction so sums stay in f32. 11 sort operands.
    packed = packing.pack_bf16_pair_trunc(
        d_table_sorted[10], d_table_sorted[11])
    d_rows = jnp.concatenate(
        [d_table_sorted[0:9], packed[None]], axis=0
    )  # (10, cap): d_u,d_v,d_ca,d_cb,d_cc,d_logro,d_r,d_g,d_b,mag|npix
    d_orig10 = tiling.regroup_rows_by_slot(
        d_rows, keys.orig_slot, cfg.key_cap
    )  # (10, key_cap)
    mag_o, npix_o = packing.unpack_bf16_pair(d_orig10[9])
    d_orig = jnp.concatenate(
        [d_orig10[0:9], mag_o[None], npix_o[None]], axis=0
    )  # (11, key_cap)
    # (11, n) SoA rows: per-field extraction is contiguous row slicing
    per_point = segment_reduce(
        d_orig, keys.offsets, keys.counts, interpret=cfg.interpret
    )[:, : raw.uv.shape[0]]

    # Split d_log(rescale*opacity) into the two exact cotangents.
    d_logro = per_point[5]
    d_raw = RawAttrs(
        uv=jnp.stack([per_point[0], per_point[1]], axis=-1),
        cov2d=jnp.zeros_like(raw.cov2d),
        conic=jnp.stack(
            [per_point[2], per_point[3], per_point[4],
             d_logro / jnp.maximum(raw.conic[:, 3], 1e-12)],
            axis=-1,
        ),
        opacity=d_logro / jnp.maximum(raw.opacity, 1e-12),
        color=jnp.stack([per_point[6], per_point[7], per_point[8]],
                        axis=-1),
        depth=jnp.zeros_like(raw.depth),
    )
    stats = (per_point[9], per_point[10], imggrad_tiles)
    return d_raw, stats


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def compute_raw_attrs(
    xyz, features, q_pointcloud_camera, t_pointcloud_camera, camera: Camera,
    sh_max_band=3, point_object_id: Optional[jnp.ndarray] = None,
):
    """Project pool slots to screen space; differentiable w.r.t. xyz/features.

    ``q/t_pointcloud_camera`` is the camera (or per-object) pose in the
    world frame, shape (4,)/(3,) or (K, 4)/(K, 3) with ``point_object_id``
    selecting per-point poses (reference Input dataclass :788-804).
    """
    if point_object_id is not None and q_pointcloud_camera.ndim == 2:
        q_pc = q_pointcloud_camera[point_object_id]
        t_pc = t_pointcloud_camera[point_object_id]
    else:
        q_pc = q_pointcloud_camera.reshape(4)
        t_pc = t_pointcloud_camera.reshape(3)
    q_cw, t_cw = inverse_qt(q_pc, t_pc)

    if q_cw.ndim == 1:
        attrs = compute_point_attributes(
            xyz, features, q_cw, t_cw, camera.K, t_pc, sh_max_band
        )
    else:
        attrs = jax.vmap(
            lambda x, f, q, t, c: compute_point_attributes(
                x[None], f[None], q, t, camera.K, c, sh_max_band
            )
        )(xyz, features, q_cw, t_cw, t_pc)
        attrs = jax.tree.map(lambda a: a.reshape((xyz.shape[0],) + a.shape[2:]),
                             attrs)
    raw = RawAttrs(
        uv=attrs.uv, cov2d=attrs.cov2d, conic=attrs.conic,
        opacity=attrs.opacity, color=attrs.color, depth=attrs.xyz_cam[:, 2],
    )
    return raw, attrs.radius_xy


def build_keys(raw: RawAttrs, radius, invalid_mask, camera: Camera,
               cfg: RasterizerConfig):
    """Non-differentiable tiling stage (applies stop_gradient internally).

    Returns (keys, sorted blend table, visible mask); the table's attribute
    columns ride the key sort as payloads (see ops/tiling.py).
    """
    sg = jax.lax.stop_gradient
    visible = frustum_cull_mask(
        sg(raw.uv), sg(raw.depth), invalid_mask, camera.width, camera.height,
        cfg.near_plane, cfg.far_plane, _cfg_tile(cfg),
        boundary_tiles_v=cfg.cull_pad_v_tiles,
    )
    # sanitize BEFORE the log so NaN features blend as fully transparent
    # (log(1e-37) = -85), matching the pre-payload finalize_table guard
    resc = jnp.where(jnp.isfinite(raw.conic[:, 3]), raw.conic[:, 3], 0.0)
    op = jnp.where(jnp.isfinite(raw.opacity), raw.opacity, 0.0)
    logro = jnp.log(jnp.maximum(resc * op, 1e-37))
    attr_cols = jnp.stack(
        [raw.uv[:, 0], raw.uv[:, 1], raw.conic[:, 0], raw.conic[:, 1],
         raw.conic[:, 2], logro, raw.color[:, 0], raw.color[:, 1],
         raw.color[:, 2], raw.depth], axis=0,
    )
    keys, table = tiling.build_tile_keys_and_table(
        sg(raw.uv), sg(raw.depth), sg(radius), visible,
        camera.width, camera.height, _cfg_tile(cfg), cfg.key_cap,
        cfg.depth_to_sort_key_scale, attr_cols=sg(attr_cols),
        rgb_only=cfg.rgb_only, slim=cfg.slim,
        exact_tile_cull=cfg.exact_tile_cull,
        candidate_mode=cfg.candidate_mode, cand_scale=cfg.cand_scale,
        pack_colors=cfg.pack_sort_colors,
        interpret=cfg.interpret,
    )
    return keys, table, visible


def _assemble(out_tiles, camera: Camera, cfg: RasterizerConfig):
    tile = _cfg_tile(cfg)
    tiles_x = camera.width // tile[0]
    tiles_y = camera.height // tile[1]
    if cfg.rgb_only or cfg.slim:
        # only rgb is meaningful (reference K6 rgb_only, :342); slicing
        # before the tile->image transpose keeps the relayout to 3 channels
        rgb = _tiles_to_image(out_tiles[..., 0:3], tiles_x, tiles_y, tile)
        zero = jnp.zeros(rgb.shape[:2], jnp.float32)
        return RasterizeOutput(rgb=rgb, depth=zero, alpha=zero, count=zero)
    img = _tiles_to_image(out_tiles, tiles_x, tiles_y, tile)
    rgb = img[..., 0:3]
    depth = img[..., 3] / jnp.maximum(img[..., 4], 1e-6)
    alpha = 1.0 - img[..., 6]
    count = img[..., 5]
    return RasterizeOutput(rgb=rgb, depth=depth, alpha=alpha, count=count)


def rasterize(
    xyz: jnp.ndarray,
    features: jnp.ndarray,
    invalid_mask: jnp.ndarray,
    q_pointcloud_camera: jnp.ndarray,
    t_pointcloud_camera: jnp.ndarray,
    camera: Camera,
    cfg: RasterizerConfig,
    sh_max_band=3,
    point_object_id: Optional[jnp.ndarray] = None,
    return_num_keys: bool = False,
):
    """Differentiable rendering of the scene into a camera view.

    Equivalent of GaussianPointCloudRasterisation.forward (:1184-1204);
    requires camera.width/height divisible by cfg.tile_size.

    With ``return_num_keys`` also returns the TRUE tile-key total (int32
    scalar, may exceed cfg.key_cap) so callers can detect silent key drops
    and refit the static capacity — the reference sizes its buffers to the
    exact per-frame M (GaussianPointCloudRasterisation.py:873-884), so it
    has no equivalent failure mode.
    """
    tile = _cfg_tile(cfg)
    assert camera.width % tile[0] == 0
    assert camera.height % tile[1] == 0
    raw, radius = compute_raw_attrs(
        xyz, features, q_pointcloud_camera, t_pointcloud_camera, camera,
        sh_max_band, point_object_id,
    )
    keys, table, _ = build_keys(raw, radius, invalid_mask, camera, cfg)
    grid_hw = (camera.width // tile[0], camera.height // tile[1])
    out_tiles = _blend_core(raw, table, keys, tile, grid_hw, cfg)
    out = _assemble(out_tiles, camera, cfg)
    if return_num_keys:
        return out, keys.total
    return out


# ---------------------------------------------------------------------------
# explicit forward/backward (trainer path: exposes densification statistics,
# the reference's backward_valid_point_hook contract :1127-1142)
# ---------------------------------------------------------------------------


class RenderContext(NamedTuple):
    raw: RawAttrs
    keys: tiling.TileKeys
    table: jnp.ndarray
    out_tiles: jnp.ndarray
    visible: jnp.ndarray


def rasterize_fwd_ctx(
    xyz, features, invalid_mask, q_pointcloud_camera, t_pointcloud_camera,
    camera: Camera, cfg: RasterizerConfig, sh_max_band=3,
    point_object_id=None, with_pose_grads: bool = False,
):
    """Forward pass returning the output plus residuals for rasterize_bwd.

    With ``with_pose_grads`` the saved vjp also produces cotangents for
    (q, t) — rasterize_bwd then returns a 4-tuple (d_xyz, d_features,
    d_q, d_t) instead of a pair (camera pose refinement)."""

    # radius is consumed only by the (stop_gradient'd) tiling stage, so cut
    # it out of the vjp: its Jacobian contains sqrt(0) = inf/NaN entries
    # for perfectly isotropic splats on the optical axis (eigenvalue-gap
    # term), and even a zero cotangent would propagate 0 * NaN = NaN into
    # d_xyz / d_q / d_t.
    if with_pose_grads:
        def attrs_fn(x, f, q, t):
            raw, radius = compute_raw_attrs(
                x, f, q, t, camera, sh_max_band, point_object_id,
            )
            return raw, jax.lax.stop_gradient(radius)

        (raw, radius), attrs_vjp = jax.vjp(
            attrs_fn, xyz, features, q_pointcloud_camera,
            t_pointcloud_camera)
    else:
        def attrs_fn(x, f):
            raw, radius = compute_raw_attrs(
                x, f, q_pointcloud_camera, t_pointcloud_camera, camera,
                sh_max_band, point_object_id,
            )
            return raw, jax.lax.stop_gradient(radius)

        (raw, radius), attrs_vjp = jax.vjp(attrs_fn, xyz, features)
    keys, table, visible = build_keys(raw, radius, invalid_mask, camera, cfg)
    tile = _cfg_tile(cfg)
    grid_hw = (camera.width // tile[0], camera.height // tile[1])
    out_tiles, _ = _blend_core_fwd(raw, table, keys, tile, grid_hw, cfg)
    out = _assemble(out_tiles, camera, cfg)
    ctx = RenderContext(raw=raw, keys=keys, table=table, out_tiles=out_tiles,
                        visible=visible)
    return out, ctx, attrs_vjp


def rasterize_bwd(
    ctx: RenderContext, attrs_vjp, d_rgb: jnp.ndarray, camera: Camera,
    cfg: RasterizerConfig,
):
    """Manual backward from the image cotangent to parameter gradients.

    Returns (grads, GradStats) where grads is (d_xyz, d_features) — or
    (d_xyz, d_features, d_q, d_t) when the ctx was built with
    with_pose_grads. Matches the gradient semantics of the reference
    backward (:1025-1163) except that grad-factor scaling and SH-band
    masking are applied by the trainer (optax transform / the forward band
    mask respectively).
    """
    tile = _cfg_tile(cfg)
    tiles_x = camera.width // tile[0]
    tiles_y = camera.height // tile[1]
    d_rgb_tiles = _image_to_tiles(d_rgb, tiles_x, tiles_y, tile)
    d_raw, (mag, npix, imggrad_tiles) = _blend_bwd_impl(
        ctx.raw, ctx.keys, ctx.table, ctx.out_tiles, d_rgb_tiles, tile,
        (tiles_x, tiles_y), cfg,
    )
    grads = attrs_vjp(
        (d_raw, jnp.zeros((ctx.raw.depth.shape[0], 2), jnp.float32)))
    imggrad_img = (
        # kernel skipped the accumulate: a (1, 1, 2) placeholder instead
        # of materializing an (H, W, 2) zeros image every step (~0.4 ms
        # through the scan carry); nothing in the hot loop consumes it
        jnp.zeros((1, 1, 2), jnp.float32)
        if cfg.slim
        else _tiles_to_image(imggrad_tiles, tiles_x, tiles_y, tile))
    stats = GradStats(
        grad_uv=d_raw.uv,
        magnitude_grad_viewspace=mag,
        num_affected_pixels=npix,
        num_overlap_tiles=ctx.keys.counts,
        in_camera=ctx.visible,
        magnitude_grad_viewspace_on_image=imggrad_img,
    )
    return grads, stats
