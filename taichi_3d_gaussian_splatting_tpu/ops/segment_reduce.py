"""Ragged contiguous segment-sum as a Pallas kernel.

Reduces per-key gradient rows (in ORIGINAL key order, where each point's
keys are contiguous: lanes [offsets[p], offsets[p] + counts[p])) to
per-point rows. Replaces the reference backward's atomic adds into
per-point buffers (GaussianPointCloudRasterisation.py:674-696).

Why a kernel: XLA's scatter-add / segment_sum on TPU measured ~170-200 ms
for 2M x 12 rows (see PLAN.md); this kernel streams the rows once
(sequential grid) and resolves key->point ownership with a boolean
membership matrix contracted on the MXU:
  out_block (PB, 16) += member (PB, CHUNK) @ rows_chunk (16, CHUNK)^T.

Input rows are struct-of-arrays (16, cols) like the blend kernels' output;
DMA windows are (16, CHUNK) at CHUNK-aligned lane offsets (the kernel
aligns each block's window itself — membership masking makes the extra
lanes harmless).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
POINT_BLOCK = 256


def _kernel(
    # scalar prefetch
    block_lo_ref, block_hi_ref,
    # inputs
    offsets_ref,   # (1, PB, 2) block slice of [seg_lo, seg_hi], in VMEM
    rows_hbm,      # (16, cols) per-key rows, HBM
    # outputs
    out_ref,       # (1, PB, 16) per-point sums
    # scratch
    row_ref, sem,
):
    b = pl.program_id(0)
    lo = block_lo_ref[b]
    hi = block_hi_ref[b]
    lo_al = pl.multiple_of((lo // CHUNK) * CHUNK, CHUNK)
    nch = pl.cdiv(hi - lo_al, CHUNK)

    off_lo = offsets_ref[0, :, 0:1]   # (PB, 1) segment starts
    off_hi = offsets_ref[0, :, 1:2]   # (PB, 1) segment ends

    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(c, _):
        base = lo_al + c * CHUNK
        dma = pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(base, CHUNK)], row_ref, sem
        )
        dma.start()
        dma.wait()
        gid = base + jax.lax.broadcasted_iota(
            jnp.int32, (POINT_BLOCK, CHUNK), 1
        )  # global key index, broadcast over points
        member = jnp.logical_and(gid >= off_lo, gid < off_hi).astype(
            jnp.float32
        )
        out_ref[0] = out_ref[0] + jax.lax.dot_general(
            member, row_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


def segment_reduce(
    rows: jnp.ndarray,      # (16, cols) per-key rows, original order (SoA)
    offsets: jnp.ndarray,   # (N,) exclusive cumsum of counts
    counts: jnp.ndarray,    # (N,)
    *, interpret: bool = False,
) -> jnp.ndarray:
    """Per-point sums (N_padded_to_block, 16). ``rows`` must be padded with
    at least CHUNK extra lanes beyond the largest segment end."""
    n = offsets.shape[0]
    nb = (n + POINT_BLOCK - 1) // POINT_BLOCK
    n_pad = nb * POINT_BLOCK
    seg_lo = jnp.pad(offsets, (0, n_pad - n))
    seg_hi = jnp.pad(offsets + counts, (0, n_pad - n))
    block_lo = seg_lo[:: POINT_BLOCK].astype(jnp.int32)
    block_hi = jnp.maximum(
        seg_hi.reshape(nb, POINT_BLOCK).max(axis=1), block_lo
    ).astype(jnp.int32)
    off_pair = jnp.stack([seg_lo, seg_hi], axis=-1).reshape(nb, POINT_BLOCK, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, POINT_BLOCK, 2), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, POINT_BLOCK, 16), lambda b, *_: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((16, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, POINT_BLOCK, 16), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(block_lo, block_hi, off_pair.astype(jnp.int32), rows)
    return out.reshape(n_pad, 16)
