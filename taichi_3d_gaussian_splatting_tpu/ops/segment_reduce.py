"""Ragged contiguous segment-sum as a Pallas kernel.

Reduces per-key gradient rows (in ORIGINAL key order, where each point's
keys are contiguous: lanes [offsets[p], offsets[p] + counts[p])) to
per-point rows. Replaces the reference backward's atomic adds into
per-point buffers (GaussianPointCloudRasterisation.py:674-696).

Why a kernel: XLA's scatter-add / segment_sum on TPU measured ~170-200 ms
for 2M x 12 rows (see PLAN.md); a prefix-sum + boundary-gather alternative
is fast but numerically unsafe (cancellation against the global prefix
magnitude). This kernel streams the rows once per point-block (sequential
grid, double-buffered WINDOW-sized DMAs) and resolves key->point ownership
with a boolean membership matrix contracted on the MXU:
  out_block (PB, 16) += member (PB, WINDOW) @ rows_window (16, WINDOW)^T.

Input rows are struct-of-arrays (16, cols) like the blend kernels' output;
DMA windows are (16, WINDOW) at WINDOW-aligned lane offsets (the kernel
aligns each block's window itself — membership masking makes the extra
lanes harmless).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 512         # lanes per DMA/matmul step (4 chunks amortize latency)
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
    lo_al = pl.multiple_of((lo // WINDOW) * WINDOW, WINDOW)
    nwin = pl.cdiv(hi - lo_al, WINDOW)

    off_lo = offsets_ref[0, :, 0:1]   # (PB, 1) segment starts
    off_hi = offsets_ref[0, :, 1:2]   # (PB, 1) segment ends

    def get_dma(slot, w):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(lo_al + w * WINDOW, WINDOW)],
            row_ref.at[slot], sem.at[slot],
        )

    @pl.when(nwin > 0)
    def _():
        get_dma(0, 0).start()

    out_ref[0] = jnp.zeros_like(out_ref[0])

    def body(w, acc):
        @pl.when(w + 1 < nwin)
        def _():
            get_dma((w + 1) % 2, w + 1).start()

        get_dma(w % 2, w).wait()
        base = lo_al + w * WINDOW
        gid = base + jax.lax.broadcasted_iota(
            jnp.int32, (POINT_BLOCK, WINDOW), 1
        )  # global key index, broadcast over points
        member = jnp.logical_and(gid >= off_lo, gid < off_hi).astype(
            jnp.float32
        )
        return acc + jax.lax.dot_general(
            member, row_ref[w % 2], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out_ref[0] = jax.lax.fori_loop(
        0, nwin, body, jnp.zeros((POINT_BLOCK, 16), jnp.float32)
    )


def segment_reduce(
    rows: jnp.ndarray,      # (16, cols) per-key rows, original order (SoA)
    offsets: jnp.ndarray,   # (N,) exclusive cumsum of counts
    counts: jnp.ndarray,    # (N,)
    *, interpret: bool = False,
) -> jnp.ndarray:
    """Per-point sums (N_padded_to_block, 16). ``rows`` must be padded with
    at least WINDOW extra lanes beyond the largest segment end."""
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
            pltpu.VMEM((2, 16, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
