"""Bucket histogram as a Pallas kernel (tile-range computation).

Replaces jnp.searchsorted for the per-tile key ranges: both its lowerings
are slow on TPU for this shape (binary search: ~14 us per query element;
method='sort': ~16 ms at 2M keys — it re-sorts and scatters). Counting
bucket occupancies directly streams the 2M tile ids once and reduces
one-hot blocks on the VPU: ~1.5 ms.

bounds = exclusive-cumsum(histogram) reproduces searchsorted(side='left')
exactly because the ids are bucketed integers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048  # keys per grid step


def _kernel(ids_ref, out_ref, acc_ref, *, num_buckets_pad: int):
    b = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(b == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # padding/out-of-range lanes were mapped to num_buckets_pad by the
    # host side, which matches no bucket column — no in-kernel masking
    ids = ids_ref[:].reshape(BLOCK, 1)
    buckets = jax.lax.broadcasted_iota(
        jnp.int32, (BLOCK, num_buckets_pad), 1
    )
    onehot = (ids == buckets).astype(jnp.float32)
    acc_ref[:] = acc_ref[:] + jnp.sum(onehot, axis=0, keepdims=True)

    @pl.when(b == nb - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(jnp.int32)


def bucket_histogram(ids: jnp.ndarray, num_buckets: int,
                     interpret: bool = False) -> jnp.ndarray:
    """Counts of each bucket id in [0, num_buckets) over a 1-D i32 array.

    Values outside the range are ignored. The input length is padded to a
    BLOCK multiple internally.
    """
    n = ids.shape[0]
    # f32 accumulator: counts above 2^24 would silently round
    assert n < 2 ** 24, f"histogram input too long for f32 counts: {n}"
    nb_pad = ((num_buckets + 127) // 128) * 128
    if n == 0:  # grid=(0,) would never write the output block
        return jnp.zeros((num_buckets,), jnp.int32)
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    ids_p = jnp.pad(ids, (0, n_pad - n), constant_values=nb_pad)
    ids_p = jnp.where(
        jnp.logical_and(ids_p >= 0, ids_p < num_buckets), ids_p, nb_pad
    )

    import functools

    out = pl.pallas_call(
        functools.partial(_kernel, num_buckets_pad=nb_pad),
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda b: (b,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb_pad), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, nb_pad), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ids_p)
    return out[0, :num_buckets]
