"""bf16-pair bit packing: two f32 rows in one f32-carried 32-bit lane.

Used to keep `lax.sort` operand counts/bytes down (sort cost is ~linear
in operand bytes and cliffs above 12 operands — ops/tiling.py): pairs of
columns that tolerate bf16 precision ride the sort packed, and consumers
(the Pallas blend kernels, the dense reference renderer) unpack with two
integer ops per row. The carrier is only ever MOVED (sort payloads,
DMA) or bit-manipulated — never fed to float arithmetic — so NaN-looking
or denormal bit patterns are harmless.

Two packing modes:
- `pack_bf16_pair_rne`: round-to-nearest-even bf16 (error <= 0.5 ulp,
  2^-9 relative) — for values CONSUMED by the render math (conic
  coefficients, colors), where truncation's one-sided bias would show.
- `pack_bf16_pair_trunc`: truncation (an f32's top 16 bits ARE its bf16
  bits) — for statistics where bias is irrelevant and the extra op
  matters less than clarity (kept for the backward's stat rows).

bf16 -> f32 widening is exact (bit-zero-extension), so unpack returns
EXACTLY the bf16 value: every consumer of a packed column sees the same
f32, keeping kernel-vs-oracle comparisons bitwise meaningful.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bits(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _carrier(u: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def round_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> nearest bf16, returned as (exactly representable) f32."""
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def pack_bf16_pair_rne(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(bf16_rne(a) << 16 | bf16_rne(b)) as an f32-carried bit pattern."""
    ab = _bits(round_bf16(a))           # low 16 bits are zero
    bb = _bits(round_bf16(b)) >> 16
    return _carrier(ab | bb)


def pack_bf16_pair_trunc(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Truncating variant (round-toward-zero in magnitude)."""
    return _carrier((_bits(a) & jnp.uint32(0xFFFF0000)) | (_bits(b) >> 16))


def unpack_bf16_pair(p: jnp.ndarray):
    """One f32 carrier -> (a, b) f32 rows; exact inverse of both packs."""
    u = _bits(p)
    a = _carrier(u & jnp.uint32(0xFFFF0000))
    b = _carrier(u << 16)
    return a, b
