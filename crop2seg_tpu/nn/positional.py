"""Date positional encoders.

Re-implementations of /root/reference/src/backbones/positional_encoding.py:
- ``PositionalEncoder``: interleaved sin/cos table over day offsets with
  period T (reference :7-43), optionally followed by a learned Linear.
- ``AbsolutePositionalEncoder``: one-hot(day-of-year, 365) -> Linear
  (reference :46-73). The one-hot is algebraically an embedding lookup, so we
  implement it as ``W[doy]`` — one gather instead of a (B*T, 365) matmul.

Both tile the per-head table ``repeat`` times along channels to span d_model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoid_table(positions: jax.Array, d: int, period: float = 1000.0,
                   offset: int = 0, dtype=jnp.float32) -> jax.Array:
    """positions (..., T) -> table (..., T, d) with sin at even dims, cos at odd."""
    i = jnp.arange(offset, offset + d)
    denom = jnp.power(jnp.asarray(period, jnp.float32), 2 * (i // 2) / d)
    angles = positions[..., None].astype(jnp.float32) / denom
    table = jnp.where(i % 2 == 0, jnp.sin(angles), jnp.cos(angles))
    return table.astype(dtype)


class PositionalEncoder(nn.Module):
    """Sinusoidal encoder over relative day offsets (reference :7-43)."""

    d_model: int            # per-head width (d_model_total // n_head)
    T: float = 1000.0
    repeat: int | None = None
    offset: int = 0
    add_linear: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, positions: jax.Array) -> jax.Array:
        table = sinusoid_table(positions, self.d_model, self.T, self.offset,
                               self.dtype or jnp.float32)
        if self.repeat is not None:
            table = jnp.tile(table, (1,) * (table.ndim - 1) + (self.repeat,))
        if self.add_linear:
            table = nn.Dense(table.shape[-1], dtype=self.dtype, name="fc")(table)
        return table


class AbsolutePositionalEncoder(nn.Module):
    """Learned day-of-year embedding (reference :46-73).

    Equivalent to Linear(one_hot(doy, 365)): output = W[:, doy] + b, realised
    as an nn.Embed gather plus bias. Out-of-range days (e.g. leap-day 366)
    contribute only the bias, matching one-hot-of-zeros semantics.
    """

    d_model: int
    repeat: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, doy: jax.Array) -> jax.Array:
        w = self.param("embedding", nn.initializers.lecun_normal(), (365, self.d_model), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.d_model,), jnp.float32)
        idx = doy.astype(jnp.int32)
        in_range = (idx >= 0) & (idx < 365)
        emb = jnp.where(in_range[..., None], w[jnp.clip(idx, 0, 364)], 0.0) + b
        if self.repeat is not None:
            emb = jnp.tile(emb, (1,) * (emb.ndim - 1) + (self.repeat,))
        return emb.astype(self.dtype or jnp.float32)
