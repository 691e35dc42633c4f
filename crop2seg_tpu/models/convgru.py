"""ConvGRU recurrent baseline via lax.scan.

Re-design of /root/reference/src/backbones/convgru.py:10-226; cell math at
:54-59 (z/r from one conv, candidate from a second conv on [x, r*h],
new_state = (1-z)*h + z*h_cand).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.layers import Conv2d


class ConvGRUCell(nn.Module):
    hidden_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array):
        pad = self.kernel_size // 2
        combined = jnp.concatenate([x, h], axis=-1)
        zr = Conv2d(features=2 * self.hidden_dim, kernel_size=self.kernel_size,
                    stride=1, padding=pad, padding_mode="zeros",
                    use_bias=self.use_bias, dtype=self.dtype,
                    name="in_conv")(combined)
        z, r = jnp.split(nn.sigmoid(zr), 2, axis=-1)
        cand = Conv2d(features=self.hidden_dim, kernel_size=self.kernel_size,
                      stride=1, padding=pad, padding_mode="zeros",
                      use_bias=self.use_bias, dtype=self.dtype,
                      name="out_conv")(jnp.concatenate([x, r * h], axis=-1))
        h_next = (1 - z) * h + z * jnp.tanh(cand)
        return h_next, h_next


class ConvGRU(nn.Module):
    hidden_dim: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array):
        b, t, h, w, _ = x.shape
        cell = nn.scan(
            ConvGRUCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )(hidden_dim=self.hidden_dim, kernel_size=self.kernel_size,
          dtype=self.dtype, name="cell")
        init = jnp.zeros((b, h, w, self.hidden_dim), x.dtype)
        h_t, outputs = cell(init, x)
        return outputs, h_t


class ConvGRUSeg(nn.Module):
    """ConvGRU_Seg (reference convgru.py:199-226): classify the final hidden
    state."""

    num_classes: int
    input_dim: int = 10
    hidden_dim: int = 180
    kernel_size: int = 3
    pad_value: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions=None, pad_mask=None,
                 train: bool = False):
        _, h_t = ConvGRU(self.hidden_dim, self.kernel_size, self.dtype,
                         name="encoder")(x)
        return Conv2d(features=self.num_classes, kernel_size=self.kernel_size,
                      stride=1, padding=1, padding_mode="zeros",
                      dtype=self.dtype, name="classifier")(h_t)
