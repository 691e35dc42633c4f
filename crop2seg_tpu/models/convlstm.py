"""ConvLSTM recurrent baselines, expressed with lax.scan.

Re-design of /root/reference/src/backbones/convlstm.py:10-321. The reference
loops over timesteps in Python (:161-165); here the recurrence is a single
``lax.scan`` so XLA compiles one fused step regardless of T. The classifier
uses the final cell state after the full (pad-inclusive) scan, exactly like
the reference (ConvLSTM_Seg takes ``states[0][1]`` at :232-233, where the
LSTM has consumed zero-filled pad frames too). ``last_valid_output`` exposes
the pad-aware gather that the reference's fancy-indexing at :168-170 intends.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.layers import Conv2d
from crop2seg_tpu.nn.temporal import pad_mask_from_input


class ConvLSTMCell(nn.Module):
    hidden_dim: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, carry: Tuple[jax.Array, jax.Array], x: jax.Array):
        h, c = carry
        combined = jnp.concatenate([x, h], axis=-1)
        gates = Conv2d(features=4 * self.hidden_dim,
                       kernel_size=self.kernel_size, stride=1,
                       padding=self.kernel_size // 2, padding_mode="zeros",
                       use_bias=self.use_bias, dtype=self.dtype,
                       name="conv")(combined)
        i, f, o, g = jnp.split(gates, 4, axis=-1)
        c_next = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_next = nn.sigmoid(o) * jnp.tanh(c_next)
        return (h_next, c_next), h_next


class ConvLSTM(nn.Module):
    """x (B, T, H, W, C) -> (outputs (B, T, H, W, hid), (h_T, c_T))."""

    hidden_dim: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array):
        b, t, h, w, _ = x.shape
        cell = nn.scan(
            ConvLSTMCell, variable_broadcast="params",
            split_rngs={"params": False}, in_axes=1, out_axes=1,
        )(hidden_dim=self.hidden_dim, kernel_size=self.kernel_size,
          dtype=self.dtype, name="cell")
        init = (jnp.zeros((b, h, w, self.hidden_dim), x.dtype),
                jnp.zeros((b, h, w, self.hidden_dim), x.dtype))
        (h_t, c_t), outputs = cell(init, x)
        return outputs, (h_t, c_t)


def last_valid_output(outputs: jax.Array, pad_mask: jax.Array) -> jax.Array:
    """Gather each sample's hidden state at its last valid step.

    (B, T, H, W, C), (B, T) -> (B, H, W, C). The reference's equivalent
    indexing (convlstm.py:168-170) is buggy (indexes batch with a vector);
    this is the intended semantics.
    """
    last = jnp.sum((~pad_mask).astype(jnp.int32), axis=1) - 1
    return jnp.take_along_axis(
        outputs, last[:, None, None, None, None], axis=1)[:, 0]


class BConvLSTM(nn.Module):
    """Bidirectional ConvLSTM (reference convlstm.py:289-321): concat of the
    forward and backward final cell states; the reversed stream's leading pad
    frames are zero-filled (they already are, pad_value=0)."""

    hidden_dim: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, pad_mask: jax.Array | None = None):
        _, (_, c_fwd) = ConvLSTM(self.hidden_dim, self.kernel_size,
                                 self.dtype, name="forward")(x)
        x_rev = jnp.flip(x, axis=1)
        if pad_mask is not None:
            keep = (~jnp.flip(pad_mask, axis=1)).astype(x.dtype)
            x_rev = x_rev * keep[:, :, None, None, None]
        _, (_, c_bwd) = ConvLSTM(self.hidden_dim, self.kernel_size,
                                 self.dtype, name="backward")(x_rev)
        return jnp.concatenate([c_fwd, c_bwd], axis=-1)


class ConvLSTMSeg(nn.Module):
    """ConvLSTM_Seg (reference convlstm.py:207-236)."""

    num_classes: int
    input_dim: int = 10
    hidden_dim: int = 160
    kernel_size: int = 3
    pad_value: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions=None, pad_mask=None,
                 train: bool = False):
        _, (_, c_t) = ConvLSTM(self.hidden_dim, self.kernel_size, self.dtype,
                               name="encoder")(x)
        return Conv2d(features=self.num_classes, kernel_size=self.kernel_size,
                      stride=1, padding=1, padding_mode="zeros",
                      dtype=self.dtype, name="classifier")(c_t)


class BConvLSTMSeg(nn.Module):
    """BConvLSTM_Seg (reference convlstm.py:239-287)."""

    num_classes: int
    input_dim: int = 10
    hidden_dim: int = 160
    kernel_size: int = 3
    pad_value: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions=None, pad_mask=None,
                 train: bool = False):
        if pad_mask is None:
            pad_mask = pad_mask_from_input(x, self.pad_value)
        emb = BConvLSTM(self.hidden_dim, self.kernel_size, self.dtype,
                        name="encoder")(x, pad_mask)
        return Conv2d(features=self.num_classes, kernel_size=self.kernel_size,
                      stride=1, padding=1, padding_mode="zeros",
                      dtype=self.dtype, name="classifier")(emb)
