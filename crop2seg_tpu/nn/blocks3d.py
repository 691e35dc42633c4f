"""3-D (C,T,H,W-sliding) conv blocks + learned-upsampling aggregator.

Re-design of the reference's experimental 3-D variants:
- ConvLayer3D / ConvBlock3D / DownConvBlock3D
  (/root/reference/src/backbones/conv.py:99-165,203-235,299-359): 3-D convs
  sliding over (T, H, W) with stride/padding applied spatially only, shared
  across the batch via the same dense-masking strategy as the 2-D path.
- TemporalAggregator3D (/root/reference/src/backbones/temporal_aggregator.py:80-156):
  attention-mask aggregation where the upsampling is a learned 3-D
  transposed conv + conv + softmax instead of bilinear resize.

Layout: (B, T, H, W, C) = NDHWC with depth = time.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.layers import make_norm


class ConvLayer3D(nn.Module):
    """Stacked (conv3d -> norm -> relu) units (reference conv.py:99-165).
    Spatial stride/pad only; temporal kernel k_3d with pad 1."""

    nkernels: Sequence[int]
    norm: str = "batch"
    k: int = 3
    k_3d: int = 3
    s: int = 1
    p: int = 1
    n_groups: int = 4
    last_relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        norm_fn = make_norm(self.norm, self.n_groups, self.dtype)
        n = len(self.nkernels) - 1
        for i in range(n):
            x = nn.Conv(self.nkernels[i + 1],
                        kernel_size=(self.k_3d, self.k, self.k),
                        strides=(1, self.s, self.s),
                        padding=((1, 1), (self.p, self.p), (self.p, self.p)),
                        dtype=self.dtype, name=f"conv{i}")(x)
            if norm_fn is not None:
                m = norm_fn(name=f"norm{i}")
                x = m(x, use_running_average=not train) \
                    if self.norm == "batch" else m(x)
            if self.last_relu or i < n - 1:
                x = nn.relu(x)
        return x


class ConvBlock3D(nn.Module):
    """Resolution-preserving 3-D block (reference conv.py:203-235)."""

    nkernels: Sequence[int]
    norm: str = "batch"
    last_relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return ConvLayer3D(nkernels=self.nkernels, norm=self.norm,
                           last_relu=self.last_relu, dtype=self.dtype,
                           name="conv")(x, train=train)


class DownConvBlock3D(nn.Module):
    """Spatially-strided 3-D down block + residual pair
    (reference conv.py:299-359)."""

    d_out: int
    k: int = 4
    k_3d: int = 3
    s: int = 2
    p: int = 1
    norm: str = "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        x = ConvLayer3D(nkernels=(d_in, d_in), norm=self.norm, k=self.k,
                        k_3d=self.k_3d, s=self.s, p=self.p, dtype=self.dtype,
                        name="down")(x, train=train)
        x = ConvLayer3D(nkernels=(d_in, self.d_out), norm=self.norm,
                        dtype=self.dtype, name="conv1")(x, train=train)
        return x + ConvLayer3D(nkernels=(self.d_out, self.d_out),
                               norm=self.norm, dtype=self.dtype,
                               name="conv2")(x, train=train)


class TemporalAggregator3D(nn.Module):
    """att_group aggregation with learned 3-D upsampling of attention masks
    (reference temporal_aggregator.py:80-156). Returns (out, attn_upsampled).
    """

    mode: str = "att_group"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, attn: jax.Array | None = None,
                 pad_mask: jax.Array | None = None):
        # x: (B, T, H, W, C); attn: (B, h_a, w_a, head, T)
        b, t, h, w, c = x.shape
        valid = None if pad_mask is None else (~pad_mask).astype(x.dtype)
        if self.mode == "mean":
            if valid is None:
                return jnp.mean(x, axis=1), None
            num = jnp.einsum("bt,bthwc->bhwc", valid, x)
            den = jnp.sum(valid, axis=1)[:, None, None, None]
            return num / den, None

        n_head = attn.shape[3]
        a = jnp.transpose(attn, (0, 3, 4, 1, 2))      # (B, head, T, ha, wa)
        if self.mode == "att_mean":
            # reference :125-129 averages the HEAD MASKS first and runs the
            # learned path on the single head-mean stream (softmax is
            # nonlinear, so mean-of-softmaxed-ups differs)
            a = jnp.mean(a, axis=1, keepdims=True)
            streams = 1
        else:
            streams = n_head
        a = a.reshape(b * streams, t, a.shape[-2], a.shape[-1])[..., None]
        if x.shape[2] > attn.shape[1]:
            # learned x2 upsample: ConvTranspose (1,4,4)/(1,2,2) + conv + softmax
            up = nn.ConvTranspose(1, kernel_size=(3, 4, 4),
                                  strides=(1, 2, 2), padding="SAME",
                                  dtype=self.dtype, name="up_deconv")(a)
            up = nn.Conv(1, kernel_size=(3, 3, 3), padding=1,
                         dtype=self.dtype, name="up_conv")(up)
            a = jax.nn.softmax(up, axis=1)
        elif attn.shape[1] > x.shape[2]:
            # attention finer than the skip: average-pool down (reference
            # :111-115 AvgPool2d(w // x.shape[-2]); kernel 1 = identity)
            k = attn.shape[1] // x.shape[2]
            a = nn.avg_pool(a, window_shape=(1, k, k), strides=(1, k, k))
        a = a[..., 0].reshape(b, streams, t, x.shape[2], x.shape[3])
        a = jnp.moveaxis(a, 2, 4)                     # (B, streams, H, W, T)
        if self.mode == "att_mean":
            a = a[:, 0]
            if valid is not None:
                a = a * valid[:, None, None, :]
            return jnp.einsum("bhwt,bthwc->bhwc", a, x), a
        if valid is not None:
            a = a * valid[:, None, None, None, :]
        xg = x.reshape(b, t, x.shape[2], x.shape[3], n_head, c // n_head)
        out = jnp.einsum("bghwt,bthwgd->bhwgd", a, xg)
        return out.reshape(b, x.shape[2], x.shape[3], c), a
