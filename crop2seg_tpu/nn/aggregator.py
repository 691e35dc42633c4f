"""Attention-guided temporal collapse of skip feature maps.

Branch-free re-design of /root/reference/src/backbones/temporal_aggregator.py:6-77.
The reference branches on ``pad_mask.any()``; masking with an all-valid mask is
the identity, so a single masked path covers both cases under jit.

Modes (reference :21-56):
- ``att_group``: resample per-head attention to the skip resolution (bilinear
  up / average-pool down), zero padded dates, head-grouped weighted sum over T.
- ``att_mean``: same with the head-averaged mask.
- ``mean``: masked temporal mean.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _resample_attn(attn: jax.Array, h: int, w: int) -> jax.Array:
    """Resize attention maps (..., h_a, w_a, K) to (..., h, w, K).

    Bilinear (half-pixel, torch align_corners=False) when upsampling,
    average pooling with kernel = w_a // w when downsampling (reference :26-29).
    """
    ha, wa = attn.shape[-3], attn.shape[-2]
    if h == ha and w == wa:
        return attn
    if h > ha:
        out_shape = attn.shape[:-3] + (h, w) + attn.shape[-1:]
        return jax.image.resize(attn, out_shape, method="bilinear")
    k = wa // w
    x = jax.lax.reduce_window(
        attn, 0.0, jax.lax.add,
        window_dimensions=(1,) * (attn.ndim - 3) + (k, k, 1),
        window_strides=(1,) * (attn.ndim - 3) + (k, k, 1),
        padding="VALID",
    )
    return x / (k * k)


def temporal_aggregate(x: jax.Array, attn: jax.Array | None = None,
                       pad_mask: jax.Array | None = None,
                       mode: str = "att_group") -> jax.Array:
    """Collapse (B, T, H, W, C) skips to (B, H, W, C).

    attn: (B, h_a, w_a, head, T) attention masks from the L-TAE.
    pad_mask: (B, T) bool, True at padded dates.
    """
    b, t, h, w, c = x.shape
    valid = None if pad_mask is None else (~pad_mask).astype(x.dtype)

    if mode == "att_group":
        n_head = attn.shape[3]
        a = jnp.transpose(attn, (0, 3, 1, 2, 4))   # (B, head, ha, wa, T)
        # resample in the compute dtype: the upsampled masks are the largest
        # tensor on this path ((B, 16, H, W, T) ~1 GB fp32 at the flagship
        # 128^2 scale) — in bf16 runs halving them halves the HBM traffic of
        # the resample write + both einsum reads; fp32 runs are unchanged.
        # The weighted sum still accumulates in fp32 (preferred_element_type)
        # like every conv on the MXU.
        a = _resample_attn(a.astype(x.dtype), h, w)  # (B, head, H, W, T)
        if valid is not None:
            a = a * valid[:, None, None, None, :]
        xg = x.reshape(b, t, h, w, n_head, c // n_head)
        out = jnp.einsum("bghwt,bthwgd->bhwgd", a, xg,
                         preferred_element_type=jnp.float32)
        return out.reshape(b, h, w, c).astype(x.dtype)

    if mode == "att_mean":
        a = jnp.mean(attn, axis=3)                 # (B, ha, wa, T)
        a = _resample_attn(a.astype(x.dtype), h, w)  # (B, H, W, T)
        if valid is not None:
            a = a * valid[:, None, None, :]
        return jnp.einsum("bhwt,bthwc->bhwc", a, x,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    if mode == "mean":
        if valid is None:
            return jnp.mean(x, axis=1)
        num = jnp.einsum("bt,bthwc->bhwc", valid, x)
        den = jnp.sum(valid, axis=1)[:, None, None, None]
        return num / den

    raise ValueError(f"unknown aggregation mode {mode!r}")
