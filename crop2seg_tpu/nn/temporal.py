"""Temporally-shared application of spatial blocks + pad-mask utilities.

The reference merges batch and time, then *scatters around* all-pad frames
with a data-dependent boolean index
(/root/reference/src/backbones/temp_shared_block.py:18-47) — a dynamic-shape
pattern XLA cannot compile. The TPU-native equivalent computes every frame
densely and overwrites pad frames with ``pad_value``; this is numerically
identical because (a) every per-frame op is independent across T and (b) all
cross-T consumers (attention, aggregation) mask pads explicitly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pad_mask_from_input(x: jax.Array, pad_value: float = 0.0) -> jax.Array:
    """(B, T, H, W, C) -> boolean (B, T), True where the frame is all pad.

    Mirrors the reference's mask recovery
    (/root/reference/src/backbones/utae.py:201-203).
    """
    return jnp.all(x == pad_value, axis=(-3, -2, -1))


def pad_mask_from_lengths(lengths: jax.Array, max_t: int) -> jax.Array:
    """(B,) valid lengths -> boolean (B, T_max), True at padded steps.

    Preferred TPU-native form: explicit lengths, no data inspection.
    """
    t = jnp.arange(max_t)[None, :]
    return t >= lengths[:, None]


def temporally_shared(block_fn, x: jax.Array, pad_mask: jax.Array | None = None,
                      pad_value: float = 0.0) -> jax.Array:
    """Apply a per-frame NHWC function over (B, T, H, W, C).

    ``block_fn`` maps (N, H, W, C) -> (N, H', W', C'). Pad frames are computed
    densely and overwritten with ``pad_value`` afterwards (see module doc).
    """
    b, t = x.shape[:2]
    y = block_fn(x.reshape((b * t,) + x.shape[2:]))
    y = y.reshape((b, t) + y.shape[1:])
    if pad_mask is not None:
        valid = (~pad_mask).astype(y.dtype)[:, :, None, None, None]
        y = y * valid + jnp.asarray(pad_value, y.dtype) * (1 - valid)
    return y
