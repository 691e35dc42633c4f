"""On-device input pipeline: the dataset's hot per-sample transforms as
jitted XLA ops.

The reference runs these on the host per sample inside __getitem__
(/root/reference/src/datasets/s2_ts_cz_crop.py:357-498) and its augmentation
on torch CPU (/root/reference/src/utils.py:73-104); here a whole padded batch
is transformed on device in one fused graph so raw uint16-ish reflectances
can be shipped to HBM and never touched again by the host:

    reorder channels -> NDVI -> standardize -> geometric augmentation
    (flips + 90-degree rotations, joint with the target) -> temporal dropout
    (mask-only: drops become pad steps, shapes stay static)

All ops take channels-last batches: x (B, T, H, W, C), y (B, H, W),
pad_mask (B, T).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from crop2seg_tpu.data.s2tsczcrop import PASTIS_CHANNEL_ORDER


def reorder_channels(x: jax.Array, order=PASTIS_CHANNEL_ORDER) -> jax.Array:
    """.SAFE order -> PASTIS order (reference :248,374)."""
    return x[..., jnp.asarray(order)]


def add_ndvi(x: jax.Array, nir_idx: int = 6, red_idx: int = 2) -> jax.Array:
    """Append the NDVI channel (reference :376-402): computed on RAW
    reflectances, zero where undefined or out of [-1, 1]."""
    nir, red = x[..., nir_idx], x[..., red_idx]
    denom = nir + red
    ndvi = jnp.where(denom == 0, 0.0, (nir - red) / jnp.where(denom == 0, 1.0, denom))
    ndvi = jnp.where((ndvi < -1) | (ndvi > 1), 0.0, ndvi)
    return jnp.concatenate([x, ndvi[..., None]], axis=-1)


def standardize(x: jax.Array, mean: jax.Array, std: jax.Array,
                skip_last: int = 0) -> jax.Array:
    """Per-channel standardization (reference :393-398). ``skip_last``
    excludes trailing channels (NDVI is by definition in [-1, 1])."""
    c = x.shape[-1] - skip_last
    xs = (x[..., :c] - mean[:c]) / std[:c]
    return xs if skip_last == 0 else jnp.concatenate(
        [xs, x[..., c:]], axis=-1)


def augment_geometric(x: jax.Array, y: jax.Array, rng: jax.Array
                      ) -> Tuple[jax.Array, jax.Array]:
    """Per-sample random flip (none/h/v) + k*90-degree rotation, applied
    jointly to image series and target (device analogue of reference
    Transform, src/utils.py:81-97; the fixed-degree list collapses to the
    four exact rotations under jit — arbitrary-angle nearest rotation stays
    a host op in crop2seg_tpu.data.transforms)."""
    b = x.shape[0]
    k_flip = jax.random.randint(rng, (b,), 0, 3)
    k_rot = jax.random.randint(jax.random.fold_in(rng, 1), (b,), 0, 4)

    def one(xi, yi, f, k):
        xi = jax.lax.switch(f, [
            lambda a: a,
            lambda a: jnp.flip(a, axis=-2),      # horizontal: flip W
            lambda a: jnp.flip(a, axis=-3),      # vertical: flip H
        ], xi)
        yi = jax.lax.switch(f, [
            lambda a: a,
            lambda a: jnp.flip(a, axis=-1),
            lambda a: jnp.flip(a, axis=-2),
        ], yi)
        xi = jax.lax.switch(k, [lambda a: a] + [
            (lambda kk: lambda a: jnp.rot90(a, k=kk, axes=(-3, -2)))(kk)
            for kk in (1, 2, 3)], xi)
        yi = jax.lax.switch(k, [lambda a: a] + [
            (lambda kk: lambda a: jnp.rot90(a, k=kk, axes=(-2, -1)))(kk)
            for kk in (1, 2, 3)], yi)
        return xi, yi

    return jax.vmap(one)(x, y, k_flip, k_rot)


def temporal_dropout_mask(pad_mask: jax.Array, rng: jax.Array,
                          rate: float) -> jax.Array:
    """Random acquisition dropout as extra pad-mask bits (reference :480-487
    drops frames by slicing; masking keeps shapes static — frames dropped
    this way are invisible to attention/aggregation exactly like pads).
    Never drops a sample's last remaining valid step."""
    drop = jax.random.uniform(rng, pad_mask.shape) < rate
    new_mask = pad_mask | drop
    # keep at least one valid step: un-drop the first valid position when all
    # valid steps got dropped
    all_dropped = jnp.all(new_mask, axis=1, keepdims=True)
    # restrict to VALID positions: for a length-1 sample, cumsum(~pad)==1
    # also marks every trailing pad, and un-dropping those would hand
    # attention/GroupNorm 60 zero frames as "valid" data
    first_valid = (~pad_mask) & (jnp.cumsum(~pad_mask, axis=1) == 1)
    return jnp.where(all_dropped & first_valid, False, new_mask)


def preprocess_batch(x: jax.Array, mean: jax.Array, std: jax.Array,
                     y: Optional[jax.Array] = None,
                     pad_mask: Optional[jax.Array] = None,
                     rng: Optional[jax.Array] = None,
                     reorder: bool = False, ndvi: bool = False,
                     augment: bool = False,
                     temporal_dropout: float = 0.0) -> Dict[str, jax.Array]:
    """Fused on-device preprocessing of a raw padded batch."""
    if reorder:
        x = reorder_channels(x)
    skip_last = 0
    if ndvi:
        x = add_ndvi(x)
        skip_last = 1
    x = standardize(x, mean, std, skip_last=skip_last)
    if pad_mask is not None:  # keep pads exactly at pad_value=0
        x = x * (~pad_mask).astype(x.dtype)[:, :, None, None, None]
    out = {"x": x}
    if y is not None:
        if augment:
            assert rng is not None
            x, y = augment_geometric(x, y, jax.random.fold_in(rng, 7))
            out["x"] = x
        out["y"] = y
    if pad_mask is not None:
        if temporal_dropout > 0.0:
            assert rng is not None
            pad_mask = temporal_dropout_mask(
                pad_mask, jax.random.fold_in(rng, 11), temporal_dropout)
        out["pad_mask"] = pad_mask
    return out
