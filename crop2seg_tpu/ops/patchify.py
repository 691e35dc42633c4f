"""Tile <-> patch reshaping as jitted XLA ops.

Re-design of the reference's einops-based patchify/stitch:
- inference patchify: pad the 1098^2 tile crop to 1280^2 and split into a
  10x10 grid of 128^2 patches (/root/reference/src/helpers/dataset_creator.py:386-388)
- stitch: '(h w) ... 128 128 -> (10*128)^2' then crop back to 1098^2
  (/root/reference/src/webapp/prediction.py:329-332)
- training patchify: crop 10980^2 -> 10496^2 with a 484 px offset, split into
  82x82=6724 patches (dataset_creator.py:347-385)

Everything is a reshape/transpose — XLA compiles these to layout changes, so
the whole tile never leaves the device between patchify, model, and stitch.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INFER_TILE = 1098        # webapp tile crop edge (px @ 10 m)
INFER_PADDED = 1280      # padded edge = 10 * 128
PATCH = 128
TRAIN_TILE = 10980       # full Sentinel-2 tile edge
TRAIN_CROP = 10496       # 82 * 128
TRAIN_OFFSET = 484       # crop offset for overlap bookkeeping


def patchify_grid(x: jax.Array, patch: int = PATCH) -> jax.Array:
    """(..., H, W, C) with H=W=n*patch -> (n*n, ..., patch, patch, C).

    Row-major patch order, matching einops
    '... (h hh) (w ww) -> (h w) ... hh ww' (dataset_creator.py:385-388).
    """
    *lead, h, w, c = x.shape
    n_h, n_w = h // patch, w // patch
    x = x.reshape(*lead, n_h, patch, n_w, patch, c)
    nl = len(lead)
    # (..., n_h, patch, n_w, patch, C) -> (n_h, n_w, ..., patch, patch, C)
    perm = (nl, nl + 2) + tuple(range(nl)) + (nl + 1, nl + 3, nl + 4)
    x = jnp.transpose(x, perm)
    return x.reshape(n_h * n_w, *lead, patch, patch, c)


def unpatchify_grid(patches: jax.Array, n_h: int, n_w: int) -> jax.Array:
    """(n_h*n_w, ..., patch, patch, C) -> (..., n_h*patch, n_w*patch, C)."""
    _, *lead, p, p2, c = patches.shape
    nl = len(lead)
    x = patches.reshape(n_h, n_w, *lead, p, p2, c)
    # -> (..., n_h, patch, n_w, patch, C)
    perm = tuple(range(2, 2 + nl)) + (0, 2 + nl, 1, 3 + nl, 4 + nl)
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, n_h * p, n_w * p2, c)


def patchify_inference_tile(tile: jax.Array) -> jax.Array:
    """(T, 1098, 1098, C) -> (100, T, 128, 128, C), zero-padded to 1280^2."""
    t, h, w, c = tile.shape
    pad_h, pad_w = INFER_PADDED - h, INFER_PADDED - w
    tile = jnp.pad(tile, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return patchify_grid(tile, PATCH)


def stitch_inference_tile(patches: jax.Array, out_hw: int = INFER_TILE) -> jax.Array:
    """(100, 128, 128, K) -> (out_hw, out_hw, K): stitch 10x10 grid, crop."""
    n = int(round(float(patches.shape[0]) ** 0.5))
    full = unpatchify_grid(patches, n, n)
    return full[:out_hw, :out_hw, :]


def np_stitch_inference_tile(patches, out_hw: int = INFER_TILE):
    """Host (numpy) twin of :func:`stitch_inference_tile` for the streamed
    whole-tile path, where per-chunk outputs are fetched while the next chunk
    decodes: (100, 128, 128[, K]) -> (out_hw, out_hw[, K])."""
    import numpy as np

    patches = np.asarray(patches)
    squeeze = patches.ndim == 3
    if squeeze:
        patches = patches[..., None]
    n = int(round(float(patches.shape[0]) ** 0.5))
    p, k = patches.shape[1], patches.shape[-1]
    full = patches.reshape(n, n, p, p, k).transpose(0, 2, 1, 3, 4)
    full = full.reshape(n * p, n * p, k)[:out_hw, :out_hw]
    return full[..., 0] if squeeze else full


def patchify_training_tile(tile: jax.Array) -> jax.Array:
    """(..., 10980, 10980, C) -> (6724, ..., 128, 128, C) with the reference's
    484 px crop offset (dataset_creator.py:347-385)."""
    cropped = tile[..., TRAIN_OFFSET:TRAIN_OFFSET + TRAIN_CROP,
                   TRAIN_OFFSET:TRAIN_OFFSET + TRAIN_CROP, :]
    return patchify_grid(cropped, PATCH)
