"""Whole-tile inference: patchify -> batched sharded forward -> stitch.

TPU-native replacement for the reference webapp inference driver
(/root/reference/src/webapp/prediction.py:253-355), which runs 100 patches
one by one at batch 1 on CPU/GPU and stitches with einops on host. Here the
tile is patchified on device, the 100 patches run in large batches (sharded
across a mesh when one is provided — embarrassingly parallel), and softmax +
stitch + crop happen on device; only the final 1098^2 probability/class maps
are fetched.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from crop2seg_tpu.nn.temporal import pad_mask_from_lengths
from crop2seg_tpu.ops.patchify import (
    INFER_TILE, patchify_inference_tile, stitch_inference_tile)


def make_tile_predictor(model, batch_size: int = 10, mesh=None,
                        out_hw: int = INFER_TILE):
    """Returns predict(variables, tile_ts, dates, length) ->
    {'proba': (out_hw, out_hw, K) float32, 'classes': (out_hw, out_hw) uint8}.

    tile_ts: (T, 1098, 1098, C) standardized series; dates: (T,);
    length: valid series length (int).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is not None:
        # device_put with P('data') requires the batch axis to divide the
        # mesh; round the chunk up so each device gets equal patch rows
        # (the pad-to-one-compiled-shape path below absorbs the excess) —
        # same guard as parallel.patch_parallel_infer (mesh.py).
        n = int(mesh.shape["data"])
        if batch_size % n:
            batch_size += n - batch_size % n

    def _forward_batch(variables, xb, dates_b, mask_b):
        logits = model.apply(variables, xb, dates_b, pad_mask=mask_b,
                             train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    fwd = jax.jit(_forward_batch)

    def predict(variables, tile_ts, dates, length) -> Dict[str, np.ndarray]:
        t = tile_ts.shape[0]
        patches = patchify_inference_tile(jnp.asarray(tile_ts))  # (100,T,128,128,C)
        n_patches = patches.shape[0]
        mask1 = pad_mask_from_lengths(jnp.asarray([length]), t)

        probs = []
        bs = batch_size
        for start in range(0, n_patches, bs):
            xb = patches[start:start + bs]
            nb = xb.shape[0]
            if nb < bs:  # pad the final batch to keep one compiled shape
                xb = jnp.concatenate(
                    [xb, jnp.zeros((bs - nb,) + xb.shape[1:], xb.dtype)])
            db = jnp.tile(jnp.asarray(dates)[None, :], (bs, 1))
            mb = jnp.tile(mask1, (bs, 1))
            if mesh is not None:
                xb = jax.device_put(xb, NamedSharding(mesh, P("data")))
                db = jax.device_put(db, NamedSharding(mesh, P("data")))
                mb = jax.device_put(mb, NamedSharding(mesh, P("data")))
            pb = fwd(variables, xb, db, mb)
            probs.append(pb[:nb])
        proba_patches = jnp.concatenate(probs, axis=0)       # (100,128,128,K)
        proba = stitch_inference_tile(proba_patches, out_hw)  # (hw,hw,K)
        classes = jnp.argmax(proba, axis=-1).astype(jnp.uint8)
        return {"proba": np.asarray(proba), "classes": np.asarray(classes)}

    return predict
