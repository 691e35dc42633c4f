"""On-the-fly boundary-class extraction as a fused XLA op.

Re-design of /root/reference/src/learning/utils.py:198-222 (``get_dilated``):
the reference one-hot-encodes the target and runs a grouped 3x3 conv per
class; a pixel is a boundary pixel when >= 2 class dilations overlap
(utils.py:285). The conv-of-one-hot is just a per-class binary dilation, so we
implement it as K max-pools over the one-hot mask via a single
``lax.reduce_window`` — no matmul, fuses into the input pipeline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def dilate_classes(target: jax.Array, n_classes: int,
                   connectivity: int = 4) -> jax.Array:
    """(B, H, W) int labels -> (B, H, W, K) 0/1 dilated class masks.

    connectivity 4 uses the plus-shaped structuring element
    (reference utils.py:213-217), 8 the full 3x3 square.
    """
    onehot = jax.nn.one_hot(target, n_classes, dtype=jnp.float32)
    if connectivity == 8:
        dil = jax.lax.reduce_window(
            onehot, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3, 1), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    else:
        # plus-shaped: max over {self, up, down, left, right} = max of two
        # separable 1-D dilations combined with the centre.
        vert = jax.lax.reduce_window(
            onehot, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 1, 1), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (1, 1), (0, 0), (0, 0)))
        horiz = jax.lax.reduce_window(
            onehot, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, 3, 1), window_strides=(1, 1, 1, 1),
            padding=((0, 0), (0, 0), (1, 1), (0, 0)))
        dil = jnp.maximum(vert, horiz)
    return (dil > 0).astype(jnp.int32)


def boundary_mask(target: jax.Array, n_classes: int,
                  connectivity: int = 4) -> jax.Array:
    """(B, H, W) labels -> (B, H, W) int32 {0 interior, 1 boundary}.

    Boundary = pixel whose 3x3 (or plus) neighbourhood touches >= 2 classes
    (reference utils.py:283-285).
    """
    dil = dilate_classes(target, n_classes, connectivity)
    return (jnp.sum(dil, axis=-1) > 1).astype(jnp.int32)
