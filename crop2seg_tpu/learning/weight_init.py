"""Reference-matching weight initialization for training from scratch.

Mirrors /root/reference/src/learning/weight_init.py:4-75 applied at
/root/reference/train.py:449-450:
- Conv2d/ConvTranspose2d/Linear kernels -> xavier normal (torch gain=1)
- Conv1d kernels (the L-TAE ``inconv``) -> N(0, 1)
- all biases -> N(0, 1)
- BatchNorm scale -> N(0, 1), bias -> 0
- GroupNorm left at defaults (scale 1, bias 0) — torch weight_init skips it
- the learnable attention query Q is a bare nn.Parameter in torch and is
  skipped too (keeps its N(0, sqrt(2/d_k)) module init)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _xavier_normal_std(shape) -> float:
    """torch xavier_normal std for our layouts: dense (I, O) or conv HWIO."""
    if len(shape) == 2:
        fan_in, fan_out = shape
    else:  # (kh, kw, I, O)
        rf = int(np.prod(shape[:-2]))
        fan_in, fan_out = shape[-2] * rf, shape[-1] * rf
    return float(np.sqrt(2.0 / (fan_in + fan_out)))


def apply_reference_init(variables, rng: jax.Array):
    """Re-draw params following the reference init recipe. Returns new variables."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    # Paths owning batch_stats are BatchNorm modules.
    bn_paths = {tuple(str(k.key) for k in p[:-1])
                for p, _ in jax.tree_util.tree_flatten_with_path(batch_stats)[0]}

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    new = {}
    keys = jax.random.split(rng, len(flat))
    for (path, leaf), key in zip(flat, keys):
        names = tuple(str(k.key) for k in path)
        leafname = names[-1]
        parent = names[:-1]
        if parent in bn_paths:  # BatchNorm affine
            val = jax.random.normal(key, leaf.shape, leaf.dtype) \
                if leafname == "scale" else jnp.zeros_like(leaf)
        elif leafname == "query":
            val = leaf  # torch weight_init never sees bare Parameters
        elif leafname in ("scale",):  # GroupNorm scale
            val = leaf
        elif leafname == "bias" and leaf.ndim == 1 and parent and (
                parent[-1].startswith("norm") or parent[-1].endswith("_norm")
                or "norm" in parent[-1]):
            # GroupNorm bias stays 0 (module default) — torch skips GroupNorm.
            val = leaf
        elif leafname == "bias":
            val = jax.random.normal(key, leaf.shape, leaf.dtype)
        elif leafname == "embedding":
            # AbsolutePositionalEncoder's fc is a torch Linear -> xavier.
            val = jax.random.normal(key, leaf.shape, leaf.dtype) * \
                _xavier_normal_std(leaf.shape)
        elif leafname == "kernel":
            if "inconv" in names:  # torch Conv1d branch: plain N(0,1)
                val = jax.random.normal(key, leaf.shape, leaf.dtype)
            else:
                val = jax.random.normal(key, leaf.shape, leaf.dtype) * \
                    _xavier_normal_std(leaf.shape)
        else:
            val = leaf
        d = new
        for n in names[:-1]:
            d = d.setdefault(n, {})
        d[names[-1]] = val
    out = dict(variables)
    out["params"] = new
    return out
