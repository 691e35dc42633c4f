"""Segmentation losses (jit-friendly, channels-last logits).

Functional re-implementations of the reference loss zoo:
- weighted + label-smoothed cross entropy (the main loss,
  /root/reference/train.py:462-468: per-class weights with the ignore class
  weighted 0, torch CrossEntropyLoss semantics incl. weighted-mean reduction)
- focal cross entropy for the boundary head
  (/root/reference/src/learning/focal_loss.py:7-45, gamma=2 at utils.py:269)
- boundary-aware smooth cross entropy
  (/root/reference/src/learning/smooth_loss.py:18-80)
- recall cross entropy (/root/reference/src/learning/recall_loss.py:8-50)

All take logits (B, H, W, K) and integer targets (B, H, W).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from crop2seg_tpu.ops.boundary import dilate_classes

# S2TSCzCrop class proportions excluding background, used by the smooth loss
# (reference smooth_loss.py:26-27).
S2TSCZ_CLASS_PROPORTIONS = (
    0.3111, 0.0193, 0.0809, 0.2809, 0.1084, 0.0892, 0.0350, 0.0170, 0.0007,
    0.0047, 0.0015, 0.0044, 0.0394, 0.0074)


def cross_entropy(logits: jax.Array, target: jax.Array,
                  weight: jax.Array | None = None,
                  label_smoothing: float = 0.0) -> jax.Array:
    """torch.nn.CrossEntropyLoss(weight, label_smoothing) semantics.

    Per pixel n with target y: q = (1-eps)*onehot(y) + eps/K;
    loss_n = -w[y] * sum_c q_c log p_c ; reduction = sum(loss) / sum(w[y]).
    An ignore class is expressed as weight 0 (reference train.py:464-466).
    """
    k = logits.shape[-1]
    eps = label_smoothing
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    if weight is not None:
        # torch semantics: the hard term is weighted by w[y], the smooth term
        # by per-class weights, and mean reduction divides by sum(w[y]).
        wc = jnp.asarray(weight, logits.dtype)
        wy = wc[target]
        per_pixel = (1.0 - eps) * wy * nll
        if eps > 0.0:
            per_pixel = per_pixel + eps / k * (-jnp.sum(wc * logp, axis=-1))
        return jnp.sum(per_pixel) / jnp.maximum(jnp.sum(wy), 1e-12)
    per_pixel = nll if eps == 0.0 else (
        (1.0 - eps) * nll + eps * (-jnp.mean(logp, axis=-1)))
    return jnp.mean(per_pixel)


def soft_cross_entropy(logits: jax.Array, target_probs: jax.Array,
                       weight: jax.Array | None = None) -> jax.Array:
    """torch CE with probability targets: loss_n = -sum_c w_c q_c log p_c,
    mean over pixels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    w = jnp.ones(logits.shape[-1], logits.dtype) if weight is None else \
        jnp.asarray(weight, logits.dtype)
    per_pixel = -jnp.sum(w * target_probs * logp, axis=-1)
    return jnp.mean(per_pixel)


def focal_cross_entropy(logits: jax.Array, target: jax.Array,
                        gamma: float = 2.0, ignore_index: int = -100,
                        weight: jax.Array | None = None) -> jax.Array:
    """FocalCELoss (reference focal_loss.py): -(1-p_y)^gamma * log p_y,
    mean over non-ignored pixels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_t = jnp.where(target == ignore_index, 0, target)
    logpt = jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    pt = jnp.exp(logpt)
    loss = -jnp.power(1.0 - pt, gamma) * logpt
    if weight is not None:
        loss = loss * jnp.asarray(weight, logits.dtype)[safe_t]
    keep = (target != ignore_index).astype(logits.dtype)
    return jnp.sum(loss * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def smooth_cross_entropy_2d(
        logits: jax.Array, target: jax.Array, label_smoothing: float = 0.1,
        background_treatment: bool = True, background_index: int = 0,
        background_label_value: float = 0.6,
        class_proportions: Sequence[float] = S2TSCZ_CLASS_PROPORTIONS,
        weight: jax.Array | None = None) -> jax.Array:
    """Boundary-aware label smoothing (reference smooth_loss.py:54-80).

    Probability mass eps/K goes to classes absent from the 3x3 neighbourhood;
    present classes share the remainder equally. Background pixels get the
    fixed prior [v, (1-v)*proportions].
    """
    k = logits.shape[-1]
    dilated = dilate_classes(target, k, connectivity=4).astype(logits.dtype)
    eps = label_smoothing / k
    n_present = jnp.sum(dilated, axis=-1, keepdims=True)
    exp_small = eps * (k - n_present)
    exp_large = (1.0 - exp_small) / n_present
    target_probs = jnp.where(dilated == 1, exp_large, eps)
    if background_treatment:
        bg = jnp.concatenate([
            jnp.asarray([background_label_value], logits.dtype),
            (1.0 - background_label_value)
            * jnp.asarray(class_proportions, logits.dtype)])
        target_probs = jnp.where(
            (target == background_index)[..., None], bg, target_probs)
    return soft_cross_entropy(logits, target_probs, weight=weight)


def recall_cross_entropy(logits: jax.Array, target: jax.Array,
                         n_classes: int, ignore_index: int = -100) -> jax.Array:
    """RecallCrossEntropy (reference recall_loss.py): CE dynamically weighted
    per pixel by the running (false-negative / ground-truth) count ratio of
    its class within the batch.

    The reference remaps the ignore label onto class 1 via a data-dependent
    ``torch.unique`` quirk; here ignored pixels are excluded from the counts
    and the mean — the documented intent of the loss (arXiv:2106.14917).
    """
    pred = jnp.argmax(logits, axis=-1)
    valid = (target != ignore_index)
    safe_t = jnp.where(valid, target, 0)
    onehot_t = jax.nn.one_hot(safe_t, n_classes) * valid[..., None]
    gt_count = jnp.maximum(jnp.sum(onehot_t, axis=tuple(range(onehot_t.ndim - 1))), 1.0)
    fn_mask = (pred != target) & valid
    fn_count = jnp.maximum(
        jnp.sum(onehot_t * fn_mask[..., None],
                axis=tuple(range(onehot_t.ndim - 1))), 1.0)
    weight = fn_count / gt_count
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_t[..., None], axis=-1)[..., 0]
    loss = weight[safe_t] * ce * valid
    return jnp.sum(loss) / jnp.maximum(jnp.sum(valid), 1.0)
