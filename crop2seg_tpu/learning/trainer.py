"""Jitted train/eval steps + the epoch loop (reference ``iterate``).

Replaces /root/reference/src/learning/utils.py:225-449 with TPU-native
mechanics: one fused jitted step (forward, loss, backward, Adam update,
confusion-matrix update) instead of a Python-side loop body; metric
confusion matrices are computed on device and summed across the data-parallel
mesh by GSPMD when the batch is sharded (SURVEY.md §2.7 items 1-2).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state

from crop2seg_tpu.learning.losses import cross_entropy, focal_cross_entropy
from crop2seg_tpu.learning.metrics import (
    IoUMeter, confusion_matrix, top2_prediction)
from crop2seg_tpu.ops.boundary import boundary_mask


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def freeze_labels(params, frozen_prefixes) -> Any:
    """Label every param leaf 'frozen' when its slash-joined module path
    starts with any of ``frozen_prefixes`` (e.g. ("in_conv", "down") freezes
    the spatial encoder — the reference's fine-tune intent at
    /root/reference/train.py:400-405, shipped commented-out there)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    labels = {
        k: ("frozen" if any("/".join(map(str, k)).startswith(p)
                            for p in frozen_prefixes) else "train")
        for k in flat
    }
    return traverse_util.unflatten_dict(labels)


def create_train_state(model, variables, learning_rate: float,
                       frozen_prefixes=()) -> TrainState:
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8), matching
    reference train.py:454.

    ``frozen_prefixes``: module-path prefixes whose params get zero updates
    (optax.multi_transform + set_to_zero — the frozen leaves carry no Adam
    moments at all). BatchNorm running stats keep updating everywhere, the
    same semantics as torch ``requires_grad=False``.
    """
    tx = optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if frozen_prefixes:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            lambda params: freeze_labels(params, tuple(frozen_prefixes)))
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}))


@dataclass(frozen=True)
class StepConfig:
    num_classes: int = 15
    ignore_index: int = -1          # index into class axis (can be negative)
    class_weights: Optional[tuple] = None
    label_smoothing: float = 0.0
    add_boundary_loss: bool = False
    boundary_gamma: float = 2.0
    # Evaluate only 'boundary' or 'interior' pixels by reclassifying the rest
    # to the ignore class (reference learning/utils.py:364-381).
    test_region: str = "all"


def _forward(model, params, batch_stats, batch, train, rngs=None):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    kwargs = dict(batch_positions=batch["dates"], pad_mask=batch["pad_mask"],
                  train=train)
    if train:
        out = model.apply(variables, batch["x"], mutable=["batch_stats"] if
                          batch_stats else [], rngs=rngs, **kwargs)
        return out if batch_stats else (out[0], {})
    return model.apply(variables, batch["x"], **kwargs), batch_stats


def _loss_and_metrics(model, cfg: StepConfig, params, batch_stats, batch,
                      train, rngs=None, want_pred=False):
    out, updates = _forward(model, params, batch_stats, batch, train, rngs)
    new_stats = updates.get("batch_stats", batch_stats) if train else batch_stats
    if cfg.add_boundary_loss:
        logits, logits_b = out
    else:
        logits, logits_b = out, None

    weight = None if cfg.class_weights is None else jnp.asarray(cfg.class_weights)
    loss = cross_entropy(logits, batch["y"], weight=weight,
                         label_smoothing=cfg.label_smoothing)
    aux = {}
    if cfg.add_boundary_loss:
        y_b = boundary_mask(batch["y"], cfg.num_classes)
        loss_b = focal_cross_entropy(logits_b, y_b, gamma=cfg.boundary_gamma)
        loss = loss + loss_b
        aux["loss_b"] = loss_b
        aux["cm_b"] = confusion_matrix(jnp.argmax(logits_b, -1), y_b, 2)

    pred = jnp.argmax(logits, axis=-1)
    y_m = batch["y"]
    if cfg.test_region in ("boundary", "interior"):
        ignore_label = cfg.ignore_index % cfg.num_classes
        on_boundary = boundary_mask(y_m, cfg.num_classes).astype(bool)
        drop = ~on_boundary if cfg.test_region == "boundary" else on_boundary
        y_m = jnp.where(drop, ignore_label, y_m)
    aux["cm"] = confusion_matrix(pred, y_m, cfg.num_classes)
    aux["cm_top2"] = confusion_matrix(
        top2_prediction(logits, y_m), y_m, cfg.num_classes)
    aux["loss"] = loss
    if want_pred:
        aux["pred"] = pred
    return loss, (new_stats, aux)


def make_train_step(model, cfg: StepConfig) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics). Jit outside."""

    def step(state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        rngs = {"dropout": rng}

        def loss_fn(p):
            loss, (stats, aux) = _loss_and_metrics(
                model, cfg, p, state.batch_stats, batch, True, rngs)
            return loss, (stats, aux)

        (loss, (new_stats, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if new_stats:
            state = state.replace(batch_stats=new_stats)
        return state, aux

    return step


def make_eval_step(model, cfg: StepConfig, return_pred: bool = False) -> Callable:
    def step(state: TrainState, batch: Dict[str, jax.Array]):
        # want_pred reuses the metrics forward's argmax instead of running a
        # second full forward pass for the prediction map.
        _, (_, aux) = _loss_and_metrics(model, cfg, state.params,
                                        state.batch_stats, batch, False,
                                        want_pred=return_pred)
        return aux

    return step


def run_epoch(step_fn, state, loader, cfg: StepConfig, mode: str = "train",
              rng: Optional[jax.Array] = None, display_step: int = 50,
              log_fn=print, homogenizer: Optional[Callable] = None) -> tuple:
    """Host-side epoch loop over an iterable of batches — the TPU analogue of
    reference iterate() (learning/utils.py:225-449). Returns
    (state, metrics_dict, cms).

    ``homogenizer(pred (B,H,W) np, batch) -> (B,H,W)`` enables the reference's
    get_affine evaluation path (learning/utils.py:341-361): predictions are
    LPIS-homogenized on host before entering the confusion matrix; the eval
    step must be built with return_pred=True.
    """
    ignore = (None if cfg.ignore_index is None
              else cfg.ignore_index % cfg.num_classes)
    meter = IoUMeter(cfg.num_classes, ignore)
    meter2 = IoUMeter(cfg.num_classes, ignore)
    meter_b = IoUMeter(2) if cfg.add_boundary_loss else None
    losses_sum, n_batches = 0.0, 0
    # Per-step host fetches cost ~31 ms each on the TPU relay (4 fetches/step
    # = ~12-25% of a 0.5 s train step): accumulate loss and the confusion
    # matrices ON DEVICE with eager adds and fetch only at display_step
    # boundaries / epoch end. (The reference fetches every batch —
    # learning/utils.py:383-388 — which is free on its single-GPU setup.)
    acc_keys = ("loss", "cm", "cm_top2") + \
        (("cm_b",) if meter_b is not None else ())
    acc = None

    def flush():
        nonlocal acc, losses_sum
        if acc is None:
            return
        losses_sum += float(acc["loss"])
        meter.add_cm(acc["cm"])
        meter2.add_cm(acc["cm_top2"])
        if meter_b is not None:
            meter_b.add_cm(acc["cm_b"])
        acc = None

    t0 = time.time()
    for i, batch in enumerate(loader):
        if mode == "train":
            rng, sub = jax.random.split(rng)
            state, aux = step_fn(state, batch, sub)
        else:
            aux = step_fn(state, batch)
        if homogenizer is not None and "pred" in aux:
            # get_affine path: predictions round-trip through the host LPIS
            # homogenizer anyway, so the deferral buys nothing here
            pred_h = homogenizer(np.asarray(aux["pred"]), batch)
            y_m = jnp.asarray(batch["y"])
            if cfg.test_region in ("boundary", "interior"):
                # mirror the in-step region reclassification so the
                # homogenized CM scores the same pixel set (the reference
                # homogenizes, THEN reclassifies y, then feeds the meter —
                # learning/utils.py:341-385)
                ignore_label = cfg.ignore_index % cfg.num_classes
                on_b = boundary_mask(y_m, cfg.num_classes).astype(bool)
                drop = ~on_b if cfg.test_region == "boundary" else on_b
                y_m = jnp.where(drop, ignore_label, y_m)
            aux = dict(aux)
            aux["cm"] = confusion_matrix(
                jnp.asarray(pred_h), y_m, cfg.num_classes)
        step_vals = {k: aux[k] for k in acc_keys}
        acc = step_vals if acc is None \
            else {k: acc[k] + step_vals[k] for k in acc_keys}
        n_batches += 1
        if (i + 1) % display_step == 0:
            flush()
            miou, acc_pct = meter.get_miou_acc()
            log_fn(f"Step [{i + 1}], Loss: {losses_sum / n_batches:.4f}, "
                   f"Acc: {acc_pct:.2f}, mIoU: {miou:.2f}")
    flush()
    total_time = time.time() - t0
    miou, acc = meter.get_miou_acc()
    miou2, acc2 = meter2.get_miou_acc()
    metrics = {
        f"{mode}_accuracy": acc,
        f"{mode}_accuracy_top2": acc2,
        f"{mode}_loss": losses_sum / max(n_batches, 1),
        f"{mode}_IoU": miou,
        f"{mode}_IoU_top2": miou2,
        f"{mode}_epoch_time": total_time,
    }
    cms = {"top1": meter.cm, "top2": meter2.cm}
    if meter_b is not None:
        miou_b, acc_b = meter_b.get_miou_acc()
        metrics[f"{mode}_accuracy_b"] = acc_b
        metrics[f"{mode}_IoU_b"] = miou_b
        cms["boundary"] = meter_b.cm
    return state, metrics, cms
