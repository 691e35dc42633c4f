"""Streaming confusion-matrix / IoU metrics (device-side, psum-able).

Re-design of /root/reference/src/learning/miou.py:24-237 and
/root/reference/src/learning/metrics.py:35-85. The per-batch update is a pure
jittable function returning a (K, K) matrix — under a data-parallel mesh it is
summed across devices with ``jax.lax.psum`` (the TPU-native replacement for
the reference's single-device accumulation).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(pred: jax.Array, target: jax.Array,
                     num_classes: int) -> jax.Array:
    """Flat int predictions/targets -> (K, K) counts; rows = ground truth
    (semantics of reference miou.py:104-117, which scatter-adds a bincount).

    Formulated as one_hot(target)^T @ one_hot(pred) so the count rides the
    MXU instead of XLA's serialized scatter lowering (measured on v5e at
    B=16x128^2, K=25: scatter 2.75 ms vs this 0.41 ms). bf16 one-hots are
    exact 0/1 and the f32 accumulator is exact for per-cell counts < 2^24
    (~16.7M) — call per batch (a 16x128^2 batch is ~262k pixels), not over a
    whole epoch at once. Out-of-range labels (including negatives) one-hot
    to all-zero rows and are dropped — this matches the reference's masked
    bincount and *fixes* a previous scatter formulation, whose
    ``.at[idx].add`` wrapped negative indices NumPy-style (target=-1 landed
    in row K-1).
    """
    oh_t = jax.nn.one_hot(target.reshape(-1), num_classes, dtype=jnp.bfloat16)
    oh_p = jax.nn.one_hot(pred.reshape(-1), num_classes, dtype=jnp.bfloat16)
    cm = jax.lax.dot_general(oh_t, oh_p, (((0,), (0,)), ((), ())),
                             precision=jax.lax.Precision.DEFAULT,
                             preferred_element_type=jnp.float32)
    return cm.astype(jnp.int32)


def iou_from_cm(cm: np.ndarray, ignore_index: int | None = None
                ) -> Tuple[np.ndarray, float, float]:
    """(per-class IoU, mIoU %, accuracy %) — reference miou.py:220-237.

    Accuracy is computed AFTER zeroing the ignore row/col, matching
    ``get_miou_acc``.
    """
    cm = np.asarray(cm, np.float64).copy()
    if ignore_index is not None:
        cm[:, ignore_index] = 0
        cm[ignore_index, :] = 0
    tp = np.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / (tp + fp + fn)
    miou = float(np.nanmean(iou) * 100)
    acc = float(tp.sum() / max(cm.sum(), 1e-12) * 100)
    return iou, miou, acc


def confusion_matrix_analysis(mat: np.ndarray) -> Tuple[Dict, Dict]:
    """Per-class + micro/macro P/R/F1/IoU (reference metrics.py:35-85)."""
    mat = np.asarray(mat, np.float64)
    TP = FP = FN = 0.0
    per_class = {}
    for j in range(mat.shape[0]):
        tp = mat[j, j]
        fp = mat[:, j].sum() - tp
        fn = mat[j, :].sum() - tp
        with np.errstate(divide="ignore", invalid="ignore"):
            per_class[str(j)] = {
                "IoU": tp / (tp + fp + fn),
                "Precision": tp / (tp + fp),
                "Recall": tp / (tp + fn),
                "F1-score": 2 * tp / (2 * tp + fp + fn),
            }
        TP, FP, FN = TP + tp, FP + fp, FN + fn
    overall = {
        "micro_IoU": TP / (TP + FP + FN),
        "micro_Precision": TP / (TP + FP),
        "micro_Recall": TP / (TP + FN),
        "micro_F1-score": 2 * TP / (2 * TP + FP + FN),
    }
    for key in ("IoU", "Precision", "Recall", "F1-score"):
        overall[f"MACRO_{key}"] = float(
            np.mean([d[key] for d in per_class.values()]))
    overall["Accuracy"] = float(np.diag(mat).sum() / mat.sum())
    return per_class, overall


def top2_prediction(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Reference's lenient top-2 prediction (learning/utils.py:337,382):
    count the 2nd-best class as correct when it matches the target."""
    _, top2 = jax.lax.top_k(logits, 2)
    return jnp.where(target == top2[..., 1], top2[..., 1], top2[..., 0])


class IoUMeter:
    """Host-side streaming accumulator over per-batch device CMs."""

    def __init__(self, num_classes: int, ignore_index: int | None = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.reset()

    def reset(self):
        self.cm = np.zeros((self.num_classes, self.num_classes), np.int64)

    def add_cm(self, cm) -> None:
        self.cm += np.asarray(cm, np.int64)

    def value(self):
        return iou_from_cm(self.cm, self.ignore_index)

    def get_miou_acc(self) -> Tuple[float, float]:
        _, miou, acc = self.value()
        return miou, acc
