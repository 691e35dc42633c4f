"""Visualization suite (matplotlib, headless-safe).

Re-design of /root/reference/src/visualization/: learning curves
(visualize.py:105-206), pretty confusion matrices with per-row/col totals +
IoU (confusion_matrix_pretty_print.py:133-330), LULC crop maps with the
15-class legend (visualize.py:370-434 + webapp/postprocess.py:15-42),
reliability/calibration plots (visualize.py:468-545), per-class metric
comparisons (visualize.py:547-692) and NDVI class profiles
(analyze_ts.py:32-145). All functions return the matplotlib Figure and can
save to disk; the Agg backend is forced so everything works headless.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from crop2seg_tpu.data.s2tsczcrop import LABELS  # noqa: E402

# 15-class colormap in class-code order (background .. not-classified),
# following the reference's legend palette (s2_ts_cz_crop.py:51-76).
CROP_CMAP = (
    "#000000",  # 0 background
    "#a0db8e",  # 1 permanent grassland
    "#cc5500",  # 2 annual fruit & vegetable
    "#e9de1b",  # 3 summer cereals
    "#748500",  # 4 winter cereals
    "#ffc1cc",  # 5 rapeseed
    "#f8d568",  # 6 maize
    "#1e90ff",  # 7 annual forage crops
    "#a52a2a",  # 8 sugar beet
    "#8b4513",  # 9 flax & hemp
    "#ff0000",  # 10 permanent fruit
    "#ccff00",  # 11 hops
    "#006d6f",  # 12 vineyards
    "#800080",  # 13 other crops
    "#ffffff",  # 14 not classified
)


def _save(fig, path: Optional[str]):
    if path:
        fig.savefig(path, bbox_inches="tight", dpi=120)
    return fig


def plot_learning_curves(trainlog: Dict, metrics=("loss", "IoU", "accuracy"),
                         path: Optional[str] = None):
    """trainlog.json (epoch -> metrics) -> per-metric train/val curves
    (reference visualize.py:105-206)."""
    epochs = sorted(int(e) for e in trainlog)
    fig, axes = plt.subplots(1, len(metrics), figsize=(5 * len(metrics), 4))
    axes = np.atleast_1d(axes)
    for ax, metric in zip(axes, metrics):
        for split in ("train", "val"):
            key = f"{split}_{metric}"
            ys = [trainlog[str(e)].get(key) for e in epochs]
            if any(y is not None for y in ys):
                ax.plot(epochs, [y if y is not None else np.nan for y in ys],
                        label=split, marker="o", ms=3)
        ax.set_title(metric)
        ax.set_xlabel("epoch")
        ax.grid(alpha=0.3)
        ax.legend()
    fig.tight_layout()
    return _save(fig, path)


def plot_confusion_matrix(cm: np.ndarray, labels: Sequence[str] = LABELS,
                          normalize: bool = True, show_iou: bool = True,
                          path: Optional[str] = None):
    """Pretty CM with per-row/col totals and per-class IoU appended
    (reference confusion_matrix_pretty_print.py:133-330)."""
    cm = np.asarray(cm, np.float64)
    k = cm.shape[0]
    labels = list(labels)[:k]
    tp = np.diag(cm)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / (cm.sum(0) + cm.sum(1) - tp)
        shown = cm / cm.sum(1, keepdims=True).clip(min=1) if normalize else cm
    fig, ax = plt.subplots(figsize=(0.6 * k + 3, 0.6 * k + 2))
    im = ax.imshow(shown, cmap="Blues", vmin=0)
    ax.set_xticks(range(k))
    ax.set_yticks(range(k))
    ax.set_xticklabels(labels, rotation=90, fontsize=7)
    ylabels = [f"{l}  (IoU {i:.2f})" if show_iou and np.isfinite(i) else l
               for l, i in zip(labels, iou)]
    ax.set_yticklabels(ylabels, fontsize=7)
    for r in range(k):
        for c in range(k):
            if shown[r, c] > 0.005:
                ax.text(c, r, f"{shown[r, c]:.2f}" if normalize
                        else f"{int(cm[r, c])}", ha="center", va="center",
                        fontsize=6,
                        color="white" if shown[r, c] > 0.5 * shown.max()
                        else "black")
    ax.set_xlabel("predicted")
    ax.set_ylabel("true")
    fig.colorbar(im, shrink=0.7)
    fig.tight_layout()
    return _save(fig, path)


def plot_lulc(classes: np.ndarray, labels: Sequence[str] = LABELS,
              path: Optional[str] = None):
    """Crop map with the 15-class legend (reference visualize.py:370-434)."""
    from matplotlib.colors import ListedColormap
    from matplotlib.patches import Patch

    k = len(labels)
    cmap = ListedColormap(CROP_CMAP[:k])
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.imshow(classes, cmap=cmap, vmin=0, vmax=k - 1, interpolation="nearest")
    ax.set_axis_off()
    handles = [Patch(color=CROP_CMAP[i], label=f"{i}: {labels[i]}")
               for i in range(k)]
    ax.legend(handles=handles, loc="center left", bbox_to_anchor=(1.0, 0.5),
              fontsize=7)
    fig.tight_layout()
    return _save(fig, path)


def reliability_plot(confidence: np.ndarray, pred: np.ndarray,
                     target: np.ndarray, n_bins: int = 10,
                     path: Optional[str] = None):
    """Calibration curve + per-bin strength (reference visualize.py:468-545).
    Returns (figure, expected calibration error)."""
    bins = np.linspace(0, 1, n_bins + 1)
    idx = np.clip(np.digitize(confidence, bins) - 1, 0, n_bins - 1)
    acc = np.zeros(n_bins)
    conf = np.zeros(n_bins)
    weight = np.zeros(n_bins)
    correct = (pred == target).astype(np.float64)
    for b in range(n_bins):
        sel = idx == b
        if sel.any():
            acc[b] = correct[sel].mean()
            conf[b] = confidence[sel].mean()
            weight[b] = sel.mean()
    ece = float(np.sum(weight * np.abs(acc - conf)))
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    centers = (bins[:-1] + bins[1:]) / 2
    ax1.bar(centers, acc, width=1 / n_bins, edgecolor="k", alpha=0.7,
            label="accuracy")
    ax1.plot([0, 1], [0, 1], "k--", label="perfect")
    ax1.set_xlabel("confidence")
    ax1.set_ylabel("accuracy")
    ax1.set_title(f"reliability (ECE={ece:.3f})")
    ax1.legend()
    ax2.bar(centers, weight, width=1 / n_bins, edgecolor="k", alpha=0.7)
    ax2.set_xlabel("confidence")
    ax2.set_ylabel("fraction of pixels")
    ax2.set_title("bin strength")
    fig.tight_layout()
    return _save(fig, path), ece


def plot_per_class_metrics(per_class: Dict[str, Dict[str, float]],
                           metric: str = "IoU",
                           labels: Sequence[str] = LABELS,
                           path: Optional[str] = None):
    """Per-class bar comparison (reference visualize.py:547-692)."""
    ks = sorted(per_class, key=int)
    vals = [per_class[k].get(metric, np.nan) for k in ks]
    names = [labels[int(k)] if int(k) < len(labels) else k for k in ks]
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.bar(range(len(ks)), vals, color="#4c72b0")
    ax.set_xticks(range(len(ks)))
    ax.set_xticklabels(names, rotation=60, ha="right", fontsize=8)
    ax.set_ylabel(metric)
    ax.grid(axis="y", alpha=0.3)
    fig.tight_layout()
    return _save(fig, path)


def ndvi_class_profiles(x: np.ndarray, dates: np.ndarray, target: np.ndarray,
                        labels: Sequence[str] = LABELS,
                        red_idx: int = 2, nir_idx: int = 6,
                        path: Optional[str] = None):
    """Per-class NDVI temporal profiles (reference analyze_ts.py:32-145).

    x: (T, H, W, C) un-normalized reflectances in PASTIS band order,
    dates: (T,) day offsets, target: (H, W) labels.
    """
    nir, red = x[..., nir_idx], x[..., red_idx]
    denom = nir + red
    ndvi = np.where(denom == 0, np.nan, (nir - red) / np.where(denom == 0, 1, denom))
    fig, ax = plt.subplots(figsize=(9, 5))
    for cls in np.unique(target):
        mask = target == cls
        if mask.sum() < 10:
            continue
        profile = np.nanmean(ndvi[:, mask], axis=1)
        name = labels[int(cls)] if int(cls) < len(labels) else str(cls)
        ax.plot(dates, profile, label=name,
                color=CROP_CMAP[int(cls) % len(CROP_CMAP)])
    ax.set_xlabel("days since reference date")
    ax.set_ylabel("mean NDVI")
    ax.grid(alpha=0.3)
    ax.legend(fontsize=7, ncol=2)
    fig.tight_layout()
    return _save(fig, path)
