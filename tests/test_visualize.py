"""Visualization smoke tests (headless Agg backend)."""
import numpy as np

from crop2seg_tpu.utils.visualize import (
    ndvi_class_profiles, plot_confusion_matrix, plot_learning_curves,
    plot_lulc, plot_per_class_metrics, reliability_plot)


def test_learning_curves(tmp_path):
    trainlog = {str(e): {"train_loss": 1.0 / e, "val_loss": 1.1 / e,
                         "train_IoU": 10 * e, "val_IoU": 9 * e,
                         "train_accuracy": 50 + e, "val_accuracy": 49 + e}
                for e in range(1, 6)}
    fig = plot_learning_curves(trainlog, path=str(tmp_path / "lc.png"))
    assert (tmp_path / "lc.png").exists()


def test_confusion_matrix_plot(tmp_path):
    rng = np.random.default_rng(0)
    cm = rng.integers(0, 100, (15, 15))
    plot_confusion_matrix(cm, path=str(tmp_path / "cm.png"))
    assert (tmp_path / "cm.png").exists()


def test_lulc_map(tmp_path):
    classes = np.random.default_rng(0).integers(0, 15, (64, 64))
    plot_lulc(classes, path=str(tmp_path / "map.png"))
    assert (tmp_path / "map.png").exists()


def test_reliability(tmp_path):
    rng = np.random.default_rng(0)
    conf = rng.random(1000)
    target = rng.integers(0, 5, 1000)
    pred = np.where(rng.random(1000) < conf, target, (target + 1) % 5)
    _, ece = reliability_plot(conf, pred, target, path=str(tmp_path / "r.png"))
    assert 0 <= ece <= 1 and (tmp_path / "r.png").exists()


def test_per_class_and_ndvi(tmp_path):
    per_class = {str(i): {"IoU": 0.5 + 0.01 * i} for i in range(15)}
    plot_per_class_metrics(per_class, path=str(tmp_path / "pc.png"))
    rng = np.random.default_rng(0)
    x = rng.uniform(100, 4000, (6, 16, 16, 10)).astype(np.float32)
    target = rng.integers(0, 4, (16, 16))
    ndvi_class_profiles(x, np.arange(6) * 10.0, target,
                        path=str(tmp_path / "ndvi.png"))
    assert (tmp_path / "pc.png").exists() and (tmp_path / "ndvi.png").exists()
