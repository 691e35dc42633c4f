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


def test_cm_with_totals_margins():
    """Margins match hand-computed recall/precision/IoU/F1 with an ignored
    class (reference insert_totals, confusion_matrix_pretty_print.py:133-222)."""
    import numpy as np
    from crop2seg_tpu.utils.visualize import cm_with_totals

    cm = np.array([[5, 1, 0],
                   [2, 7, 1],
                   [0, 3, 9]], float)
    table, rlab, clab = cm_with_totals(cm, ignore_index=[0])
    k = 3
    # Sum margins count everything
    assert table[0, k] == 6 and table[k, 0] == 7 and table[k, k] == cm.sum()
    # class 1 (relevant): row/col sums restricted to relevant classes
    sum_lin_c = cm[:, 1:].sum(1)      # exclude ignored col
    sum_col_c = cm[1:, :].sum(0)      # exclude ignored row
    assert np.isclose(table[1, k + 1], cm[1, 1] / sum_lin_c[1])   # recall
    assert np.isclose(table[k + 1, 1], cm[1, 1] / sum_col_c[1])   # precision
    iou1 = cm[1, 1] / (sum_lin_c[1] + sum_col_c[1] - cm[1, 1])
    assert np.isclose(table[1, k + 2], iou1)
    # ignored class carries -0.0 sentinel like the reference
    assert table[0, k + 1] == 0.0 and np.signbit(table[0, k + 1])
    # OA over relevant classes only
    oa = (cm[1, 1] + cm[2, 2]) / sum_lin_c[1:].sum()
    assert np.isclose(table[k + 1, k + 1], oa)
    assert rlab[-1] == "F1 score" and clab[-1] == "IoU"


def test_new_plot_functions_render(tmp_path):
    import numpy as np
    from crop2seg_tpu.utils.visualize import (
        plot_band_over_time, plot_pretty_confusion_matrix,
        plot_spectral_profile)

    x = np.random.default_rng(0).uniform(0, 1e4, (4, 12, 12, 10))
    f1 = plot_spectral_profile(x, time=1, path=str(tmp_path / "sp.png"))
    f2 = plot_band_over_time(x, band=3, path=str(tmp_path / "bt.png"))
    cm = np.random.default_rng(1).integers(0, 50, (15, 15)).astype(float)
    f3 = plot_pretty_confusion_matrix(cm, ignore_index=[0, 14],
                                      path=str(tmp_path / "cm.png"))
    for f, name in ((f1, "sp"), (f2, "bt"), (f3, "cm")):
        assert (tmp_path / f"{name}.png").stat().st_size > 0


def test_load_window_metrics_and_plot(tmp_path):
    """Temporal-window ablation loader: until-series with a full-window tail
    and NaN gaps (reference analyze_ts.py:146-227)."""
    import json

    import numpy as np
    from crop2seg_tpu.utils.visualize import (
        load_window_metrics, plot_time_dependence)

    (tmp_path / "all_overall_until_jan20190101.json").write_text(
        json.dumps({"MACRO_IoU": 0.5}))
    (tmp_path / "all_overall_until_mar20190301.json").write_text(
        json.dumps({"MACRO_IoU": 0.6}))
    (tmp_path / "all_overall_full.json").write_text(
        json.dumps({"MACRO_IoU": 0.7}))
    v = load_window_metrics(str(tmp_path), what="overall", how="until")
    assert v.shape == (11,)
    assert np.isclose(v[0], 50) and np.isclose(v[2], 60) and np.isclose(v[-1], 70)
    assert np.isnan(v[1]) and np.isnan(v[3])
    fig = plot_time_dependence(str(tmp_path), what="overall", how="until",
                               out_path=str(tmp_path / "tw.png"))
    assert (tmp_path / "tw.png").stat().st_size > 0


def test_crop_map_view(tmp_path):
    """Webapp crop-map view: legend map + LPIS boundary overlay + confidence
    dimming (reference webapp/postprocess.py:59-183)."""
    from crop2seg_tpu.utils.visualize import plot_crop_map

    rng = np.random.default_rng(0)
    classes = rng.integers(0, 15, (64, 64))
    parcels = np.repeat(np.repeat(rng.integers(0, 9, (8, 8)), 8, 0), 8, 1)
    conf = rng.random((64, 64))
    plot_crop_map(classes, lpis_parcels=parcels, confidence=conf,
                  path=str(tmp_path / "crop_map.png"))
    assert (tmp_path / "crop_map.png").exists()
