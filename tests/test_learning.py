"""Losses / metrics / boundary ops vs torch + reference-formula oracles."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from crop2seg_tpu.learning import losses
from crop2seg_tpu.learning.metrics import (
    IoUMeter, confusion_matrix, confusion_matrix_analysis, iou_from_cm,
    top2_prediction)
from crop2seg_tpu.ops.boundary import boundary_mask, dilate_classes

B, H, W, K = 2, 16, 16, 15


def _data(seed=0):
    g = torch.Generator().manual_seed(seed)
    logits = torch.randn(B, K, H, W, generator=g)
    target = torch.randint(0, K, (B, H, W), generator=g)
    return logits, target


def _j(logits):
    return jnp.asarray(logits.numpy().transpose(0, 2, 3, 1))


def test_cross_entropy_weighted():
    logits, target = _data()
    w = torch.rand(K) + 0.1
    w[-1] = 0.0  # ignore class via zero weight (reference train.py:464-466)
    want = F.cross_entropy(logits, target, weight=w)
    got = losses.cross_entropy(_j(logits), jnp.asarray(target.numpy()),
                               weight=jnp.asarray(w.numpy()))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_cross_entropy_label_smoothing():
    logits, target = _data(1)
    want = F.cross_entropy(logits, target, label_smoothing=0.1)
    got = losses.cross_entropy(_j(logits), jnp.asarray(target.numpy()),
                               label_smoothing=0.1)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_cross_entropy_weighted_smoothed():
    logits, target = _data(2)
    w = torch.rand(K) + 0.1
    want = F.cross_entropy(logits, target, weight=w, label_smoothing=0.15)
    got = losses.cross_entropy(_j(logits), jnp.asarray(target.numpy()),
                               weight=jnp.asarray(w.numpy()),
                               label_smoothing=0.15)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_focal_ce():
    import sys
    sys.path.insert(0, "/root/reference")
    from src.learning.focal_loss import FocalCELoss
    logits, target = _data(3)
    target[0, :4] = -100
    want = FocalCELoss(gamma=2.0, ignore_index=-100)(logits, target.view(-1))
    got = losses.focal_cross_entropy(_j(logits), jnp.asarray(target.numpy()),
                                     gamma=2.0, ignore_index=-100)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def _get_dilated_oracle(target, n_classes, connectivity=4):
    """torch oracle implementing the reference formula
    (/root/reference/src/learning/utils.py:198-222); the reference module
    itself imports torchnet/rasterio which are absent here."""
    if connectivity == 8:
        weights = torch.ones((n_classes, 1, 3, 3))
    else:
        weights = torch.tensor([[0., 1., 0.], [1., 1., 1.], [0., 1., 0.]]
                               ).view(1, 1, 3, 3).repeat(n_classes, 1, 1, 1)
    onehot = F.one_hot(target.long(), num_classes=n_classes).permute(0, 3, 1, 2)
    return F.conv2d(onehot.float(), weights, groups=n_classes,
                    padding=(1, 1)).bool().long()


def test_boundary_mask_vs_reference():
    get_dilated = lambda t, k, dev, conn: _get_dilated_oracle(t, k, conn)
    _, target = _data(4)
    for conn in (4, 8):
        dil_t = get_dilated(target, K, "cpu", conn).numpy()  # (B, K, H, W)
        dil_j = np.transpose(np.asarray(dilate_classes(
            jnp.asarray(target.numpy()), K, conn)), (0, 3, 1, 2))
        np.testing.assert_array_equal(dil_j, dil_t)
        want_b = (dil_t.sum(1) > 1).astype(np.int32)
        got_b = np.asarray(boundary_mask(jnp.asarray(target.numpy()), K, conn))
        np.testing.assert_array_equal(got_b, want_b)


def test_smooth_cross_entropy_vs_reference():
    # torch oracle implementing SmoothCrossEntropy2D
    # (/root/reference/src/learning/smooth_loss.py:54-80); that module's
    # import chain needs torchnet, absent here.
    logits, target = _data(5)
    target = target.clamp(0, 14)
    dilated = _get_dilated_oracle(target, K, 4)
    ls, bg_val = 0.1, 0.6
    eps = ls / K
    exp_small = eps * (K - dilated.sum(1))
    exp_large = (1 - exp_small) / dilated.sum(1)
    target_out = torch.where(dilated.permute(1, 0, 2, 3) == 1, exp_large,
                             eps).permute(0, 1, 2, 3).permute(1, 0, 2, 3)
    bg = torch.tensor([bg_val] + list(losses.S2TSCZ_CLASS_PROPORTIONS))
    bg[1:] *= 1 - bg_val
    target_out = torch.where(target[:, None, ...] == 0, bg[:, None, None],
                             target_out)
    want = F.cross_entropy(logits, target_out)
    got = losses.smooth_cross_entropy_2d(_j(logits), jnp.asarray(target.numpy()))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_confusion_matrix_and_iou():
    g = torch.Generator().manual_seed(6)
    pred = torch.randint(0, K, (4096,), generator=g).numpy()
    targ = torch.randint(0, K, (4096,), generator=g).numpy()
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(targ), K))
    # numpy oracle (reference miou.py:104-117)
    want = np.bincount(pred + K * targ, minlength=K * K).reshape(K, K)
    np.testing.assert_array_equal(cm, want)

    iou, miou, acc = iou_from_cm(cm, ignore_index=0)
    cm2 = want.astype(float).copy()
    cm2[:, 0] = 0
    cm2[0, :] = 0
    tp = np.diag(cm2)
    ref_iou = tp / (cm2.sum(0) + cm2.sum(1) - tp)
    np.testing.assert_allclose(np.nan_to_num(iou), np.nan_to_num(ref_iou))
    assert abs(miou - float(np.nanmean(ref_iou)) * 100) < 1e-9
    assert abs(acc - float(tp.sum() / cm2.sum()) * 100) < 1e-9

    meter = IoUMeter(K, ignore_index=0)
    meter.add_cm(cm)
    meter.add_cm(cm)
    m2, a2 = meter.get_miou_acc()
    assert abs(m2 - miou) < 1e-9 and abs(a2 - acc) < 1e-9


def test_confusion_matrix_out_of_range_labels_dropped():
    """The one-hot matmul CM must drop out-of-range labels exactly like the
    reference's bincount-with-masking (miou.py:104-117): an invalid target
    or prediction contributes to no cell."""
    pred = np.array([0, 1, 2, 3, -1, 2], np.int32)
    targ = np.array([0, 1, 3, 9, 1, -5], np.int32)  # 9, -5 out of range for K=4
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(targ), 4))
    valid = (pred >= 0) & (pred < 4) & (targ >= 0) & (targ < 4)
    want = np.bincount(pred[valid] + 4 * targ[valid], minlength=16).reshape(4, 4)
    np.testing.assert_array_equal(cm, want)
    assert cm.sum() == valid.sum()


def test_confusion_matrix_analysis_matches_reference_formula():
    g = torch.Generator().manual_seed(7)
    mat = torch.randint(0, 50, (K, K), generator=g).numpy().astype(float)
    per_class, overall = confusion_matrix_analysis(mat)
    tp = mat.diagonal().sum()
    assert abs(overall["Accuracy"] - tp / mat.sum()) < 1e-12
    j = 3
    tpj = mat[j, j]
    fpj = mat[:, j].sum() - tpj
    fnj = mat[j, :].sum() - tpj
    assert abs(per_class["3"]["IoU"] - tpj / (tpj + fpj + fnj)) < 1e-12


def test_top2_prediction():
    logits, target = _data(8)
    lj = _j(logits)
    tj = jnp.asarray(target.numpy())
    got = np.asarray(top2_prediction(lj, tj))
    pred_ = torch.topk(logits, 2, dim=1).indices
    want = torch.where(target == pred_[:, 1], pred_[:, 1], pred_[:, 0]).numpy()
    np.testing.assert_array_equal(got, want)


def test_recall_ce_runs():
    logits, target = _data(9)
    out = losses.recall_cross_entropy(_j(logits), jnp.asarray(target.numpy()),
                                      n_classes=K)
    assert np.isfinite(float(out))


def test_profiling_utils():
    import jax
    import jax.numpy as jnp
    from crop2seg_tpu.models import UNet3D
    from crop2seg_tpu.utils.profiling import (
        StepMeter, count_params, inference_time, model_characteristics)

    # UNet3D: the cheapest-to-compile temporal-signature model (the utils
    # are model-agnostic; a UTAE here costs ~25 s of pure XLA compile)
    m = UNet3D(n_classes=3, feats=2)
    stats = model_characteristics(m, batch_shape=(1, 3, 16, 16, 4))
    assert stats["n_params"] > 0

    fn = jax.jit(lambda x: x * 2)
    t = inference_time(fn, (jnp.ones((8, 8)),), repetitions=5, warmup=1)
    assert t["mean_ms"] > 0 and t["p99_ms"] >= t["p50_ms"]

    meter = StepMeter()
    meter.update(4)
    meter.update(4)
    rates = meter.rates()
    assert rates["steps_per_sec"] > 0 and rates["samples_per_sec"] > 0
