"""Integration: train -> checkpoint -> resume -> test via the train.py CLI
internals on a tiny synthetic dataset (SURVEY.md §4's integration slice)."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from crop2seg_tpu.data import make_synthetic_dataset
    root = tmp_path_factory.mktemp("integration")
    make_synthetic_dataset(str(root / "data"), n_patches=8, hw=16)
    return root


def _run(args):
    import train as train_cli
    cfg = train_cli.parse_config(args)
    return train_cli.main(cfg), cfg


def test_train_then_test_cli(workspace):
    data = str(workspace / "data")
    res = str(workspace / "run")
    common = ["--dataset", "s2tsczcrops", "--dataset_folder", data,
              "--encoder_widths", "[8,8,16]", "--decoder_widths", "[4,8,16]",
              "--out_conv", "[8,15]", "--n_head", "4", "--d_model", "32",
              "--batch_size", "4", "--t_buckets", "[61]",
              "--res_dir", res]
    metrics, _ = _run(common + ["--epochs", "1"])
    assert np.isfinite(metrics["test_loss"])
    assert os.path.exists(os.path.join(res, "conf.json"))
    assert os.path.exists(os.path.join(res, "Fold_1", "trainlog.json"))
    assert os.path.exists(os.path.join(res, "Fold_1", "all_test_metrics.json"))
    assert os.path.exists(os.path.join(res, "all_overall.json"))
    overall = json.load(open(os.path.join(res, "all_overall.json")))
    assert {"micro_IoU", "MACRO_IoU", "Accuracy"} <= set(overall)

    # pure-test run restoring the saved checkpoint (reference --test path)
    metrics2, cfg2 = _run(common + ["--test", "--weight_folder", res,
                                    "--test_region", "interior"])
    assert np.isfinite(metrics2["test_loss"])
    # conf.json contract: model config restored from the run dir
    assert cfg2.d_model == 32 and list(cfg2.encoder_widths) == [8, 8, 16]
