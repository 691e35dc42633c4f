"""Integration: train -> checkpoint -> resume -> test via the train.py CLI
internals on a tiny synthetic dataset (SURVEY.md §4's integration slice)."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model/golden tests: minutes on 1 core


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from crop2seg_tpu.data import make_synthetic_dataset
    root = tmp_path_factory.mktemp("integration")
    make_synthetic_dataset(str(root / "data"), n_patches=8, hw=16)
    return root


def _run(args):
    # load our repo-root train.py by explicit path: tests may have put
    # /root/reference on sys.path, whose train.py would shadow ours
    import importlib.util
    path = os.path.join(os.path.dirname(__file__), "..", "train.py")
    spec = importlib.util.spec_from_file_location("crop2seg_train_cli", path)
    train_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_cli)
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


def test_train_cli_data_parallel_mesh(workspace, tmp_path):
    """--num_devices 8 on the virtual CPU mesh must reproduce the
    single-device run exactly: same data order (same seed), GSPMD handles the
    gradient/metric all-reduce, eval batches pad with ignore-labeled rows."""
    import json as _json
    from crop2seg_tpu.data import make_synthetic_dataset
    data = str(tmp_path / "data16")
    make_synthetic_dataset(data, n_patches=16, hw=16)
    common = ["--dataset", "s2tsczcrops", "--dataset_folder", data,
              "--encoder_widths", "[8,8,16]", "--decoder_widths", "[4,8,16]",
              "--out_conv", "[8,15]", "--n_head", "4", "--d_model", "32",
              "--batch_size", "8", "--t_buckets", "[61]", "--epochs", "1"]
    m1, _ = _run(common + ["--res_dir", str(tmp_path / "single")])
    m8, _ = _run(common + ["--res_dir", str(tmp_path / "mesh"),
                           "--num_devices", "8", "--platform", "cpu"])
    assert np.isfinite(m8["test_loss"])
    # pre-update loss must match tightly; post-Adam metrics accumulate
    # reduction-order fp noise through 1/(sqrt(v)+eps), so compare loosely
    log1 = _json.load(open(tmp_path / "single" / "Fold_1" / "trainlog.json"))
    log8 = _json.load(open(tmp_path / "mesh" / "Fold_1" / "trainlog.json"))
    np.testing.assert_allclose(log8["1"]["train_loss"],
                               log1["1"]["train_loss"], rtol=1e-6)
    np.testing.assert_allclose(m8["test_loss"], m1["test_loss"], rtol=5e-3)
    np.testing.assert_allclose(m8["test_IoU"], m1["test_IoU"], atol=0.05)


def test_pastis_five_fold_protocol(tmp_path):
    """--dataset pastis with no --fold must run all 5 folds (reference
    train.py:650-657) and merge the fold confusion matrices into the overall
    JSONs (learning/utils.py:492-532)."""
    import importlib.util
    import json as _json
    from crop2seg_tpu.data import make_synthetic_pastis

    data = str(tmp_path / "pastis")
    make_synthetic_pastis(data, n_patches=10, hw=16)
    res = str(tmp_path / "run")
    path = os.path.join(os.path.dirname(__file__), "..", "train.py")
    spec = importlib.util.spec_from_file_location("crop2seg_train_cli", path)
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    cfg = cli.parse_config([
        "--dataset", "pastis", "--dataset_folder", data,
        "--encoder_widths", "[8,8,16]", "--decoder_widths", "[4,8,16]",
        "--out_conv", "[8,20]", "--n_head", "4", "--d_model", "32",
        "--num_classes", "20", "--batch_size", "2", "--t_buckets", "[14]",
        "--epochs", "1", "--res_dir", res])
    folds = cli.fold_sequence(cfg)
    assert folds == [1, 2, 3, 4, 5]
    for f in folds:
        cfg.fold = f
        cli.main(cfg)
    for f in folds:
        assert os.path.exists(os.path.join(res, f"Fold_{f}",
                                           "all_test_metrics.json"))
    overall = _json.load(open(os.path.join(res, "all_overall.json")))
    # MACRO metrics are NaN when a class never occurs (tiny fixture; the
    # reference's metrics.py:35-85 math behaves identically) — micro is solid
    assert np.isfinite(overall["micro_IoU"]) and np.isfinite(overall["Accuracy"])
    # the merged CM must cover every fold's test pixels: 2 patches x 16^2 each
    from crop2seg_tpu.learning.checkpoint import aggregate_fold_cms
    cm = aggregate_fold_cms(res)
    assert int(cm.sum()) == 10 * 16 * 16

    # fold splits must be disjoint: each fold's test set is 2 distinct patches
    ds_tr, ds_val, ds_te = cli.build_datasets(cfg)
    ids = ([s["id"] for s in map(ds_tr.__getitem__, range(len(ds_tr)))]
           + [s["id"] for s in map(ds_val.__getitem__, range(len(ds_val)))]
           + [s["id"] for s in map(ds_te.__getitem__, range(len(ds_te)))])
    assert sorted(ids) == list(range(10))


def test_reference_torch_checkpoint_import(workspace, tmp_path):
    """--test --weight_folder pointing at a reference-style model.pth.tar:
    the CLI must import the torch weights (train.py contract at reference
    :228-269) and produce per-pixel-faithful logits (golden converters are
    unit-tested; this exercises the CLI wiring end-to-end)."""
    import sys
    import torch
    sys.path.insert(0, "/root/reference")
    from src.backbones.timeunet import TimeUNet_v1

    torch.manual_seed(7)
    ref = TimeUNet_v1(input_dim=10, encoder_widths=[8, 8, 16],
                      decoder_widths=[4, 8, 16], out_conv=[8, 15],
                      n_head=4, d_model=32, d_k=4, pad_value=0).eval()
    wf = tmp_path / "torch_run"
    (wf / "Fold_1").mkdir(parents=True)
    torch.save({"state_dict": ref.state_dict(), "epoch": 3,
                "best_mIoU": 0.5}, wf / "Fold_1" / "model.pth.tar")
    conf = {"model": "timeunet", "input_dim": 10,
            "encoder_widths": [8, 8, 16], "decoder_widths": [4, 8, 16],
            "out_conv": [8, 15], "n_head": 4, "d_model": 32, "d_k": 4,
            "num_classes": 15, "ignore_index": -1}
    json.dump(conf, open(wf / "conf.json", "w"))

    data = str(workspace / "data")
    metrics, cfg = _run([
        "--test", "--weight_folder", str(wf), "--dataset", "s2tsczcrops",
        "--dataset_folder", data, "--batch_size", "4",
        "--t_buckets", "[61]", "--res_dir", str(tmp_path / "out")])
    assert np.isfinite(metrics["test_loss"])
    assert cfg.model == "timeunet" and cfg.d_model == 32


def test_convert_checkpoint_cli(workspace, tmp_path):
    """scripts/convert_checkpoint.py: reference release (model.pth.tar +
    conf.json + inference-format NORM_S2_patch.json) -> ready weight folder;
    `train.py --test --weight_folder <converted>` must run (VERDICT r4
    missing #1; reference contract prediction.py:214-250)."""
    import importlib.util
    import sys

    import torch
    sys.path.insert(0, "/root/reference")
    from src.backbones.timeunet import TimeUNet_v1

    torch.manual_seed(11)
    ref = TimeUNet_v1(input_dim=10, encoder_widths=[8, 8, 16],
                      decoder_widths=[4, 8, 16], out_conv=[8, 15],
                      n_head=4, d_model=32, d_k=4, pad_value=0).eval()
    release = tmp_path / "release"
    release.mkdir()
    torch.save({"state_dict": ref.state_dict(), "epoch": 17,
                "best_mIoU": 0.61, "optimizer": {}},
               release / "model.pth.tar")
    conf = {"model": "timeunet_v1", "input_dim": 10,
            "encoder_widths": [8, 8, 16], "decoder_widths": [4, 8, 16],
            "out_conv": [8, 15], "n_head": 4, "d_model": 32, "d_k": 4,
            "num_classes": 15, "ignore_index": -1}
    json.dump(conf, open(release / "conf.json", "w"))
    # inference-format NORM blob (prediction.py:232-250): the converter must
    # flatten it and apply the PASTIS channel reorder
    norm_src = {"train": {"mean": [float(i) for i in range(10)],
                          "std": [1.0 + i for i in range(10)]}}
    json.dump(norm_src, open(release / "NORM_S2_patch.json", "w"))

    spec = importlib.util.spec_from_file_location(
        "c2s_convert", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "convert_checkpoint.py"))
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)
    out = str(tmp_path / "weights")
    conv.main(["--checkpoint", str(release / "model.pth.tar"),
               "--conf", str(release / "conf.json"),
               "--norm", str(release / "NORM_S2_patch.json"),
               "--out", out])

    assert os.path.exists(os.path.join(out, "Fold_1", "model.ckpt"))
    norm = json.load(open(os.path.join(out, "NORM_S2_patch.json")))
    assert norm["mean"] == [2.0, 1.0, 0.0, 4.0, 5.0, 6.0, 3.0, 7.0, 8.0, 9.0]
    from crop2seg_tpu.learning import checkpoint as ckpt
    payload = ckpt.load_state(os.path.join(out, "Fold_1"))
    assert payload["meta"] == {"epoch": 17, "best_mIoU": 0.61}

    # the converted folder is a working --weight_folder for the test path
    data = str(workspace / "data")
    metrics, cfg = _run(["--test", "--weight_folder", out,
                         "--dataset", "s2tsczcrops", "--dataset_folder", data,
                         "--batch_size", "4", "--t_buckets", "[61]",
                         "--res_dir", str(tmp_path / "testrun")])
    assert np.isfinite(metrics["test_loss"])
    assert cfg.model == "timeunet_v1" and cfg.d_model == 32


def test_device_cache_cli(workspace, tmp_path):
    """--device_cache (dataset-in-HBM replay) must consume exactly the
    uncached epoch-1 batches (same seed, same order -> identical epoch-1
    metrics) and keep training from the resident buffers afterwards."""
    data = str(workspace / "data")
    common = ["--dataset", "s2tsczcrops", "--dataset_folder", data,
              "--encoder_widths", "[8,8,16]", "--decoder_widths", "[4,8,16]",
              "--out_conv", "[8,15]", "--n_head", "4", "--d_model", "32",
              "--batch_size", "4", "--t_buckets", "[61]", "--epochs", "2"]
    plain = str(tmp_path / "plain")
    cached = str(tmp_path / "cached")
    m1, _ = _run(common + ["--res_dir", plain])
    m2, _ = _run(common + ["--res_dir", cached, "--device_cache"])
    assert np.isfinite(m2["test_loss"])
    log1 = json.load(open(os.path.join(plain, "Fold_1", "trainlog.json")))
    log2 = json.load(open(os.path.join(cached, "Fold_1", "trainlog.json")))
    # epoch 1 streams through the same loader stack -> identical batches
    np.testing.assert_allclose(log2["1"]["train_loss"],
                               log1["1"]["train_loss"], rtol=1e-6)
    # epoch 2 replays the device cache (fixed composition, reshuffled order)
    assert np.isfinite(log2["2"]["train_loss"])
    assert np.isfinite(log2["2"]["val_IoU"])


def test_finetune_and_resume_cli(workspace, tmp_path):
    """--finetune loads shape-compatible pretrained weights under a NEW
    config (different head) with a fresh optimizer; --weight_folder without
    --finetune resumes from epoch+1 keeping the old conf.json
    (reference train.py:245-270, 394-425 — the head swap the reference left
    commented out is implemented for real here)."""
    data = str(workspace / "data")
    pre = str(tmp_path / "pretrain")
    common = ["--dataset", "s2tsczcrops", "--dataset_folder", data,
              "--encoder_widths", "[8,8,16]", "--decoder_widths", "[4,8,16]",
              "--n_head", "4", "--d_model", "32", "--batch_size", "4",
              "--t_buckets", "[61]"]
    _run(common + ["--out_conv", "[8,15]", "--epochs", "1",
                   "--res_dir", pre])

    # fine-tune with a DIFFERENT number of classes: the out_conv head leaf
    # mismatches and must stay freshly initialized; everything else loads.
    # (20 classes: the PASTIS-head direction; labels 0..14 stay valid.)
    ft = str(tmp_path / "finetune")
    metrics, cfg = _run(common + ["--out_conv", "[8,20]",
                                  "--num_classes", "20",
                                  "--epochs", "1", "--finetune",
                                  "--weight_folder", pre,
                                  "--res_dir", ft])
    assert np.isfinite(metrics["test_loss"])
    assert cfg.num_classes == 20  # new CLI config won (no conf.json merge)

    # resume: conf.json from the pretrain run wins, epoch continues past 1
    rs = str(tmp_path / "resume")
    metrics2, cfg2 = _run(["--dataset", "s2tsczcrops",
                           "--dataset_folder", data, "--epochs", "2",
                           "--weight_folder", pre, "--res_dir", rs,
                           "--batch_size", "4"])
    assert np.isfinite(metrics2["test_loss"])
    assert cfg2.num_classes == 15 and cfg2.d_model == 32
    log = json.load(open(os.path.join(rs, "Fold_1", "trainlog.json")))
    assert "1" in log or 1 in log     # carried over from the pretrain run
    assert "2" in log or 2 in log     # the resumed epoch
