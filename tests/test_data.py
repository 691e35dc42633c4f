"""Data layer: synthetic dataset contract, reader transforms, bucketing."""
import json
import os

import numpy as np
import pytest

from crop2seg_tpu.data import (
    BatchLoader, S2TSCZCropDataset, Transform, collate, load_norm_values,
    make_synthetic_dataset)


@pytest.fixture(scope="module")
def ds_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("s2ds")
    return make_synthetic_dataset(str(folder), n_patches=8, hw=32)


def test_dataset_contract(ds_folder):
    norm = load_norm_values(os.path.join(ds_folder, "NORM_S2_patch.json"))
    ds = S2TSCZCropDataset(ds_folder, norm=True, norm_values=norm,
                           set_type="train", add_ndvi=True)
    assert len(ds) >= 1
    s = ds[0]
    t = s["length"]
    assert s["x"].shape == (t, 32, 32, 11)  # +NDVI channel
    assert s["dates"].shape == (t,)
    assert np.all(np.diff(s["dates"]) > 0)  # strictly increasing day offsets
    assert s["y"].shape == (32, 32)
    # NDVI channel bounded
    assert np.abs(s["x"][..., -1]).max() <= 1.0 + 1e-6
    # normalization: standardized magnitudes
    assert np.abs(s["x"][..., :10]).mean() < 5.0


def test_dataset_abs_rel_dates(ds_folder):
    ds = S2TSCZCropDataset(ds_folder, norm=False, set_type="train",
                           use_abs_rel_enc=True)
    s = ds[0]
    assert s["dates"].shape == (s["length"], 2)
    doy = s["dates"][:, 1]
    assert doy.min() >= 1 and doy.max() <= 366


def test_mono_date(ds_folder):
    ds = S2TSCZCropDataset(ds_folder, norm=False, set_type="train",
                           mono_date=0)
    s = ds[0]
    assert s["length"] == 1 and s["x"].shape[0] == 1


def test_bucket_collate(ds_folder):
    ds = S2TSCZCropDataset(ds_folder, norm=False, set_type="train")
    samples = [ds[i] for i in range(min(4, len(ds)))]
    batch = collate(samples, t_buckets=(32, 48, 61))
    tb = batch["x"].shape[1]
    assert tb in (32, 48, 61)
    assert batch["pad_mask"].shape == (len(samples), tb)
    for i, s in enumerate(samples):
        assert batch["pad_mask"][i].sum() == tb - s["length"]
        np.testing.assert_array_equal(batch["x"][i, s["length"]:], 0.0)


def test_loader_epoch(ds_folder):
    ds = S2TSCZCropDataset(ds_folder, norm=False, set_type="train")
    loader = BatchLoader(ds, batch_size=2, shuffle=True, drop_last=False)
    batches = list(loader)
    assert sum(b["x"].shape[0] for b in batches) == len(ds)
    assert all(b["x"].ndim == 5 for b in batches)


def test_transform_joint_geometry():
    rng = np.random.default_rng(0)
    img = np.zeros((3, 2, 16, 16), np.float32)
    img[:, :, 4, 2] = 1.0
    mask = np.zeros((16, 16), np.int64)
    mask[4, 2] = 7
    tr = Transform()
    for _ in range(10):
        im2, mk2 = tr(img.copy(), mask.copy(), rng)
        # the marked pixel must land at the same place in img and mask
        iy, ix = np.argwhere(mk2 == 7)[0] if (mk2 == 7).any() else (None, None)
        if iy is not None:
            assert im2[0, 0, iy, ix] == 1.0


def test_temporal_dropout(ds_folder):
    ds = S2TSCZCropDataset(ds_folder, norm=False, set_type="train",
                           temporal_dropout=0.5, seed=1)
    full = S2TSCZCropDataset(ds_folder, norm=False, set_type="train")
    s = ds[0]
    assert 1 <= s["length"] <= full[0]["length"]


def test_prefetch_loader(ds_folder):
    from crop2seg_tpu.data.batcher import PrefetchLoader
    ds = S2TSCZCropDataset(ds_folder, norm=False, set_type="train")
    base = BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    pre = PrefetchLoader(base, prefetch=2)
    direct = [b["ids"].tolist() for b in base]
    fetched = [b["ids"].tolist() for b in pre]
    assert fetched == direct and len(pre) == len(base)


def test_device_cache_loader_eval_replay(ds_folder):
    import jax.numpy as jnp
    from crop2seg_tpu.data.batcher import DeviceCacheLoader
    ds = S2TSCZCropDataset(ds_folder, norm=False, set_type="train")
    base = BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False)
    dev = DeviceCacheLoader(base, cast=jnp.bfloat16, shuffle=False)

    epoch1 = list(dev)
    direct = list(base)
    assert len(epoch1) == len(direct) == len(dev)
    # epoch 1 streams the wrapped loader's batches, cast + on device
    for got, want in zip(epoch1, direct):
        assert set(got) == {"x", "dates", "pad_mask", "y"}  # ids/etc dropped
        assert got["x"].dtype == jnp.bfloat16
        assert got["y"].dtype == want["y"].dtype
        np.testing.assert_allclose(np.asarray(got["x"], np.float32),
                                   want["x"], rtol=0.01, atol=0.05)
        np.testing.assert_array_equal(np.asarray(got["y"]), want["y"])

    # eval mode: epoch 2 replays the SAME device buffers (no re-upload)
    epoch2 = list(dev)
    assert len(epoch2) == len(epoch1)
    assert sorted(id(b["x"]) for b in epoch2) \
        == sorted(id(b["x"]) for b in epoch1)


def test_device_cache_loader_reshuffles_composition():
    """shuffle=True: every epoch after the first draws a FRESH per-sample
    permutation and gathers batches from the resident per-bucket stacks —
    same shuffling semantics as the host loader, zero re-upload."""
    from crop2seg_tpu.data.batcher import DeviceCacheLoader

    b, t = 2, 5

    def mk(i):  # batch of samples [2i, 2i+1], sample id encoded in x AND y
        x = np.zeros((b, t, 4, 4, 3), np.float32)
        x[:, 0, 0, 0, 0] = [2 * i, 2 * i + 1]
        y = np.zeros((b, 4, 4), np.int32)
        y[:, 0, 0] = [2 * i, 2 * i + 1]
        return {"x": x, "dates": np.zeros((b, t), np.float32),
                "pad_mask": np.zeros((b, t), bool), "y": y}

    inner = [mk(i) for i in range(4)]
    dev = DeviceCacheLoader(inner, shuffle=True, seed=0)
    list(dev)  # epoch 1: upload
    comps = []
    for _ in range(4):
        ep = []
        for bb in dev:
            xs = np.asarray(bb["x"])[:, 0, 0, 0, 0].astype(int)
            ys = np.asarray(bb["y"])[:, 0, 0]
            np.testing.assert_array_equal(xs, ys)  # leaves stay aligned
            assert len(xs) == b
            ep.append(tuple(xs.tolist()))
        # every epoch covers the full sample set exactly once
        assert sorted(i for tup in ep for i in tup) == list(range(8))
        comps.append(tuple(sorted(ep)))
    assert len(set(comps)) > 1  # composition actually varies across epochs
    assert len(dev) == 4


def test_load_norm_values_orders(tmp_path):
    """load_norm_values returns stats in the order the dataset SERVES:
    'train'-keyed (S2TSCzCrop release, .SAFE order) is reordered by
    PASTIS_CHANNEL_ORDER exactly like the reference (train.py:282-296,
    webapp/prediction.py:232-251); Fold-keyed (PASTIS) and flat formats
    pass through unchanged."""
    import json

    from crop2seg_tpu.data import PASTIS_CHANNEL_ORDER

    safe_mean = np.arange(10, dtype=np.float64)          # .SAFE order 0..9
    safe_std = np.arange(10, dtype=np.float64) + 1
    p = tmp_path / "train.json"
    json.dump({"train": {"mean": safe_mean.tolist(),
                         "std": safe_std.tolist()}}, open(p, "w"))
    nv = load_norm_values(str(p))
    np.testing.assert_array_equal(nv["mean"],
                                  safe_mean[list(PASTIS_CHANNEL_ORDER)])
    np.testing.assert_array_equal(nv["std"],
                                  safe_std[list(PASTIS_CHANNEL_ORDER)])
    # reorder=False keeps .SAFE order (channels_like_pastis=False datasets)
    nv_raw = load_norm_values(str(p), reorder=False)
    np.testing.assert_array_equal(nv_raw["mean"], safe_mean)

    p2 = tmp_path / "folds.json"
    json.dump({"Fold_1": {"mean": safe_mean.tolist(),
                          "std": safe_std.tolist()},
               "Fold_2": {"mean": (safe_mean + 2).tolist(),
                          "std": safe_std.tolist()}}, open(p2, "w"))
    nv2 = load_norm_values(str(p2), folds=[1, 2])
    np.testing.assert_array_equal(nv2["mean"], safe_mean + 1)  # no reorder

    p3 = tmp_path / "flat.json"
    json.dump({"mean": safe_mean.tolist(), "std": safe_std.tolist()},
              open(p3, "w"))
    np.testing.assert_array_equal(load_norm_values(str(p3))["mean"],
                                  safe_mean)
