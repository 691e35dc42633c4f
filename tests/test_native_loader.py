"""Native C++ batch loader vs the pure-Python dataset/collate path."""
import json
import os
import time

import numpy as np
import pytest

from crop2seg_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader not built (no g++)")


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    folder = tmp_path_factory.mktemp("ds")
    os.makedirs(folder / "DATA_S2")
    os.makedirs(folder / "ANNOTATIONS")
    rng = np.random.default_rng(0)
    records = []
    lengths = [9, 12, 7, 12, 10, 8]
    for i, t in enumerate(lengths):
        np.save(folder / "DATA_S2" / f"S2_{i}.npy",
                rng.normal(500, 100, (t, 10, 32, 32)).astype(np.float32))
        np.save(folder / "ANNOTATIONS" / f"TARGET_{i}.npy",
                rng.integers(0, 15, (32, 32)).astype(np.int64))
        records.append({
            "ID_PATCH": i, "TILE": "T33UVR", "Status": "OK", "set": "train",
            "Fold": 1, "crs": 32633, "time-series_length": t,
            "dates-S2": {str(j): 20190101 + j for j in range(t)}})
    json.dump(records, open(folder / "metadata.json", "w"))
    return str(folder)


def _mk(dataset_dir, **kw):
    from crop2seg_tpu.data import S2TSCZCropDataset
    norm = {"mean": np.full(10, 500.0), "std": np.full(10, 100.0)}
    return S2TSCZCropDataset(dataset_dir, norm=True, norm_values=norm,
                             set_type="train", **kw)


def test_native_matches_python_collate(dataset_dir):
    from crop2seg_tpu.data.batcher import BatchLoader

    ds = _mk(dataset_dir)
    assert ds.native_batch_plan() is not None
    py = list(BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                          t_buckets=(12,), native=False))
    nat = list(BatchLoader(ds, batch_size=3, shuffle=False, drop_last=False,
                           t_buckets=(12,), native=True))
    assert len(py) == len(nat) == 2
    for bp, bn in zip(py, nat):
        assert set(bp) == set(bn)
        for k in bp:
            np.testing.assert_allclose(
                np.asarray(bn[k], np.float64), np.asarray(bp[k], np.float64),
                rtol=1e-6, atol=1e-6, err_msg=k)


def test_native_plan_gating(dataset_dir):
    ds = _mk(dataset_dir, temporal_dropout=0.5)
    assert ds.native_batch_plan() is None  # augmentation path stays Python
    ds2 = _mk(dataset_dir, add_ndvi=True)
    assert ds2.native_batch_plan() is None


def test_native_npy_shape(dataset_dir):
    shape = native.npy_shape(os.path.join(dataset_dir, "DATA_S2", "S2_0.npy"))
    assert shape == (9, 10, 32, 32)


def test_native_f16_and_speed(dataset_dir, tmp_path):
    """float16 archives decode correctly; native beats Python on repeat."""
    rng = np.random.default_rng(1)
    arr = rng.normal(500, 100, (8, 10, 32, 32)).astype(np.float16)
    p = str(tmp_path / "h.npy")
    np.save(p, arr)
    x, mask, lengths = native.load_batch(
        [p], 10, 32, 32, reorder=[2, 1, 0, 4, 5, 6, 3, 7, 8, 9],
        mean=np.full(10, 500.0), std=np.full(10, 100.0))
    assert x.shape == (1, 10, 32, 32, 10) and lengths[0] == 8
    assert mask[0].tolist() == [False] * 8 + [True] * 2
    want = (arr.astype(np.float32)[:, [2, 1, 0, 4, 5, 6, 3, 7, 8, 9]]
            - 500.0) / 100.0
    np.testing.assert_allclose(x[0, :8], np.transpose(want, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)
