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
    from crop2seg_tpu.data.transforms import Transform

    ds = _mk(dataset_dir, temporal_dropout=0.5)
    assert ds.native_batch_plan()["augment"]  # dropout runs natively now
    ds2 = _mk(dataset_dir, add_ndvi=True)
    assert ds2.native_batch_plan() is None
    # geometric transform: native; noise/crop variants: Python
    assert _mk(dataset_dir,
               transform=Transform()).native_batch_plan()["augment"]
    assert _mk(dataset_dir,
               transform=Transform(add_noise=True)).native_batch_plan() is None
    assert _mk(dataset_dir,
               transform=Transform(crop=True)).native_batch_plan() is None


def test_native_npy_shape(dataset_dir):
    shape = native.npy_shape(os.path.join(dataset_dir, "DATA_S2", "S2_0.npy"))
    assert shape == (9, 10, 32, 32)


@pytest.mark.parametrize("dtype", [np.uint16, np.int16, np.uint8])
def test_native_integer_archives(tmp_path, dtype):
    """The reference dataset creator saves DATA_S2 as uint16
    (sentinel2raster.py:396); the native parser must widen, not reject."""
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 250, (6, 10, 16, 16)).astype(dtype)
    p = str(tmp_path / "u.npy")
    np.save(p, arr)
    x, mask, lengths = native.load_batch(
        [p], 8, 16, 16, reorder=[2, 1, 0, 4, 5, 6, 3, 7, 8, 9],
        mean=np.full(10, 100.0), std=np.full(10, 50.0))
    assert lengths[0] == 6 and mask[0].tolist() == [False] * 6 + [True] * 2
    want = (arr.astype(np.float32)[:, [2, 1, 0, 4, 5, 6, 3, 7, 8, 9]]
            - 100.0) / 50.0
    np.testing.assert_allclose(x[0, :6], np.transpose(want, (0, 2, 3, 1)),
                               rtol=1e-5, atol=1e-5)


def test_load_batch_mean_without_std_raises(tmp_path):
    p = str(tmp_path / "v.npy")
    np.save(p, np.zeros((2, 3, 4, 4), np.float32))
    with pytest.raises(ValueError, match="together"):
        native.load_batch([p], 4, 4, 4, mean=np.zeros(3))
    with pytest.raises(ValueError, match="shape"):
        native.load_batch([p], 4, 4, 4, mean=np.zeros(2), std=np.ones(2))


def test_batcher_falls_back_on_bad_native_file(dataset_dir, tmp_path):
    """A dtype the C++ parser rejects mid-run must downgrade to the Python
    path, not kill training."""
    p = str(tmp_path / "c8.npy")
    np.save(p, np.zeros((3, 10, 32, 32), np.complex64))
    with pytest.raises(OSError):
        native.load_batch([p], 4, 32, 32)


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


def test_native_augmented_matches_python(dataset_dir):
    """Geometric augmentation + temporal dropout through the native gather
    path must be bit-identical to the Python __getitem__ path for an
    identical RNG stream (transforms.index_map is built by pushing an index
    field through the same ops the Python path applies to the data)."""
    from crop2seg_tpu.data.batcher import BatchLoader
    from crop2seg_tpu.data.transforms import Transform

    kw = dict(transform=Transform(), temporal_dropout=0.3)
    ds_py = _mk(dataset_dir, **kw)
    ds_nat = _mk(dataset_dir, **kw)
    assert ds_nat.native_batch_plan()["augment"]
    py = list(BatchLoader(ds_py, batch_size=3, shuffle=False, drop_last=False,
                          t_buckets=(8, 12), native=False))
    nat = list(BatchLoader(ds_nat, batch_size=3, shuffle=False,
                           drop_last=False, t_buckets=(8, 12), native=True))
    assert len(py) == len(nat) == 2
    for bp, bn in zip(py, nat):
        assert set(bp) == set(bn)
        for k in bp:
            np.testing.assert_allclose(
                np.asarray(bn[k], np.float64), np.asarray(bp[k], np.float64),
                rtol=1e-6, atol=1e-6, err_msg=k)


def test_native_augmented_speed(dataset_dir):
    """The augmented native path stays near the plain native rate (the
    gather adds one extra pass per plane, not a Python fallback)."""
    from crop2seg_tpu.data.batcher import BatchLoader
    from crop2seg_tpu.data.transforms import Transform

    ds = _mk(dataset_dir, transform=Transform(), temporal_dropout=0.2)
    loader = BatchLoader(ds, batch_size=6, shuffle=False, drop_last=False,
                         t_buckets=(12,), native=True)
    assert loader._plan is not None and loader._plan["augment"]
    for batch in loader:
        assert batch["x"].shape[0] == 6
        assert np.isfinite(batch["x"]).all()
