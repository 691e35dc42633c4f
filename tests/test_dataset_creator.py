"""DatasetCreator pipeline over a synthetic mini tile with fake loader."""
import json
import os

import numpy as np
import pytest

from crop2seg_tpu.gis.dataset_creator import DatasetCreator, patchify_array
from crop2seg_tpu.gis.raster import Affine


def test_patchify_array_matches_reference_order():
    arr = np.arange(2 * 8 * 8).reshape(2, 8, 8)
    p = patchify_array(arr, 4)
    assert p.shape == (4, 2, 4, 4)
    np.testing.assert_array_equal(p[1], arr[:, :4, 4:])  # row-major grid


def test_inference_pipeline(tmp_path):
    t, c = 3, 13

    def loader(tile_name, bounds):
        rng = np.random.default_rng(0)
        ts = rng.normal(500, 100, (t, c, 1098, 1098)).astype(np.float32)
        return ts, Affine.from_origin(500000, 5500000, 10, 10), 32633, \
            [20190105, 20190210, 20190330]

    dc = DatasetCreator(str(tmp_path / "out"), loader=loader,
                        for_inference=True)
    n = dc.run_tile("T33UVR")
    assert n == 100
    meta = json.load(open(tmp_path / "out" / "metadata.json"))
    assert len(meta) == 100
    x = np.load(tmp_path / "out" / "DATA_S2" / "S2_0.npy")
    assert x.shape == (t, 10, 128, 128)  # B01/B09 + SCL dropped
    assert meta[0]["dates-S2"]["0"] == 20190105


def test_training_pipeline_small(tmp_path, monkeypatch):
    """Exercise the training path on a shrunken grid (3x3 patches)."""
    import crop2seg_tpu.gis.dataset_creator as mod
    monkeypatch.setattr(mod, "TRAIN_GRID", 3)
    monkeypatch.setattr(mod, "TRAIN_OFFSET", 2)
    t, c = 2, 13
    size = 2 + 3 * 128 + 5   # offset + grid + slack

    def loader(tile_name, bounds):
        rng = np.random.default_rng(1)
        ts = rng.normal(500, 100, (t, c, size, size)).astype(np.float32)
        ts[:, -1] = 0.0                   # SCL: all nodata
        ts[:, -1, :200, :200] = 8.0       # some cloud
        return ts, Affine.from_origin(0, 0, 10, 10), 32633, [20190101, 20190501]

    def rasterize(shape, affine):
        labels = np.zeros(shape, np.uint8)
        labels[: shape[0] // 2] = 3       # top half crop class 3
        return labels

    dc = DatasetCreator(str(tmp_path / "out"), loader=loader,
                        rasterize_labels=rasterize, max_background=0.7)
    n = dc.run_tile("T33UVR")
    meta = json.load(open(tmp_path / "out" / "metadata.json"))
    assert len(meta) == 9
    ok = [m for m in meta if m["Status"] == "OK"]
    removed = [m for m in meta if m["Status"] == "REMOVED"]
    assert n == len(ok) and len(removed) > 0  # bottom rows all background
    assert all("Snow_Cloud_Cover" in m for m in meta)
    assert all("affine" in m for m in meta)
    # saved arrays exclude SCL
    x = np.load(tmp_path / "out" / "DATA_S2" / f"S2_{ok[0]['ID_PATCH']}.npy")
    assert x.shape == (t, 10, 128, 128)
    y = np.load(tmp_path / "out" / "ANNOTATIONS" /
                f"TARGET_{ok[0]['ID_PATCH']}.npy")
    assert set(np.unique(y)) <= {0, 3}
