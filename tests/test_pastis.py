"""PASTIS reader against a synthetic on-disk fixture (geojson contract)."""
import json
import os

import numpy as np
import pytest

from crop2seg_tpu.data.pastis import PASTISDataset


@pytest.fixture(scope="module")
def pastis_folder(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("pastis"))
    os.makedirs(os.path.join(folder, "DATA_S2"))
    os.makedirs(os.path.join(folder, "ANNOTATIONS"))
    os.makedirs(os.path.join(folder, "INSTANCE_ANNOTATIONS"))
    rng = np.random.default_rng(0)
    feats = []
    for i in range(4):
        t = int(rng.integers(5, 9))
        np.save(os.path.join(folder, "DATA_S2", f"S2_{i}.npy"),
                rng.normal(0, 1, (t, 10, 16, 16)).astype(np.float32))
        target = rng.integers(0, 20, (3, 16, 16)).astype(np.uint8)
        np.save(os.path.join(folder, "ANNOTATIONS", f"TARGET_{i}.npy"), target)
        inst = np.zeros((16, 16), np.int32)
        inst[2:6, 2:6] = 1
        inst[8:12, 8:12] = 2
        np.save(os.path.join(folder, "INSTANCE_ANNOTATIONS", f"HEATMAP_{i}.npy"),
                rng.random((16, 16)).astype(np.float32))
        np.save(os.path.join(folder, "INSTANCE_ANNOTATIONS", f"INSTANCES_{i}.npy"), inst)
        np.save(os.path.join(folder, "INSTANCE_ANNOTATIONS", f"ZONES_{i}.npy"), inst)
        dates = {str(j): int(f"2019{(j % 12) + 1:02d}{(j % 27) + 1:02d}")
                 for j in range(t)}
        feats.append({"type": "Feature", "geometry": None,
                      "properties": {"ID_PATCH": i, "Fold": (i % 5) + 1,
                                     "dates-S2": dates}})
    with open(os.path.join(folder, "metadata.geojson"), "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return folder


def test_pastis_semantic(pastis_folder):
    ds = PASTISDataset(pastis_folder, norm=False, target="semantic")
    s = ds[0]
    assert s["x"].shape[1:] == (16, 16, 10)
    assert s["y"].shape == (16, 16)          # channel 0 of the target stack
    assert s["dates"].shape == (s["length"],)


def test_pastis_folds(pastis_folder):
    ds = PASTISDataset(pastis_folder, norm=False, folds=[1])
    assert len(ds) == 1


def test_pastis_instance_target(pastis_folder):
    ds = PASTISDataset(pastis_folder, norm=False, target="instance")
    s = ds[0]
    assert s["y"].shape == (16, 16, 7)
    # parcels get their (h, w) size written inside their voronoi zone
    assert s["y"][3, 3, 3] == 4.0 and s["y"][3, 3, 4] == 4.0


def test_pastis_ndvi_norm(pastis_folder):
    norm = {"mean": np.zeros(10, np.float32), "std": np.ones(10, np.float32)}
    ds = PASTISDataset(pastis_folder, norm=True, norm_values=norm,
                       add_ndvi=True)
    s = ds[0]
    assert s["x"].shape[-1] == 11
    assert np.abs(s["x"][..., -1]).max() <= 1.0 + 1e-6
