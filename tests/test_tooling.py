"""Dataset curation tooling: cover stats, balanced split, weights, norms."""
import json
import os

import numpy as np
import pytest

from crop2seg_tpu.data.synthetic import make_synthetic_dataset
from crop2seg_tpu.data.tooling import (
    SAMPLE_WEIGHTS, calc_cover_statistics, compute_norm_vals,
    compute_sample_weights, split_tile_grid)


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    return make_synthetic_dataset(str(tmp_path_factory.mktemp("tool")),
                                  n_patches=6, hw=32)


def test_cover_statistics(folder):
    m = calc_cover_statistics(folder)
    assert "Grassland_Cover" in m.columns
    assert (m["Grassland_Cover"] >= 0).all()
    assert os.path.exists(os.path.join(folder, "metadata_and_stats.json"))


def test_split_tile_grid_properties():
    rng = np.random.default_rng(0)
    minority = rng.random((82, 82)) < 0.4
    flax = rng.random((82, 82)) < 0.02
    out = split_tile_grid(minority, flax, np.random.default_rng(42))
    assert out.shape == (82, 82)
    counts = {s: int((out == s).sum()) for s in (1, 2, 3)}
    total = sum(counts.values())
    assert total > 0
    # train is the largest split and ratios are roughly honoured
    assert counts[1] > counts[2] and counts[1] > counts[3]
    assert counts[1] / total > 0.5
    # no val/test component touches a train component (4/8-adjacency):
    # every assigned component is separated by 0-corridors, so dilating the
    # val/test masks by 1 must not overlap train.
    from scipy import ndimage
    valtest = (out == 2) | (out == 3)
    grown = ndimage.binary_dilation(valtest, np.ones((3, 3)))
    assert not (grown & (out == 1)).any()


def test_sample_weights(folder):
    calc_cover_statistics(folder)
    # give every patch a 'set' so weights apply (synthetic already has one)
    w = compute_sample_weights(folder)
    assert (w >= 1).all()


def test_compute_norm_vals(folder):
    out = compute_norm_vals(folder)
    assert len(out["train"]["mean"]) == 10
    blob = json.load(open(os.path.join(folder, "NORM_S2_patch.json")))
    assert "train" in blob
    from crop2seg_tpu.data import load_norm_values
    nv = load_norm_values(os.path.join(folder, "NORM_S2_patch.json"))
    assert nv["mean"].shape == (10,) and (nv["std"] > 0).all()
