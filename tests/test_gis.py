"""GIS post-processing: polygonize, soften, homogenize, boundary split."""
import numpy as np

from crop2seg_tpu.gis.postprocess import (
    homogenize_boundaries, homogenize_raster, polygonize,
    prediction_to_arrays, soften_by_segments)
from crop2seg_tpu.gis.raster import Affine, GeoRef, save_prediction_raster


def test_affine_roundtrip():
    a = Affine.from_origin(500000.0, 5500000.0, 10.0, 10.0)
    x, y = a.pixel_to_world(5, 7)
    r, c = a.world_to_pixel(x, y)
    assert (round(float(r)), round(float(c))) == (5, 7)


def test_georef_window():
    a = Affine.from_origin(0.0, 100.0, 10.0, 10.0)
    ref = GeoRef(a)
    arr = np.arange(100).reshape(10, 10)
    sub, sref = ref.window(arr, (20.0, 50.0, 50.0, 80.0))
    assert sub.shape == (3, 3)
    assert sub[0, 0] == arr[2, 2]
    assert sref.affine.c == 20.0 and sref.affine.f == 80.0


def test_polygonize_segments():
    classes = np.zeros((8, 8), np.int32)
    classes[:4, :4] = 1
    classes[5:, 5:] = 1   # second, disconnected region of class 1
    classes[0, 7] = 2
    segments, seg_class = polygonize(classes)
    assert segments.max() == 4  # bg, two class-1 islands, one class-2 px
    assert (seg_class == 1).sum() == 2
    assert (seg_class == 2).sum() == 1
    # same-class disconnected regions get different ids
    assert segments[0, 0] != segments[6, 6]
    assert classes[segments == segments[6, 6]].tolist() == [1] * 9


def test_soften_background_override():
    h = w = 6
    proba = np.zeros((h, w, 3))
    proba[..., 0] = 0.5   # weak background everywhere
    proba[..., 2] = 0.4
    classes = np.zeros((h, w), np.int32)
    segments, _ = polygonize(classes)
    out = soften_by_segments(proba, segments)
    # bg only 0.5 <= 0.7 -> overridden by top2 class 2
    assert (out["raster"] == 2).all()
    proba[..., 0] = 0.9
    out2 = soften_by_segments(proba, segments)
    assert (out2["raster"] == 0).all()


def test_homogenize_majority_and_background_rule():
    pred = np.zeros((10, 10), np.int64)
    parcels = np.zeros((10, 10), np.int64)
    parcels[:5, :] = 1
    parcels[5:, :] = 2
    # parcel 1: 60% class 3, 40% class 5 -> 3
    pred[:5, :6] = 3
    pred[:5, 6:] = 5
    # parcel 2: 80% background, 20% class 4 -> background (share > 0.75)
    pred[5:, :2] = 4
    out = homogenize_raster(pred, parcels)
    assert (out[:5] == 3).all()
    assert (out[5:] == 0).all()
    # parcel 2 with only 60% background -> majority crop wins
    pred2 = pred.copy()
    pred2[5:, :4] = 4
    out2 = homogenize_raster(pred2, parcels)
    assert (out2[5:] == 4).all()


def test_homogenize_outside_parcels_zeroed():
    pred = np.full((4, 4), 7, np.int64)
    parcels = np.zeros((4, 4), np.int64)
    parcels[1:3, 1:3] = 1
    out = homogenize_raster(pred, parcels)
    assert out[0, 0] == 0 and out[1, 1] == 7


def test_homogenize_boundaries_split():
    k, h, w = 16, 24, 24
    proba = np.zeros((h, w, k))
    proba[..., 2] = 0.9                       # field class 2 everywhere
    proba[:, 6, :] = 0.0  # vertical wall at col 6
    proba[:, 6, 15] = 0.9                     # vertical boundary wall
    out = homogenize_boundaries(proba, boundary_code=15, min_size=5)
    assert out.shape == (h, w)
    left, right = out[:, :6], out[:, 7:]
    assert (left == 2).all() and (right == 2).all()
    assert (out[:, 6] == 0).all()             # boundary removed
    # small component suppression
    proba2 = np.zeros((h, w, k))
    proba2[..., 15] = 0.9
    proba2[0, 0, 15] = 0.0
    proba2[0, 0, 3] = 0.9                     # 1-px island < min_size
    out2 = homogenize_boundaries(proba2, boundary_code=15, min_size=5)
    assert (out2 == 0).all()


def test_prediction_raster_roundtrip(tmp_path):
    classes = np.random.default_rng(0).integers(0, 15, (32, 32)).astype(np.uint8)
    proba = np.random.default_rng(1).random((32, 32, 4)).astype(np.float32)
    a = Affine.from_origin(500000.0, 5500000.0, 10.0, 10.0)
    path = save_prediction_raster(str(tmp_path / "pred.tif"), classes, proba, a)
    from crop2seg_tpu.gis.raster import load_prediction_raster
    data, aff, crs = load_prediction_raster(path)
    assert data.shape == (5, 32, 32)
    np.testing.assert_array_equal(data[0], classes)
    assert aff.to_tuple() == a.to_tuple() and crs == 32633
