"""Segment-raster vectorization + shapefile/GeoJSON writers."""
import json
import struct

import numpy as np

from crop2seg_tpu.gis.postprocess import polygonize
from crop2seg_tpu.gis.raster import Affine
from crop2seg_tpu.gis.vectorize import (
    _mask_rings, polygons_to_geojson, segments_to_polygons, write_shapefile)


def _ring_area(ring):
    return 0.5 * sum(x1 * y2 - x2 * y1
                     for (x1, y1), (x2, y2) in zip(ring, ring[1:]))


def test_square_ring():
    mask = np.zeros((6, 6), bool)
    mask[1:4, 2:5] = True
    rings = _mask_rings(mask)
    assert len(rings) == 1
    ring = rings[0]
    assert ring[0] == ring[-1]
    # area of a 3x3 block = 9 (in row/col space, absolute)
    assert abs(abs(_ring_area(ring)) - 9) < 1e-9
    # 4 corners + closure after collinear collapse
    assert len(ring) == 5


def test_donut_has_hole():
    mask = np.zeros((8, 8), bool)
    mask[1:7, 1:7] = True
    mask[3:5, 3:5] = False
    rings = _mask_rings(mask)
    assert len(rings) == 2
    areas = sorted(abs(_ring_area(r)) for r in rings)
    assert abs(areas[0] - 4) < 1e-9 and abs(areas[1] - 36) < 1e-9


def test_l_shape_single_ring():
    mask = np.zeros((6, 6), bool)
    mask[1:5, 1:3] = True
    mask[3:5, 3:5] = True
    rings = _mask_rings(mask)
    assert len(rings) == 1
    assert abs(abs(_ring_area(rings[0])) - 12) < 1e-9


def test_segments_to_polygons_and_geojson(tmp_path):
    classes = np.zeros((10, 10), np.int32)
    classes[1:4, 1:4] = 3
    classes[6:9, 5:9] = 7
    segments, seg_class = polygonize(classes)
    affine = Affine.from_origin(500000.0, 5600000.0, 10.0, 10.0)
    feats = segments_to_polygons(segments, seg_class, affine)
    assert {f["value"] for f in feats} == {3, 7}
    f3 = next(f for f in feats if f["value"] == 3)
    xs = [p[0] for p in f3["rings"][0]]
    ys = [p[1] for p in f3["rings"][0]]
    assert min(xs) == 500000.0 + 10.0 and max(xs) == 500000.0 + 40.0
    assert max(ys) == 5600000.0 - 10.0 and min(ys) == 5600000.0 - 40.0
    gj = polygons_to_geojson(feats, str(tmp_path / "out.geojson"), crs=32633)
    blob = json.load(open(tmp_path / "out.geojson"))
    assert len(blob["features"]) == 2
    assert blob["crs"]["properties"]["name"] == "EPSG:32633"


def test_write_shapefile(tmp_path):
    classes = np.zeros((8, 8), np.int32)
    classes[2:5, 2:6] = 4
    segments, seg_class = polygonize(classes)
    feats = segments_to_polygons(segments, seg_class)
    shp, shx, dbf = write_shapefile(str(tmp_path / "pred.shp"), feats)
    raw = open(shp, "rb").read()
    assert struct.unpack(">i", raw[:4])[0] == 9994       # magic
    assert struct.unpack("<i", raw[32:36])[0] == 5       # polygon type
    # declared length matches the file
    assert struct.unpack(">i", raw[24:28])[0] * 2 == len(raw)
    # first record is a polygon with 1 ring, 5 points
    rec = raw[100:]
    shape_type, = struct.unpack("<i", rec[8:12])
    nparts, npts = struct.unpack("<2i", rec[44:52])
    assert shape_type == 5 and nparts == 1 and npts == 5
    dbf_raw = open(dbf, "rb").read()
    assert dbf_raw[0] == 0x03 and b"value" in dbf_raw
    assert b"4" in dbf_raw  # the record value


# --- shapefile reader + polygon rasterizer ----------------------------------

def test_read_shapefile_roundtrip(tmp_path):
    """write_shapefile -> read_shapefile recovers rings and DBF values."""
    from crop2seg_tpu.gis.vectorize import read_shapefile

    classes = np.zeros((10, 10), np.int32)
    classes[1:4, 1:5] = 7
    classes[6:9, 3:8] = 2
    segments, seg_class = polygonize(classes)
    feats = segments_to_polygons(segments, seg_class)
    shp, _, _ = write_shapefile(str(tmp_path / "t.shp"), feats)
    back = read_shapefile(shp)
    assert len(back) == len(feats)
    assert sorted(f["value"] for f in back) == sorted(
        f["value"] for f in feats)
    for f in back:
        assert f["rings"] and len(f["rings"][0]) >= 4


def test_rasterize_polygons_roundtrip():
    """polygonize -> segments_to_polygons -> rasterize reproduces the
    class raster exactly (pixel-center containment)."""
    from crop2seg_tpu.gis.vectorize import rasterize_polygons

    classes = np.zeros((12, 12), np.int32)
    classes[2:6, 2:7] = 3
    classes[7:11, 5:9] = 9
    classes[3:5, 3:5] = 0  # hole inside the first region
    segments, seg_class = polygonize(classes)
    feats = segments_to_polygons(segments, seg_class)
    out = rasterize_polygons(feats, classes.shape)
    np.testing.assert_array_equal(out, classes)


def test_rasterize_lpis_to_homogenize_e2e(tmp_path):
    """parcels (vector, 5514) -> raster parcel map (UTM grid) ->
    homogenize_raster majority vote over a prediction (verdict item 9)."""
    from crop2seg_tpu.gis.geo import rasterize_lpis, transform_coords
    from crop2seg_tpu.gis.postprocess import homogenize_raster
    from crop2seg_tpu.gis.raster import Affine
    from crop2seg_tpu.gis.vectorize import write_shapefile

    # a 20x20 UTM33N grid at 10 m somewhere in CZ
    east0, north0 = 460000.0, 5540000.0
    affine = Affine.from_origin(east0, north0, 10.0, 10.0)

    # two rectangular parcels, defined in UTM then converted to 5514
    def parcel(c0, r0, c1, r1, value):
        corners_utm = [(east0 + c0 * 10, north0 - r0 * 10),
                       (east0 + c1 * 10, north0 - r0 * 10),
                       (east0 + c1 * 10, north0 - r1 * 10),
                       (east0 + c0 * 10, north0 - r1 * 10)]
        ring = []
        for e, n in corners_utm:
            x, y = transform_coords(e, n, 32633, 5514)
            ring.append((float(x), float(y)))
        return {"rings": [ring + ring[:1]], "value": value,
                "segment": value}

    feats = [parcel(2, 2, 8, 8, 1), parcel(10, 10, 18, 16, 2)]
    shp, _, _ = write_shapefile(str(tmp_path / "lpis.shp"), feats)

    parcels = rasterize_lpis(shp, (20, 20), affine, src_epsg=5514,
                             dst_epsg=32633)
    # the 5514 roundtrip is metre-accurate -> parcel rectangles survive
    assert parcels[5, 5] == 1 and parcels[12, 12] == 2 and parcels[0, 0] == 0
    assert (parcels == 1).sum() >= 25 and (parcels == 2).sum() >= 30

    pred = np.zeros((20, 20), np.int64)
    pred[2:8, 2:8] = 4          # parcel 1 mostly class 4
    pred[4, 4] = 9              # one dissenting pixel
    pred[10:16, 10:18] = 6      # parcel 2 class 6
    homog = homogenize_raster(pred, parcels)
    inside1 = parcels == 1
    assert (homog[inside1] == 4).all()   # majority vote wins
    inside2 = parcels == 2
    assert (homog[inside2] == 6).all()


def test_prediction_to_points_hard_labels():
    from crop2seg_tpu.gis.vectorize import prediction_to_points

    pred = np.array([[1, 2], [3, 4]], np.int32)
    aff = Affine.from_origin(1000.0, 2000.0, 10.0, 10.0)
    pts = prediction_to_points(pred, aff)
    # pixel CENTERS (reference rasterio.transform.xy offset='center',
    # postprocess.py:150-155): pixel (0,0) -> (1005, 1995)
    assert pts["x"].tolist() == [1005.0, 1015.0, 1005.0, 1015.0]
    assert pts["y"].tolist() == [1995.0, 1995.0, 1985.0, 1985.0]
    assert pts["value"].tolist() == [1, 2, 3, 4]
    assert "proba" not in pts


def test_prediction_to_points_proba_and_stride():
    from crop2seg_tpu.gis.vectorize import prediction_to_points

    rng = np.random.default_rng(0)
    proba = rng.random((4, 4, 3)).astype(np.float32)
    pts = prediction_to_points(proba)
    # hard label = argmax over the class axis (reference postprocess.py:144)
    assert pts["value"].tolist() == np.argmax(
        proba, -1).ravel().astype(int).tolist()
    assert pts["proba"].shape == (16, 3)
    np.testing.assert_array_equal(pts["proba"][5], proba[1, 1])
    sub = prediction_to_points(proba, stride=2)
    assert len(sub["x"]) == 4
    np.testing.assert_array_equal(sub["proba"][3], proba[2, 2])


def test_point_shapefile_roundtrip(tmp_path):
    from crop2seg_tpu.gis.vectorize import (
        prediction_to_points, read_shapefile, write_point_shapefile)

    rng = np.random.default_rng(1)
    proba = rng.random((3, 2, 4)).astype(np.float32)
    aff = Affine.from_origin(500000.0, 5600000.0, 10.0, 10.0)
    pts = prediction_to_points(proba, aff)
    path = str(tmp_path / "points.shp")
    write_point_shapefile(path, pts)
    feats = read_shapefile(path)
    assert len(feats) == 6
    for i, f in enumerate(feats):
        (x, y), = f["points"]
        assert x == pts["x"][i] and y == pts["y"][i]
        assert f["value"] == int(pts["value"][i])
        # per-class probability columns named '0'..'K-1'
        for k in range(4):
            assert abs(f[str(k)] - float(pts["proba"][i, k])) < 1e-5


def test_raster_to_points_roundtrip(tmp_path):
    from crop2seg_tpu.gis.raster import save_prediction_raster
    from crop2seg_tpu.gis.vectorize import raster_to_points

    rng = np.random.default_rng(2)
    proba = rng.random((4, 4, 3)).astype(np.float32)
    proba /= proba.sum(-1, keepdims=True)
    classes = np.argmax(proba, -1).astype(np.uint8)
    aff = Affine.from_origin(0.0, 40.0, 10.0, 10.0)
    path = save_prediction_raster(str(tmp_path / "pred.tif"), classes,
                                  proba, aff)
    pts = raster_to_points(path)
    assert pts["value"].tolist() == classes.ravel().astype(int).tolist()
    np.testing.assert_allclose(
        pts["proba"].reshape(4, 4, 3), proba, atol=1e-6)
    assert pts["x"][0] == 5.0 and pts["y"][0] == 35.0
