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
