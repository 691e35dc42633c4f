"""Legacy .SAFE band/mask loaders (gis/safe_legacy.py) on a fake tree.

Reference surface: /root/reference/src/helpers/sentinel.py:619-1428.
"""
import os
from datetime import datetime

import numpy as np
import pytest

from crop2seg_tpu.gis import safe_legacy as sl

MTD_TL = """<?xml version="1.0"?>
<n1:Level-2A_Tile_ID xmlns:n1="https://psd">
  <n1:Geometric_Info>
    <Tile_Geocoding>
      <HORIZONTAL_CS_CODE>EPSG:32633</HORIZONTAL_CS_CODE>
      <Size resolution="10"><NROWS>12</NROWS><NCOLS>12</NCOLS></Size>
      <Size resolution="20"><NROWS>6</NROWS><NCOLS>6</NCOLS></Size>
      <Size resolution="60"><NROWS>2</NROWS><NCOLS>2</NCOLS></Size>
      <Geoposition resolution="10"><ULX>500000</ULX><ULY>5600000</ULY>
        <XDIM>10</XDIM><YDIM>-10</YDIM></Geoposition>
      <Geoposition resolution="20"><ULX>500000</ULX><ULY>5600000</ULY>
        <XDIM>20</XDIM><YDIM>-20</YDIM></Geoposition>
      <Geoposition resolution="60"><ULX>500000</ULX><ULY>5600000</ULY>
        <XDIM>60</XDIM><YDIM>-60</YDIM></Geoposition>
    </Tile_Geocoding>
  </n1:Geometric_Info>
</n1:Level-2A_Tile_ID>
"""

GML = """<?xml version="1.0"?>
<eop:Mask xmlns:eop="http://eop" xmlns:gml="http://www.opengis.net/gml/3.2">
 <gml:Polygon>
  <gml:exterior><gml:LinearRing>
   <gml:posList srsDimension="2">
     500000 5600000 500120 5600000 500120 5599880 500000 5599880
     500000 5600000
   </gml:posList>
  </gml:LinearRing></gml:exterior>
 </gml:Polygon>
</eop:Mask>
"""


@pytest.fixture
def safe_tree(tmp_path):
    base = tmp_path / "T33UVR.SAFE" / "GRANULE" / "L2A_T33UVR"
    rng = np.random.default_rng(0)
    data = {}
    for res, size in (("R10m", 12), ("R20m", 6), ("R60m", 2)):
        d = base / "IMG_DATA" / res
        os.makedirs(d)
        for band in sl.RES_BANDS[res][:4] if res != "R20m" else \
                sl.RES_BANDS[res]:
            arr = rng.integers(0, 10000, (size, size)).astype(np.uint16)
            np.save(d / f"T33UVR_{band}_{res[1:]}.npy", arr)
            data[(res, band)] = arr
    scl = np.full((6, 6), 4, np.uint8)
    scl[0, 1], scl[1, 0], scl[1, 2], scl[2, 5], scl[3, 0] = 8, 9, 3, 10, 11
    np.save(base / "IMG_DATA" / "R20m" / "T33UVR_SCL_20m.npy", scl)
    data[("R20m", "SCL")] = scl
    os.makedirs(base / "QI_DATA")
    with open(base / "QI_DATA" / "MSK_CLOUDS_B00.gml", "w") as fh:
        fh.write(GML)
    with open(base / "MTD_TL.xml", "w") as fh:
        fh.write(MTD_TL)
    return str(tmp_path / "T33UVR.SAFE"), data


def test_load_channel_and_band(safe_tree):
    safe, data = safe_tree
    r20 = sl.load_channel(safe, "R20m")
    assert r20.shape == (9, 6, 6)
    np.testing.assert_array_equal(r20[0], data[("R20m", "B02")])
    one = sl.load_channel(safe, "R20m", band="B05")
    np.testing.assert_array_equal(one[0], data[("R20m", "B05")])
    assert sl.load_channel(safe, "R20m", band="B99").size == 0


def test_load_tile_20m_grid(safe_tree):
    safe, data = safe_tree
    only = sl.load_tile_20m(safe)
    assert only.shape == (9, 6, 6)
    full = sl.load_tile_20m(safe, only_20m=False)
    # 4 R10m (block-mean /2) + 9 R20m + 4 R60m (x3 nearest)
    assert full.shape == (17, 6, 6)


def test_rescale_block_mean_exact():
    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    y = sl.rescale(x, 0.5, "area")
    np.testing.assert_allclose(y[0], [[2.5, 4.5], [10.5, 12.5]])
    up = sl.rescale(y, 2, "nearest")
    assert up.shape == (1, 4, 4)
    assert up[0, 0, 0] == up[0, 1, 1] == 2.5


def test_tile_bounds_and_geoposition(safe_tree):
    safe, _ = safe_tree
    affine, shape, epsg = sl.tile_geoposition(safe, "R20m")
    assert epsg == 32633 and shape == (6, 6)
    assert (affine.a, affine.e) == (20.0, -20.0)
    left, bottom, right, top = sl.tile_bounds(safe, "R20m")
    assert (left, top) == (500000.0, 5600000.0)
    assert (right, bottom) == (500120.0, 5599880.0)


def test_cloud_mask_scl_and_snow(safe_tree):
    safe, data = safe_tree
    clouds = sl.load_cloud_mask(safe, "R20m")
    scl = data[("R20m", "SCL")]
    np.testing.assert_array_equal(clouds, np.isin(scl, (3, 8, 9, 10)))
    snow = sl.load_cloud_mask(safe, "R20m", kind="SNOW")
    np.testing.assert_array_equal(snow, scl == 11)


def test_cloud_mask_gml_fallback(safe_tree):
    safe, _ = safe_tree
    # hide SCL so the GML path kicks in
    scl = os.path.join(safe, "GRANULE", "L2A_T33UVR", "IMG_DATA", "R20m",
                       "T33UVR_SCL_20m.npy")
    os.rename(scl, scl + ".bak")
    try:
        mask = sl.load_cloud_mask(safe, "R20m")
    finally:
        os.rename(scl + ".bak", scl)
    # GML square covers the whole 120x120 m tile = all 6x6 20 m px
    assert mask.shape == (6, 6) and mask.all()


GML_HOLE = """<?xml version="1.0"?>
<eop:Mask xmlns:eop="http://eop" xmlns:gml="http://www.opengis.net/gml/3.2">
 <gml:Polygon>
  <gml:exterior><gml:LinearRing>
   <gml:posList srsDimension="2">
     500000 5600000 500120 5600000 500120 5599880 500000 5599880
     500000 5600000
   </gml:posList>
  </gml:LinearRing></gml:exterior>
  <gml:interior><gml:LinearRing>
   <gml:posList srsDimension="2">
     500040 5599960 500080 5599960 500080 5599920 500040 5599920
     500040 5599960
   </gml:posList>
  </gml:LinearRing></gml:interior>
 </gml:Polygon>
</eop:Mask>
"""


def test_cloud_mask_gml_interior_hole(safe_tree):
    """Interior (hole) rings must stay UNcloudy (ADVICE r3: each posList
    used to rasterize as its own filled polygon, marking holes cloudy)."""
    safe, _ = safe_tree
    scl = os.path.join(safe, "GRANULE", "L2A_T33UVR", "IMG_DATA", "R20m",
                       "T33UVR_SCL_20m.npy")
    gml = os.path.join(safe, "GRANULE", "L2A_T33UVR", "QI_DATA",
                       "MSK_CLOUDS_B00.gml")
    os.rename(scl, scl + ".bak")
    with open(gml) as fh:
        orig = fh.read()
    with open(gml, "w") as fh:
        fh.write(GML_HOLE)
    try:
        mask = sl.load_cloud_mask(safe, "R20m")
    finally:
        os.rename(scl + ".bak", scl)
        with open(gml, "w") as fh:
            fh.write(orig)
    expected = np.ones((6, 6), bool)
    expected[2:4, 2:4] = False  # the 40x40 m hole = center 2x2 px
    np.testing.assert_array_equal(mask, expected)


def test_crop_by_shape(safe_tree):
    safe, data = safe_tree
    affine, _, _ = sl.tile_geoposition(safe, "R20m")
    arr = sl.load_channel(safe, "R20m").astype(np.float32)
    ring = [(500000, 5600000), (500040, 5600000), (500040, 5599960),
            (500000, 5599960), (500000, 5600000)]
    out, new = sl.crop_by_shape(arr, affine, [ring])
    assert out.shape == (9, 2, 2)
    np.testing.assert_array_equal(out[0], arr[0, :2, :2])
    assert (new.c, new.f) == (500000.0, 5600000.0)


def test_merge_bands_roundtrip(safe_tree, tmp_path):
    safe, data = safe_tree
    out = sl.merge_bands(safe, str(tmp_path / "merged.tif"), "R20m")
    if out.endswith(".npz"):
        blob = np.load(out)
        stack, crs = blob["data"], int(blob["crs"])
    else:
        import rasterio

        with rasterio.open(out) as src:
            stack = src.read()
            crs = src.crs.to_epsg()
            assert (src.transform.a, src.transform.e) == (20.0, -20.0)
    assert stack.shape == (9, 6, 6)
    assert crs == 32633
    np.testing.assert_array_equal(stack[0], data[("R20m", "B02")])


class _FakeResp:
    def __init__(self, payload):
        self._p = payload

    def json(self):
        return self._p


class _FakeSession:
    def __init__(self, payload):
        self.payload = payload
        self.urls = []

    def get(self, url):
        self.urls.append(url)
        return _FakeResp(self.payload)


def test_overpasses_cycle_replication(tmp_path):
    payload = {"overpasses": [
        {"date": "2024-05-01T10:00:00Z", "satellite": "Sentinel-2A",
         "acquisition": True,
         "geometry": {"coordinates": [15.0, 50.0]}},
        {"date": "2024-05-06T10:00:00Z", "satellite": "Sentinel-2B",
         "acquisition": False,
         "geometry": {"coordinates": [15.1, 50.1]}},
    ]}
    sess = _FakeSession(payload)
    now = datetime(2024, 5, 1, 0, 0)
    csv = str(tmp_path / "op.csv")
    rows = sl.sentinel2_overpasses((15.0, 50.0), days_after=25, session=sess,
                                   now=now, export_csv=csv)
    dates = [r["date"] for r in rows]
    assert dates == sorted(dates)
    # base cycle + 2 replications; the horizon (now + 25 d) drops the
    # final replicated pass, matching the reference's `date <= to_date`
    # filter (sentinel.py:1424)
    assert len(rows) == 5
    assert rows[0]["acquisition"] is True
    assert all(r["acquisition"] is None for r in rows[2:])
    assert "POINT(15.0 50.0)" in sess.urls[0]
    assert os.path.exists(csv)
    with pytest.raises(RuntimeError):
        sl.sentinel2_overpasses((15.0, 50.0), session=None)


def test_l1c_flat_layout(tmp_path):
    """L1C products keep bands in a flat IMG_DATA folder (no R{res}m
    subdirs) — reference sentinel_load_channel globs both layouts."""
    base = tmp_path / "L1C.SAFE" / "GRANULE" / "L1C_T33UVR" / "IMG_DATA"
    os.makedirs(base)
    rng = np.random.default_rng(1)
    arrs = {}
    for band in ("B05", "B06", "B11"):
        arr = rng.integers(0, 10000, (4, 4)).astype(np.uint16)
        np.save(base / f"T33UVR_20240501T100031_{band}.npy", arr)
        arrs[band] = arr
    files = sl.find_band_files(str(tmp_path / "L1C.SAFE"), "R20m")
    assert set(files) == {"B05", "B06", "B11"}
    ch = sl.load_channel(str(tmp_path / "L1C.SAFE"), "R20m")
    assert ch.shape == (3, 4, 4)
    np.testing.assert_array_equal(ch[0], arrs["B05"])


def test_rescale_cubic_upscale_matches_raster_prep():
    from crop2seg_tpu.gis.raster_prep import cubic_upsample

    x = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    y = sl.rescale(x, 2, "cubic")
    np.testing.assert_allclose(y[0], cubic_upsample(x[0], 2))
    import pytest

    with pytest.raises(ValueError):
        sl.rescale(x, 1.5)
    with pytest.raises(ValueError):
        sl.rescale(x, 1 / 3 + 1e-3)
