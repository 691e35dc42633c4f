"""Geodesy + grid bookkeeping + LPIS fetch."""
import io
import zipfile

import numpy as np
import pytest

from crop2seg_tpu.gis.geo import (
    get_lpis, get_row_col, get_subtile_id, utm_to_wgs84, wgs84_to_utm)


def test_utm_roundtrip_prague():
    # Prague ~ (14.42 E, 50.09 N), UTM zone 33N
    e, n = wgs84_to_utm(14.42, 50.09, 33)
    assert 455000 < e < 465000        # known UTM33 coordinates of Prague
    assert 5540000 < n < 5560000
    lon, lat = utm_to_wgs84(e, n, 33)
    assert abs(lon - 14.42) < 1e-6 and abs(lat - 50.09) < 1e-6


def test_utm_known_point():
    # zone central meridian: lon=15 -> easting exactly 500000
    e, n = wgs84_to_utm(15.0, 50.0, 33)
    assert abs(e - 500000.0) < 1e-6
    assert abs(n - 5538630.7) < 5.0   # k0 * meridian_arc(50 deg)


def test_grid_bookkeeping():
    assert get_row_col(0) == (0, 0)
    assert get_row_col(82) == (1, 0)
    assert get_row_col(82 * 81 + 5) == (81, 5)
    assert get_subtile_id(0) == 0
    assert get_subtile_id(82 * 81 + 81) == 99
    # middle of the grid lands in a middle cell
    sub = get_subtile_id(41 * 82 + 41)
    assert 0 < sub < 99


class _FakeResp:
    def __init__(self, content):
        self._c = content
        self.headers = {}

    def raise_for_status(self):
        pass

    def iter_content(self, chunk_size):
        yield self._c

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _FakeSession:
    def __init__(self, content):
        self.content = content
        self.calls = 0

    def get(self, url, stream=False, **kw):
        self.calls += 1
        return _FakeResp(self.content)


def test_get_lpis_download_and_cache(tmp_path):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("20191231-CR-DPB-SHP.shp", b"fake")
        zf.writestr("20191231-CR-DPB-SHP.dbf", b"fake")
    sess = _FakeSession(buf.getvalue())
    shp = get_lpis(2019, str(tmp_path), session=sess)
    assert shp.endswith(".shp") and sess.calls == 1
    shp2 = get_lpis(2019, str(tmp_path), session=sess)  # cached
    assert shp2 == shp and sess.calls == 1


# --- Krovak / EPSG:5514 -----------------------------------------------------

def test_krovak_epsg_guidance_point():
    """EPSG Guidance Note 7-2 test point for method 9819 (Krovak):
    Bessel-datum 50d12'32.4416"N 16d50'59.1790"E (Greenwich) ->
    Westing 568990.97, Southing 1050538.63 (EPSG:5514 negates both)."""
    from crop2seg_tpu.gis.geo import krovak_forward, krovak_inverse

    lat = 50 + 12 / 60 + 32.4416 / 3600
    lon = 16 + 50 / 60 + 59.1790 / 3600
    x, y = krovak_forward(lon, lat)
    assert abs(x - (-568990.97)) < 0.05
    assert abs(y - (-1050538.63)) < 0.05
    lon2, lat2 = krovak_inverse(x, y)
    assert abs(float(lon2) - lon) < 1e-9 and abs(float(lat2) - lat) < 1e-9


def test_sjtsk_utm_roundtrip_and_datum_shift():
    """5514 <-> UTM33N via the WGS84 pivot: roundtrip < 1 cm, and the
    7-parameter Helmert (position-vector) agrees with the independent
    EPSG 3-parameter shift (589, 76, 480) to within its ~10 m accuracy
    (the coordinate-frame sign convention would be ~35 m off)."""
    import crop2seg_tpu.gis.geo as geo
    from crop2seg_tpu.gis.geo import transform_coords

    lon, lat = 14.4208, 50.0875  # Prague
    x, y = transform_coords(lon, lat, 4326, 5514)
    # S-JTSK Prague: X (easting) ~ -742.8 km, Y (northing) ~ -1043.0 km
    assert abs(x - (-742841.3)) < 1.0 and abs(y - (-1043004.6)) < 1.0

    gx, gy, gz = geo._geodetic_to_geocentric(lon, lat, geo._A, geo._E2)
    sx, sy, sz = geo._helmert(gx, gy, gz, (589.0, 76.0, 480.0, 0, 0, 0, 0),
                              inverse=True)
    lo, la = geo._geocentric_to_geodetic(sx, sy, sz, geo._BESSEL_A,
                                         geo._BESSEL_E2)
    x3, y3 = geo.krovak_forward(lo, la)
    assert abs(x - x3) < 15 and abs(y - y3) < 15

    e, n = transform_coords(x, y, 5514, 32633)
    x2, y2 = transform_coords(e, n, 32633, 5514)
    assert abs(x2 - x) < 0.01 and abs(y2 - y) < 0.01


def test_transform_coords_array_and_identity():
    import numpy as np
    from crop2seg_tpu.gis.geo import transform_coords

    xs = np.array([-743000.0, -744000.0])
    ys = np.array([-1043000.0, -1044000.0])
    e, n = transform_coords(xs, ys, 5514, 32633)
    assert e.shape == xs.shape and np.all((e > 200000) & (e < 800000))
    sx, sy = transform_coords(xs, ys, 5514, 5514)
    assert np.allclose(sx, xs) and np.allclose(sy, ys)
