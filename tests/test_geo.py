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
