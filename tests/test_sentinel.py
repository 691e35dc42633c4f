"""Copernicus client against a fake HTTP session (zero-egress image)."""
import json
import os

import numpy as np
import pytest

from crop2seg_tpu.config import SentinelConfig
from crop2seg_tpu.gis.sentinel import (
    CopernicusClient, Product, build_keywords, rank_product)


class FakeResponse:
    def __init__(self, payload=None, status=200, content=b""):
        self.payload = payload
        self.status_code = status
        self._content = content
        self.headers = {"Content-Length": str(len(content))}

    def json(self):
        return self.payload

    def raise_for_status(self):
        assert self.status_code == 200

    def iter_content(self, chunk_size):
        for i in range(0, len(self._content), chunk_size):
            yield self._content[i:i + chunk_size]

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class FakeSession:
    def __init__(self, payload, content=b"zipbytes"):
        self.payload = payload
        self.content = content
        self.urls = []

    def get(self, url, auth=None, stream=False, **kw):
        self.urls.append(url)
        if "$value" in url:
            return FakeResponse(content=self.content)
        return FakeResponse(payload=self.payload)


def _entry(uuid, title, cloud, snow, size_mb, level="2A"):
    return {
        "id": uuid, "title": title,
        "str": [{"name": "processinglevel", "content": f"Level-{level}"},
                {"name": "size", "content": f"{size_mb} MB"}],
        "double": [{"name": "cloudcoverpercentage", "content": str(cloud)},
                   {"name": "snowicepercentage", "content": str(snow)}],
    }


def _feed(entries):
    return {"feed": {"entry": entries,
                     "opensearch:totalResults": str(len(entries))}}


def test_build_keywords_with_polygon():
    poly = np.array([[14.0, 50.0], [15.0, 50.0], [15.0, 51.0]])
    kw = build_keywords(poly, platformname="Sentinel-2", filename="*T33UVR*")
    assert "platformname:Sentinel-2" in kw
    assert "footprint:" in kw and kw.count("14.0 50.0") == 2  # ring closed


def test_rank_filters():
    cfg = SentinelConfig()
    assert rank_product("L2A", cloud=10, size_mb=800, cfg=cfg) > 0
    assert rank_product("L2A", cloud=90, size_mb=800, cfg=cfg) == 0.0   # cloud cap
    assert rank_product("L2A", cloud=10, size_mb=100, cfg=cfg) == 0.0   # too small
    assert rank_product("other", cloud=0, size_mb=9999, cfg=cfg) == 0.0
    # less cloud and more size rank higher
    assert rank_product("L2A", 5, 900, cfg) > rank_product("L2A", 40, 900, cfg)
    assert rank_product("L2A", 5, 900, cfg) > rank_product("L2A", 5, 500, cfg)


def test_query_rank_and_filters():
    entries = [
        _entry("a", "S2A_low_cloud", cloud=5, snow=0, size_mb=900),
        _entry("b", "S2A_cloudy", cloud=80, snow=0, size_mb=900),
        _entry("c", "S2A_snowy", cloud=5, snow=90, size_mb=900),
        _entry("d", "S2A_small", cloud=5, snow=0, size_mb=100),
        _entry("e", "S2A_mid", cloud=30, snow=0, size_mb=700),
    ]
    sess = FakeSession(_feed(entries))
    client = CopernicusClient(SentinelConfig(), session=sess)
    products = client.query(count=5, platformname="Sentinel-2")
    names = [p.title for p in products]
    assert names[0] == "S2A_low_cloud"
    assert "S2A_cloudy" not in names and "S2A_snowy" not in names
    assert "S2A_small" not in names
    assert "S2A_mid" in names


def test_query_single_entry_dict():
    sess = FakeSession({"feed": {
        "entry": _entry("a", "S2A_single", 5, 0, 900),
        "opensearch:totalResults": "1"}})
    client = CopernicusClient(SentinelConfig(), session=sess)
    products = client.query(count=3, platformname="Sentinel-2")
    assert len(products) == 1 and products[0].uuid == "a"


def test_download_resume_and_unzip(tmp_path):
    import zipfile
    payloadzip = tmp_path / "mk.zip"
    with zipfile.ZipFile(payloadzip, "w") as zf:
        zf.writestr("S2A_x.SAFE/MTD.xml", "<xml/>")
    content = payloadzip.read_bytes()

    sess = FakeSession(_feed([]), content=content)
    client = CopernicusClient(SentinelConfig(), session=sess)
    prods = [Product("u1", "S2A_x", "L2A", 5, 0, 900)]
    out_dir = str(tmp_path / "tiles")
    written = client.download(prods, out_dir)
    assert os.path.exists(written[0] + ".zip")
    assert os.path.exists(written[0] + ".json")
    n_urls = len(sess.urls)
    client.download(prods, out_dir)  # resume: no second fetch
    assert len(sess.urls) == n_urls
    safes = client.unzip(out_dir)
    assert safes and safes[0].endswith("S2A_x.SAFE")
    assert os.path.exists(os.path.join(out_dir, "S2A_x.SAFE", "MTD.xml"))


def test_fetch_time_series_buckets(tmp_path):
    entries = [_entry("a", "S2A_b1", 5, 0, 900)]
    sess = FakeSession(_feed(entries), content=b"zzz")
    cfg = SentinelConfig(dates=("[d1 TO d2]", "[d3 TO d4]"), clouds=(65, 10))
    client = CopernicusClient(cfg, session=sess)
    res = client.fetch_time_series("T33UVR", str(tmp_path / "ts"))
    assert len(res) == 2
    assert all(len(v) >= 0 for v in res.values())
    assert any("T33UVR" in u for u in sess.urls)


def test_with_clouds_relaxation():
    """SentinelConfig.with_clouds returns a relaxed copy (caps at 100) and
    leaves the original untouched — the webapp retry policy (reference
    get_data.py:230-246)."""
    cfg = SentinelConfig(clouds=(65, 95))
    relaxed = cfg.with_clouds(10)
    assert relaxed.clouds == (75, 100)
    assert cfg.clouds == (65, 95)
    assert relaxed.dates == cfg.dates


def test_get_time_series_relax_absolute_and_restored(tmp_path, monkeypatch):
    """Each acquisition retry relaxes from the BASE cloud caps (absolute
    steps, reference get_data.py:230-246) — not compounding on the previous
    attempt — and the caller's client.cfg is restored afterwards so a
    shared client doesn't start the next tile pre-relaxed."""
    from types import SimpleNamespace

    from crop2seg_tpu.gis import dataset_creator as dc_mod
    from crop2seg_tpu.webapp import pipeline

    base = SentinelConfig(clouds=(60, 80))
    client = SimpleNamespace(cfg=base)
    seen = []

    class FailingDC:
        def __init__(self, out, loader=None, for_inference=True,
                     download=False, client=None):
            self.client = client

        def run_tile(self, tile_name, bounds=None):
            seen.append(self.client.cfg.clouds)
            raise RuntimeError("no acquisitions")

    monkeypatch.setattr(dc_mod, "DatasetCreator", FailingDC)
    with pytest.raises(RuntimeError, match="acquisition failed"):
        pipeline.get_time_series("T33UVR", (0, 0, 1, 1), str(tmp_path),
                                 client=client, relax_steps=(0, 10, 20))
    assert seen == [(60, 80), (70, 90), (80, 100)]
    assert client.cfg is base
