"""CZ grid picker: closed-form WGS84 -> (tile, cell) spatial join + the
self-contained interactive map (reference home.py:13-77, get_data.py:33-110)."""
import numpy as np
import pytest

from crop2seg_tpu.webapp.map_picker import (
    CZ_TILES, cz_grid_map_html, cz_tile_origins, parse_selection, pick_patch)
from crop2seg_tpu.webapp.pipeline import cell_from_xy, mgrs_tile_origin


def test_pick_patch_known_points():
    from crop2seg_tpu.gis.geo import utm_to_wgs84

    # construct the expected answer independently: a point 3 cells east,
    # 2 cells south of T33UWR's origin, via the inverse UTM transform
    ox, oy = mgrs_tile_origin("T33UWR")
    e, n = ox + 3.5 * 10980, oy - 2.5 * 10980
    lon, lat = utm_to_wgs84(e, n, 33)
    got = pick_patch(float(lat), float(lon))
    assert got["cell"] == 2 * 10 + 3
    assert got["tile"] in CZ_TILES
    # the join must be self-consistent: the point falls inside the
    # returned cell's bounds
    left, bottom, right, top = got["bounds"]
    ge, gn = got["utm"]
    assert left <= ge < right and bottom < gn <= top


def test_pick_patch_overlap_deterministic():
    # tile footprints overlap ~9.8 km; the join must return the tile whose
    # centre is nearest, and be stable across calls
    from crop2seg_tpu.gis.geo import utm_to_wgs84

    ox, oy = mgrs_tile_origin("T33UVQ")
    e, n = ox + 105000.0, oy - 50000.0   # inside UVQ's east overlap strip
    lon, lat = utm_to_wgs84(e, n, 33)
    a = pick_patch(float(lat), float(lon))
    b = pick_patch(float(lat), float(lon))
    assert a["tile"] == b["tile"] == "T33UWQ"  # WQ centre is nearer
    assert a["cell"] == cell_from_xy(mgrs_tile_origin("T33UWQ"), e, n)


def test_pick_patch_outside_raises():
    with pytest.raises(ValueError):
        pick_patch(38.0, 15.0)  # Sicily, not Czechia


def test_parse_selection():
    assert parse_selection("T33UVR:42") == ("T33UVR", 42)
    assert parse_selection("33uwq:7") == ("T33UWQ", 7)
    for bad in ("T33ABC:1", "T33UVR:120", "T33UVR"):
        with pytest.raises(ValueError):
            parse_selection(bad)


def test_cz_grid_map_html(tmp_path):
    out = tmp_path / "map.html"
    html = cz_grid_map_html(selected="T33UVR:42", path=str(out))
    assert out.read_text() == html
    # all 12 tiles x 100 cells present and clickable
    assert html.count("<rect") == 1200
    assert html.count('data-tile="T33UVR"') == 100
    for t in CZ_TILES:
        assert f'data-tile="{t}"' in html
    # pre-selection highlighted exactly once, status reflects it
    assert html.count('class="sel"') == 1
    assert "selected T33UVR:42" in html
    # self-contained: no external fetches of any kind (the svg xmlns is an
    # identifier, not a fetch)
    stripped = html.replace('xmlns="http://www.w3.org/2000/svg"', "")
    assert "http" not in stripped.lower()
    assert "<script>" in html and "viewBox" in html


def test_cz_tile_origins_modes(tmp_path):
    # MGRS fallback covers every tile; a bogus index path must not break it
    origins = cz_tile_origins()
    assert set(origins) == set(CZ_TILES)
    origins2 = cz_tile_origins(index_path=str(tmp_path / "missing.shp"))
    assert origins2 == origins


def test_corrupt_index_falls_back(tmp_path):
    # truncated/non-shapefile bytes raise struct/Value errors in the header
    # parser; the origins must degrade to MGRS, not crash the page render
    bad = tmp_path / "bad.shp"
    bad.write_bytes(b"definitely not a shapefile")
    assert cz_tile_origins(index_path=str(bad)) == cz_tile_origins()


def test_tile_geometry_constants_agree():
    """The cell/tile geometry is declared in four modules (pipeline stays
    importable without jax, so it cannot import ops.patchify); this pins
    them together so they cannot drift."""
    from crop2seg_tpu.gis import dataset_creator
    from crop2seg_tpu.ops import patchify
    from crop2seg_tpu.webapp import map_picker, pipeline

    assert pipeline.CELL_PX == patchify.INFER_TILE == dataset_creator.INFER_TILE
    assert pipeline.CELLS_PER_SIDE == dataset_creator.INFER_GRID
    assert pipeline.TILE_PX == patchify.TRAIN_TILE
    assert pipeline.TILE_PX == pipeline.CELL_PX * pipeline.CELLS_PER_SIDE
    assert map_picker.TILE_M == pipeline.TILE_PX * 10.0
