"""Geodesy + patch-grid bookkeeping helpers.

Re-design of /root/reference/src/helpers/utils.py:22-123:
- ``utm_to_wgs84`` / ``wgs84_to_utm``: closed-form Transverse Mercator
  (Karney-style series, sub-cm for UTM use) replacing the reference's pyproj
  dependency (absent in this image).
- ``get_row_col`` / ``get_subtile_id``: bookkeeping on the 82x82 patch grid
  used by the dataset splits and the webapp's 10x10 sub-cell picker.
LPIS acquisition (reference webapp/get_data.py:113-173) lives here too.
"""
from __future__ import annotations

import logging
import math
import os
import zipfile
from typing import Tuple

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1 / 298.257223563
_K0 = 0.9996
_E2 = _F * (2 - _F)
_EP2 = _E2 / (1 - _E2)


def wgs84_to_utm(lon: float, lat: float, zone: int) -> Tuple[float, float]:
    """(lon, lat) degrees -> (easting, northing) in the given UTM zone
    (northern hemisphere)."""
    lon0 = math.radians(zone * 6 - 183)
    phi = math.radians(lat)
    lam = math.radians(lon) - lon0
    n = _A / math.sqrt(1 - _E2 * math.sin(phi) ** 2)
    t = math.tan(phi) ** 2
    c = _EP2 * math.cos(phi) ** 2
    a = math.cos(phi) * lam
    m = _A * ((1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256) * phi
              - (3 * _E2 / 8 + 3 * _E2 ** 2 / 32 + 45 * _E2 ** 3 / 1024)
              * math.sin(2 * phi)
              + (15 * _E2 ** 2 / 256 + 45 * _E2 ** 3 / 1024) * math.sin(4 * phi)
              - (35 * _E2 ** 3 / 3072) * math.sin(6 * phi))
    east = _K0 * n * (a + (1 - t + c) * a ** 3 / 6
                      + (5 - 18 * t + t ** 2 + 72 * c - 58 * _EP2)
                      * a ** 5 / 120) + 500000.0
    north = _K0 * (m + n * math.tan(phi) * (
        a ** 2 / 2 + (5 - t + 9 * c + 4 * c ** 2) * a ** 4 / 24
        + (61 - 58 * t + t ** 2 + 600 * c - 330 * _EP2) * a ** 6 / 720))
    return east, north


def utm_to_wgs84(east: float, north: float, zone: int) -> Tuple[float, float]:
    """(easting, northing) northern-hemisphere UTM -> (lon, lat) degrees."""
    x = east - 500000.0
    m = north / _K0
    mu = m / (_A * (1 - _E2 / 4 - 3 * _E2 ** 2 / 64 - 5 * _E2 ** 3 / 256))
    e1 = (1 - math.sqrt(1 - _E2)) / (1 + math.sqrt(1 - _E2))
    phi1 = (mu + (3 * e1 / 2 - 27 * e1 ** 3 / 32) * math.sin(2 * mu)
            + (21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32) * math.sin(4 * mu)
            + (151 * e1 ** 3 / 96) * math.sin(6 * mu)
            + (1097 * e1 ** 4 / 512) * math.sin(8 * mu))
    n1 = _A / math.sqrt(1 - _E2 * math.sin(phi1) ** 2)
    r1 = _A * (1 - _E2) / (1 - _E2 * math.sin(phi1) ** 2) ** 1.5
    t1 = math.tan(phi1) ** 2
    c1 = _EP2 * math.cos(phi1) ** 2
    d = x / (n1 * _K0)
    phi = phi1 - (n1 * math.tan(phi1) / r1) * (
        d ** 2 / 2 - (5 + 3 * t1 + 10 * c1 - 4 * c1 ** 2 - 9 * _EP2)
        * d ** 4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 ** 2 - 252 * _EP2 - 3 * c1 ** 2)
        * d ** 6 / 720)
    lam = (d - (1 + 2 * t1 + c1) * d ** 3 / 6
           + (5 - 2 * c1 + 28 * t1 - 3 * c1 ** 2 + 8 * _EP2 + 24 * t1 ** 2)
           * d ** 5 / 120) / math.cos(phi1)
    lon0 = zone * 6 - 183
    return lon0 + math.degrees(lam), math.degrees(phi)


def get_row_col(patch_id_within_tile: int, grid: int = 82) -> Tuple[int, int]:
    """Local patch id -> (row, col) on the tile's patch grid
    (reference helpers/utils.py:71-83)."""
    return patch_id_within_tile // grid, patch_id_within_tile % grid


def get_subtile_id(patch_id_within_tile: int, grid: int = 82,
                   parts: int = 10) -> int:
    """Local patch id -> 10x10 webapp sub-cell index
    (reference helpers/utils.py:86-123 with parts=11 -> 100 cells)."""
    r, c = get_row_col(patch_id_within_tile, grid)
    cell = grid / parts
    return min(int(r / cell), parts - 1) * parts + min(int(c / cell), parts - 1)


def get_lpis(year: int, cache_dir: str, session=None,
             url_template: str = ("https://eagri.cz/public/app/eagriapp/lpisdata/"
                                  "{year}1231-CR-DPB-SHP.zip")) -> str:
    """Download + unzip the yearly Czech LPIS parcel shapefile
    (reference webapp/get_data.py:113-173). Returns the .shp path."""
    os.makedirs(cache_dir, exist_ok=True)
    name = f"{year}1231-CR-DPB-SHP"
    shp = os.path.join(cache_dir, name + ".shp")
    if os.path.exists(shp):
        return shp
    if session is None:
        import requests
        session = requests.Session()
    url = url_template.format(year=year)
    logging.info("downloading LPIS %s", url)
    zpath = os.path.join(cache_dir, name + ".zip")
    with session.get(url, stream=True) as r:
        r.raise_for_status()
        with open(zpath, "wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
    with zipfile.ZipFile(zpath) as zf:
        zf.extractall(cache_dir)
    return shp


def rasterize_lpis(shp_path: str, shape: Tuple[int, int], affine,
                   value_column: str = "value") -> np.ndarray:
    """Rasterize LPIS parcels onto the prediction grid; requires the GDAL
    stack (geopandas+rasterio), gated with a clear error otherwise
    (reference dataset_creator.py:687-723)."""
    try:
        import geopandas as gpd
        import rasterio.features
    except ImportError as err:
        raise RuntimeError(
            "rasterizing LPIS shapefiles needs geopandas+rasterio; "
            "alternatively pass a pre-rasterized parcel map to "
            "homogenize_raster") from err
    gdf = gpd.read_file(shp_path)
    shapes = ((geom, int(v)) for geom, v in
              zip(gdf.geometry, gdf[value_column]))
    import rasterio
    tr = rasterio.Affine(*affine.to_tuple())
    return rasterio.features.rasterize(
        shapes, out_shape=shape, transform=tr, fill=0, dtype="int32")
