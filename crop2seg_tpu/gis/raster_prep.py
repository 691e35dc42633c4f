"""Sentinel-2 .SAFE -> analysis-ready 10 m raster utilities.

Re-design of /root/reference/src/helpers/sentinel2raster.py:108-731. The
array-space operations are numpy/scipy and fully tested:

- ``upsample_to_10m``: cubic upsampling of 20 m (x2) and 60 m (x6) bands,
  nearest for the SCL classification layer (reference __2raster :308-414)
- ``stack_bands``: the 13-band 10 m stack in the reference band order
  [B04,B03,B02,B08,B05,B06,B07,B8A,B11,B12,(B01,B09),SCL] (reference :113-114)
- ``normalized_difference_index`` (reference :505-591)
- ``tile_coordinates`` + ``fast_tiling``: stride-tricks patchify
  (reference :616-676)

Reading JP2000 band files out of a .SAFE archive requires rasterio/GDAL
(absent in this image) — ``read_safe_bands`` degrades with a clear error and
accepts pre-extracted .npy band files as a portable alternative.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from scipy import ndimage

# 10 m output band order (reference sentinel2raster.py:113-114).
BAND_ORDER_10M = ("B04", "B03", "B02", "B08")
BAND_ORDER_20M = ("B05", "B06", "B07", "B8A", "B11", "B12")
BAND_ORDER_60M = ("B01", "B09")
FULL_BAND_ORDER = BAND_ORDER_10M + BAND_ORDER_20M + BAND_ORDER_60M + ("SCL",)

# Scene Classification Layer codes (reference sentinel.py:609-617).
SCL_CODES = {
    0: "NO_DATA", 1: "SATURATED_OR_DEFECTIVE", 2: "DARK_AREA_PIXELS",
    3: "CLOUD_SHADOWS", 4: "VEGETATION", 5: "NOT_VEGETATED", 6: "WATER",
    7: "UNCLASSIFIED", 8: "CLOUD_MEDIUM_PROBABILITY",
    9: "CLOUD_HIGH_PROBABILITY", 10: "THIN_CIRRUS", 11: "SNOW",
}
SCL_CLOUD_SNOW = (3, 8, 9, 10, 11)


def upsample_to_10m(band: np.ndarray, factor: int,
                    categorical: bool = False) -> np.ndarray:
    """Resample a 20 m (factor=2) or 60 m (factor=6) band to 10 m.

    Continuous bands use cubic interpolation, categorical layers (SCL)
    nearest neighbour (reference __2raster :308-414).
    """
    if factor == 1:
        return band
    order = 0 if categorical else 3
    return ndimage.zoom(band, factor, order=order, grid_mode=True,
                        mode="nearest")


def stack_bands(bands: Dict[str, np.ndarray],
                include_60m: bool = True) -> np.ndarray:
    """Band dict (native resolutions) -> (C, H, W) 10 m stack in the
    reference order; missing 60 m bands may be skipped."""
    order = BAND_ORDER_10M + BAND_ORDER_20M \
        + (BAND_ORDER_60M if include_60m else ()) + ("SCL",)
    target = bands[BAND_ORDER_10M[0]].shape
    out = []
    for name in order:
        b = bands[name]
        factor = target[0] // b.shape[0]
        out.append(upsample_to_10m(b, factor, categorical=(name == "SCL")))
    return np.stack(out).astype(np.float32)


def read_safe_bands(safe_dir: str) -> Dict[str, np.ndarray]:
    """Read band arrays from a .SAFE product directory.

    Prefers pre-extracted ``<BAND>.npy`` files (portable path); falls back to
    rasterio JP2000 reads when available.
    """
    npys = {os.path.splitext(os.path.basename(p))[0]: p
            for p in glob.glob(os.path.join(safe_dir, "**", "*.npy"),
                               recursive=True)}
    if npys:
        return {name: np.load(path) for name, path in npys.items()
                if name in FULL_BAND_ORDER}
    try:
        import rasterio
    except ImportError as err:
        raise RuntimeError(
            f"no .npy bands under {safe_dir} and rasterio is unavailable; "
            "extract bands to <BAND>.npy or install rasterio") from err
    bands = {}
    for path in glob.glob(os.path.join(safe_dir, "GRANULE", "*", "IMG_DATA",
                                       "**", "*.jp2"), recursive=True):
        stem = os.path.basename(path)
        for name in FULL_BAND_ORDER:
            if f"_{name}_" in stem or stem.endswith(f"{name}.jp2"):
                with rasterio.open(path) as src:
                    bands[name] = src.read(1)
    return bands


def normalized_difference_index(a: np.ndarray, b: np.ndarray,
                                clip: bool = True) -> np.ndarray:
    """(a - b) / (a + b) with 0 where undefined (reference :505-591)."""
    denom = a + b
    out = np.where(denom == 0, 0.0, (a - b) / np.where(denom == 0, 1, denom))
    if clip:
        out = np.where((out < -1) | (out > 1), 0.0, out)
    return out.astype(np.float32)


def cover_fractions(scl: np.ndarray) -> Dict[str, float]:
    """Nodata + snow/cloud fractions from the SCL layer — the patch QA
    stats (reference dataset_creator.py:540-566)."""
    total = scl.size
    nodata = float(np.count_nonzero(scl == 0)) / total
    cloud_snow = float(np.count_nonzero(np.isin(scl, SCL_CLOUD_SNOW))) / total
    return {"Nodata_Cover": nodata, "Snow_Cloud_Cover": cloud_snow}


def tile_coordinates(shape: Tuple[int, int], tile: int
                     ) -> List[Tuple[int, int]]:
    """Top-left corners of a full tiling grid (reference :616-637)."""
    return [(r, c) for r in range(0, shape[0] - tile + 1, tile)
            for c in range(0, shape[1] - tile + 1, tile)]


def fast_tiling(arr: np.ndarray, tile: int) -> np.ndarray:
    """(..., H, W) -> (n_tiles, ..., tile, tile) zero-copy via stride tricks
    (reference fast_tiling :640-676)."""
    *lead, h, w = arr.shape
    nh, nw = h // tile, w // tile
    sub = arr[..., :nh * tile, :nw * tile]
    s = sub.strides
    shape = tuple(lead) + (nh, nw, tile, tile)
    strides = s[:-2] + (s[-2] * tile, s[-1] * tile, s[-2], s[-1])
    view = np.lib.stride_tricks.as_strided(sub, shape=shape, strides=strides)
    nl = len(lead)
    perm = (nl, nl + 1) + tuple(range(nl)) + (nl + 2, nl + 3)
    return np.ascontiguousarray(view.transpose(perm).reshape(
        (nh * nw,) + tuple(lead) + (tile, tile)))
