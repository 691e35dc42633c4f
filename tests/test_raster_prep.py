"""Sentinel-2 raster prep: resampling, band stack, NDI, tiling."""
import numpy as np
import pytest

from crop2seg_tpu.gis.raster_prep import (
    FULL_BAND_ORDER, cover_fractions, fast_tiling,
    normalized_difference_index, stack_bands, tile_coordinates,
    upsample_to_10m)


def test_upsample_shapes_and_nearest():
    b20 = np.arange(16, dtype=np.float32).reshape(4, 4)
    up = upsample_to_10m(b20, 2)
    assert up.shape == (8, 8)
    scl = np.array([[0, 4], [8, 11]], dtype=np.uint8)
    up_scl = upsample_to_10m(scl.astype(np.float32), 2, categorical=True)
    assert set(np.unique(up_scl)) <= {0, 4, 8, 11}   # nearest keeps codes
    assert up_scl[0, 0] == 0 and up_scl[3, 3] == 11


def test_stack_bands_order_and_size():
    rng = np.random.default_rng(0)
    bands = {}
    for n in ("B04", "B03", "B02", "B08"):
        bands[n] = rng.random((12, 12)).astype(np.float32)
    for n in ("B05", "B06", "B07", "B8A", "B11", "B12"):
        bands[n] = rng.random((6, 6)).astype(np.float32)
    for n in ("B01", "B09"):
        bands[n] = rng.random((2, 2)).astype(np.float32)
    bands["SCL"] = rng.integers(0, 11, (6, 6)).astype(np.float32)
    stack = stack_bands(bands)
    assert stack.shape == (13, 12, 12)
    np.testing.assert_array_equal(stack[0], bands["B04"])  # band 0 = B04
    # dropping 60 m bands yields the 11-layer stack used for training
    stack11 = stack_bands(bands, include_60m=False)
    assert stack11.shape == (11, 12, 12)


def test_ndi():
    a = np.array([[2.0, 0.0]], np.float32)
    b = np.array([[1.0, 0.0]], np.float32)
    out = normalized_difference_index(a, b)
    np.testing.assert_allclose(out, [[1 / 3, 0.0]], rtol=1e-6)


def test_cover_fractions():
    scl = np.zeros((10, 10))
    scl[0, :5] = 8   # cloud
    scl[1, :5] = 11  # snow
    frac = cover_fractions(scl)
    assert abs(frac["Snow_Cloud_Cover"] - 0.10) < 1e-9
    assert abs(frac["Nodata_Cover"] - 0.90) < 1e-9


def test_tiling_roundtrip():
    arr = np.arange(3 * 8 * 8).reshape(3, 8, 8).astype(np.float32)
    tiles = fast_tiling(arr, 4)
    assert tiles.shape == (4, 3, 4, 4)
    np.testing.assert_array_equal(tiles[0], arr[:, :4, :4])
    np.testing.assert_array_equal(tiles[1], arr[:, :4, 4:])
    np.testing.assert_array_equal(tiles[2], arr[:, 4:, :4])
    coords = tile_coordinates((8, 8), 4)
    assert coords == [(0, 0), (0, 4), (4, 0), (4, 4)]
    # matches crop2seg_tpu.ops.patchify ordering (row-major)
    import jax.numpy as jnp
    from crop2seg_tpu.ops.patchify import patchify_grid
    p = np.asarray(patchify_grid(jnp.asarray(np.moveaxis(arr, 0, -1)), 4))
    np.testing.assert_array_equal(np.moveaxis(p, -1, 1), tiles)


# --- GDAL-semantics cubic convolution upsample ------------------------------

def _keys_direct(arr, factor, a=-0.5):
    """Independent direct (slow) Keys cubic-convolution resample with the
    GDAL center mapping — oracle for cubic_upsample."""
    import numpy as np

    def k(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
        if t < 2:
            return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
        return 0.0

    h, w = arr.shape
    out = np.zeros((h * factor, w * factor))
    for i in range(h * factor):
        yi = (i + 0.5) / factor - 0.5
        by = int(np.floor(yi))
        for j in range(w * factor):
            xj = (j + 0.5) / factor - 0.5
            bx = int(np.floor(xj))
            acc = 0.0
            for dy in range(-1, 3):
                for dx in range(-1, 3):
                    sy = min(max(by + dy, 0), h - 1)
                    sx = min(max(bx + dx, 0), w - 1)
                    acc += arr[sy, sx] * k(yi - (by + dy)) * k(xj - (bx + dx))
            out[i, j] = acc
    return out


def test_cubic_upsample_matches_direct_keys():
    import numpy as np
    from crop2seg_tpu.gis.raster_prep import cubic_upsample

    rng = np.random.default_rng(3)
    band = rng.uniform(0, 10000, (7, 9))
    for factor in (2, 6):
        fast = cubic_upsample(band, factor)
        direct = _keys_direct(band, factor)
        assert fast.shape == (7 * factor, 9 * factor)
        np.testing.assert_allclose(fast, direct, rtol=1e-5, atol=1e-3)


def test_cubic_upsample_preserves_constants_and_nearest_scl():
    import numpy as np
    from crop2seg_tpu.gis.raster_prep import (
        cubic_upsample, nearest_upsample, upsample_to_10m)

    const = np.full((5, 5), 842.0)
    np.testing.assert_allclose(cubic_upsample(const, 2), 842.0, rtol=1e-6)

    scl = np.arange(9).reshape(3, 3)
    up = nearest_upsample(scl, 2)
    assert up.shape == (6, 6)
    assert (up[0:2, 0:2] == 0).all() and (up[4:6, 4:6] == 8).all()
    # dispatcher: categorical -> nearest (exact integers preserved)
    assert upsample_to_10m(scl, 2, categorical=True).dtype == scl.dtype


def test_raster_resample_and_reproject():
    import numpy as np
    from crop2seg_tpu.gis.raster import Affine
    from crop2seg_tpu.gis.raster_prep import raster_reproject, raster_resample

    affine = Affine.from_origin(460000.0, 5540000.0, 10.0, 10.0)
    arr = np.arange(100, dtype=np.float64).reshape(10, 10)

    up, a2 = raster_resample(arr, affine, 2.0, method="nearest")
    assert up.shape == (20, 20) and abs(a2.a - 5.0) < 1e-9
    assert up[0, 0] == arr[0, 0] and up[-1, -1] == arr[-1, -1]

    bl, _ = raster_resample(arr, affine, 2.0, method="bilinear")
    assert bl.shape == (20, 20)
    # dst (9,9) center -> src (4.25, 4.25): bilinear of the 2x2 at (4,4)
    exp = (arr[4, 4] * 0.75 * 0.75 + arr[4, 5] * 0.75 * 0.25
           + arr[5, 4] * 0.25 * 0.75 + arr[5, 5] * 0.25 * 0.25)
    assert abs(bl[9, 9] - exp) < 1e-9

    # reproject UTM33N -> 5514 and back: content survives (nearest, 10 m)
    rep, rep_affine = raster_reproject(arr, affine, 32633, 5514)
    assert rep.shape[0] >= 10 and rep.shape[1] >= 10
    assert set(np.unique(rep)).issubset(set(np.unique(arr)) | {0.0})
    back, _ = raster_reproject(rep, rep_affine, 5514, 32633)
    # the grids don't align exactly; check gross structure: values from the
    # original populate the interior
    assert np.isin(back[2:-2, 2:-2], arr).mean() > 0.95


def test_windowed_safe_reads(tmp_path):
    """A windowed read touches only the requested cell: memmap-sliced npy
    bands equal the full-decode crop, scaled per band resolution
    (reference sentinel2raster.py:320-329)."""
    import os

    from crop2seg_tpu.gis.raster import Affine
    from crop2seg_tpu.gis.raster_prep import (
        read_safe_bands, window_from_bounds)

    rng = np.random.default_rng(0)
    full = {"B04": rng.integers(0, 10000, (120, 120)).astype(np.uint16),
            "B05": rng.integers(0, 10000, (60, 60)).astype(np.uint16),
            "B01": rng.integers(0, 10000, (20, 20)).astype(np.uint16),
            "SCL": rng.integers(0, 12, (60, 60)).astype(np.uint8)}
    for name, arr in full.items():
        np.save(os.path.join(tmp_path, f"{name}.npy"), arr)

    affine = Affine(10.0, 0.0, 500000.0, 0.0, -10.0, 5600000.0)
    # a 24x36 10m cell at rows 12:36, cols 24:60 (multiples of 6)
    bounds = (500000.0 + 24 * 10, 5600000.0 - 36 * 10,
              500000.0 + 60 * 10, 5600000.0 - 12 * 10)
    win = window_from_bounds(affine, bounds)
    assert win == (12, 36, 24, 60)

    got = read_safe_bands(str(tmp_path), window=win)
    np.testing.assert_array_equal(got["B04"], full["B04"][12:36, 24:60])
    np.testing.assert_array_equal(got["B05"], full["B05"][6:18, 12:30])
    np.testing.assert_array_equal(got["B01"], full["B01"][2:6, 4:10])
    np.testing.assert_array_equal(got["SCL"], full["SCL"][6:18, 12:30])
    # windowless read still returns the full bands
    assert read_safe_bands(str(tmp_path))["B04"].shape == (120, 120)
