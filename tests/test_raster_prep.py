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
