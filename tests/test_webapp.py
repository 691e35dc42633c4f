"""Headless webapp pipeline: cell bounds, prediction flow, cache mgmt."""
import json
import os

import numpy as np
import pytest

from crop2seg_tpu.webapp.pipeline import (
    CELL_PX, CacheManager, generate_prediction, get_info, mgrs_tile_origin,
    tile_cell_bounds)

pytestmark = pytest.mark.slow  # full-model/golden tests: minutes on 1 core


def test_cell_bounds_grid():
    origin = (500000.0, 5600000.0)
    b0 = tile_cell_bounds(origin, 0)
    assert b0[0] == 500000.0 and b0[3] == 5600000.0
    assert abs((b0[2] - b0[0]) - CELL_PX * 10) < 1e-6
    b9 = tile_cell_bounds(origin, 9)      # row 0, col 9
    assert b9[0] == 500000.0 + 9 * CELL_PX * 10
    b10 = tile_cell_bounds(origin, 10)    # row 1, col 0
    assert b10[3] == 5600000.0 - CELL_PX * 10


def test_get_info_mgrs():
    info = get_info("T33UVR", 5)
    assert info["crs"] == 32633
    left, bottom, right, top = info["bounds"]
    assert right > left and top > bottom
    e, n = mgrs_tile_origin("T33UVR")
    assert e == 400000.0          # column V in set 3 -> 4th easting step
    assert 5_000_000 < n < 6_500_000  # band U (Czech latitudes)


def test_generate_prediction_end_to_end(tmp_path):
    """Small end-to-end webapp inference with a trained-from-init model."""
    import jax

    from crop2seg_tpu.data.synthetic import make_synthetic_dataset
    from crop2seg_tpu.learning import checkpoint as ckpt
    from crop2seg_tpu.models.factory import get_model

    # fake 'inference cell': reuse DatasetCreator contract with 4 patches by
    # monkeypatching is heavy; instead make a tiny for_inference dataset dir
    folder = str(tmp_path / "cell")
    os.makedirs(folder + "/DATA_S2")
    rng = np.random.default_rng(0)
    t = 5
    records = []
    for i in range(100):
        np.save(f"{folder}/DATA_S2/S2_{i}.npy",
                rng.normal(500, 100, (t, 10, 128, 128)).astype(np.float32))
        records.append({"ID_PATCH": i, "TILE": "T33UVR", "Status": "OK",
                        "time-series_length": t, "crs": 32633, "set": "",
                        "Fold": 1,
                        "dates-S2": {str(j): 20190100 + j + 1 for j in range(t)},
                        "affine": [10.0, 0.0, 500000.0, 0.0, -10.0, 5600000.0]})
    json.dump(records, open(f"{folder}/metadata.json", "w"))

    # model dir with conf + init checkpoint + norm values
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir + "/Fold_1")
    conf = {"model": "timeunet", "num_classes": 15, "input_dim": 10,
            "encoder_widths": [8, 8, 16], "decoder_widths": [4, 8, 16],
            "out_conv": [8, 15], "n_head": 4, "d_model": 32, "d_k": 4,
            "ref_date": "2018-09-01"}
    json.dump(conf, open(model_dir + "/conf.json", "w"))
    json.dump({"Fold_1": {"mean": [500.0] * 10, "std": [100.0] * 10}},
              open(model_dir + "/NORM_S2_patch.json", "w"))
    model = get_model(conf)
    import jax.numpy as jnp
    x0 = jnp.zeros((1, t, 128, 128, 10))
    d0 = jnp.zeros((1, t))
    variables = model.init(jax.random.PRNGKey(0), x0, d0, train=False)

    from crop2seg_tpu.learning.trainer import create_train_state
    state = create_train_state(model, variables, 1e-3)
    ckpt.save_state(model_dir + "/Fold_1", state, 0, 0.0)

    parcels = np.zeros((1098, 1098), np.int64)
    parcels[:500, :500] = 1
    cache = str(tmp_path / "cache")
    result = generate_prediction(folder, model_dir, 2019, cache,
                                 use_pallas=False, lpis_parcels=parcels,
                                 batch_size=25)
    assert result["classes"].shape == (1098, 1098)
    assert result["proba"].shape == (1098, 1098, 15)
    np.testing.assert_allclose(result["proba"].sum(-1), 1.0, atol=1e-4)
    assert result["homogenized"].shape == (1098, 1098)
    assert (result["homogenized"][600:, 600:] == 0).all()  # outside parcels
    assert os.path.exists(os.path.join(cache, "prediction", "classes.npy"))


def test_cache_manager(tmp_path):
    cm = CacheManager(str(tmp_path / "cache"))
    sizes = cm.sizes()
    assert set(sizes) == set(CacheManager.SUBDIRS)
    p = tmp_path / "cache" / "prediction" / "x.bin"
    p.write_bytes(b"abc" * 100)
    assert cm.sizes()["prediction"] == 300
    cm.clear("prediction")
    assert cm.sizes()["prediction"] == 0


def test_prediction_vector_cache(tmp_path):
    """generate_prediction writes shapefile + geojson caches."""
    # reuse the artifacts from the end-to-end test's structure, tiny version
    import jax
    import jax.numpy as jnp
    from crop2seg_tpu.learning import checkpoint as ckpt
    from crop2seg_tpu.learning.trainer import create_train_state
    from crop2seg_tpu.models.factory import get_model

    folder = str(tmp_path / "cell")
    os.makedirs(folder + "/DATA_S2")
    rng = np.random.default_rng(0)
    t = 3
    records = []
    for i in range(100):
        np.save(f"{folder}/DATA_S2/S2_{i}.npy",
                rng.normal(500, 100, (t, 10, 128, 128)).astype(np.float32))
        records.append({"ID_PATCH": i, "TILE": "T33UVR", "Status": "OK",
                        "time-series_length": t, "crs": 32633, "set": "",
                        "Fold": 1,
                        "dates-S2": {str(j): 20190101 + j for j in range(t)},
                        "affine": [10.0, 0.0, 500000.0, 0.0, -10.0, 5600000.0]})
    json.dump(records, open(f"{folder}/metadata.json", "w"))
    model_dir = str(tmp_path / "model")
    os.makedirs(model_dir + "/Fold_1")
    conf = {"model": "timeunet", "num_classes": 15, "input_dim": 10,
            "encoder_widths": [4, 4, 8], "decoder_widths": [2, 4, 8],
            "out_conv": [4, 15], "n_head": 2, "d_model": 16, "d_k": 2,
            "ref_date": "2018-09-01"}
    json.dump(conf, open(model_dir + "/conf.json", "w"))
    json.dump({"Fold_1": {"mean": [500.0] * 10, "std": [100.0] * 10}},
              open(model_dir + "/NORM_S2_patch.json", "w"))
    model = get_model(conf)
    x0 = jnp.zeros((1, t, 128, 128, 10))
    v = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1, t)), train=False)
    ckpt.save_state(model_dir + "/Fold_1",
                    create_train_state(model, v, 1e-3), 0, 0.0)
    cache = str(tmp_path / "cache")
    result = generate_prediction(folder, model_dir, 2019, cache,
                                 use_pallas=False, batch_size=50)
    pred_dir = os.path.join(cache, "prediction")
    assert os.path.exists(os.path.join(pred_dir, "prediction.shp"))
    assert os.path.exists(os.path.join(pred_dir, "prediction.geojson"))
    assert "polygons" in result


def test_tile_origin_from_index(tmp_path):
    """Authoritative S2 footprints: write a synthetic WGS84 index shapefile
    (Name column like the real Sentinel-2-Shapefile-Index), read it back and
    recover the tile's UTM upper-left corner to <=1 m (the reference rounds
    to whole metres the same way, get_data.py:34)."""
    import numpy as np
    from crop2seg_tpu.gis.geo import utm_to_wgs84
    from crop2seg_tpu.gis.vectorize import read_shapefile, write_shapefile
    from crop2seg_tpu.webapp.pipeline import get_info, tile_origin_from_index

    # true footprint of a fictional tile in zone 33: UL (399960, 5600040)
    ulx, uly, size = 399960.0, 5600040.0, 109800.0
    corners_utm = [(ulx, uly), (ulx + size, uly),
                   (ulx + size, uly - size), (ulx, uly - size), (ulx, uly)]
    ring = [utm_to_wgs84(e, n, 33) for e, n in corners_utm]
    other = [utm_to_wgs84(e + 100000, n, 33) for e, n in corners_utm]
    shp, _, _ = write_shapefile(
        str(tmp_path / "index.shp"),
        [{"rings": [ring], "value": 1, "Name": "33UVR"},
         {"rings": [other], "value": 2, "Name": "33UWR"}],
        extra_fields=[("Name", 16)])

    feats = read_shapefile(shp)
    assert [f["Name"].strip() for f in feats] == ["33UVR", "33UWR"]

    ox, oy = tile_origin_from_index("T33UVR", shp)
    assert abs(ox - ulx) <= 1.0 and abs(oy - uly) <= 1.0

    info = get_info("T33UVR", 0, index_path=shp)
    left, bottom, right, top = info["bounds"]
    assert abs(left - ulx) <= 1.0 and abs(top - uly) <= 1.0
    assert np.isclose(right - left, 10980.0)


def test_cell_from_xy_inverts_bounds():
    from crop2seg_tpu.webapp.pipeline import cell_from_xy, tile_cell_bounds

    origin = (500000.0, 5600000.0)
    for idx in (0, 9, 37, 55, 90, 99):
        left, bottom, right, top = tile_cell_bounds(origin, idx)
        # cell centre and interior corners map back to the same cell
        assert cell_from_xy(origin, (left + right) / 2,
                            (bottom + top) / 2) == idx
        assert cell_from_xy(origin, left, top) == idx
    import pytest

    with pytest.raises(ValueError):
        cell_from_xy(origin, origin[0] - 1.0, origin[1])
    with pytest.raises(ValueError):
        cell_from_xy(origin, origin[0], origin[1] - 10 * 10980.0 - 1)


def test_cell_grid_figure_renders():
    from crop2seg_tpu.webapp.pipeline import cell_grid_figure

    fig = cell_grid_figure("T33UVR", selected=42)
    # 100 cell rectangles + 100 index labels on one axes
    ax = fig.axes[0]
    assert len(ax.patches) == 100
    assert len(ax.texts) == 100
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_stream_tile_inference_partial_cell(tmp_path):
    """The bench's warm cell streams 16 patches through the SAME jitted
    program (batch_size-padded chunks) and stitches a 4x4 patch grid to
    512^2 — the cheap-warmup path of bench.bench_disk_to_map."""
    import jax
    import jax.numpy as jnp

    from crop2seg_tpu.data import S2TSCZCropDataset
    from crop2seg_tpu.models import TimeUNet
    from crop2seg_tpu.webapp.pipeline import stream_tile_inference

    folder = str(tmp_path / "cell16")
    os.makedirs(folder + "/DATA_S2")
    rng = np.random.default_rng(0)
    t = 5
    records = []
    for i in range(16):
        np.save(f"{folder}/DATA_S2/S2_{i}.npy",
                rng.normal(500, 100, (t, 10, 32, 32)).astype(np.float32))
        records.append({"ID_PATCH": i, "TILE": "T33UVR", "Status": "OK",
                        "time-series_length": t, "crs": 32633, "set": "",
                        "Fold": 1,
                        "dates-S2": {str(j): 20190100 + j + 1
                                     for j in range(t)},
                        "affine": [10.0, 0.0, 500000.0, 0.0, -10.0,
                                   5600000.0]})
    json.dump(records, open(f"{folder}/metadata.json", "w"))
    norm = {"mean": np.full(10, 500.0, np.float32),
            "std": np.full(10, 100.0, np.float32)}
    ds = S2TSCZCropDataset(folder, norm=True, norm_values=norm,
                           set_type="train", for_inference=True,
                           reference_date="2018-09-01")
    model = TimeUNet(input_dim=10, encoder_widths=(8, 8, 16),
                     decoder_widths=(4, 8, 16), out_conv=(8, 15), n_head=4,
                     d_model=32, d_k=4)
    item = ds[0]
    x0 = jnp.asarray(item["x"])[None]
    dates = jnp.asarray(item["dates"])[None]
    variables = model.init(jax.random.PRNGKey(0), x0, dates, train=False)
    tl = {}
    proba, classes = stream_tile_inference(model, variables, ds,
                                           batch_size=10, timeline=tl)
    # 16 patches of 32^2 -> 4x4 grid -> 128^2 map (out_hw crop is a no-op)
    assert classes.shape == (128, 128)
    assert proba.shape == (128, 128, 15)
    assert np.isfinite(proba).all()
    np.testing.assert_allclose(proba.sum(-1), 1.0, atol=1e-3)
    if tl.get("total"):  # serial path on the 1-core harness
        stages = tl["decode"] + tl["upload"] + tl["dispatch"] + tl["fetch"]
        assert stages <= tl["total"] + 1e-6
        assert tl["bytes_up"] > 0
