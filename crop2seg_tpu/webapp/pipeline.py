"""Headless whole-tile crop-map pipeline (the webapp's engine).

Re-design of the Streamlit call stack at
/root/reference/crop2seg.py:263-385 + /root/reference/src/webapp/:
- ``get_info``: patch-cell picking on the 10x10 sub-grid of a Sentinel-2
  tile (reference home.py:13-77 + get_data.py:33-69,176-185); the cell is
  1098 px @ 10 m.
- ``get_time_series``: acquisition + patchification via CopernicusClient +
  DatasetCreator(for_inference=True) with the retry-with-relaxed-clouds
  policy (reference get_data.py:188-247).
- ``generate_prediction``: batched TPU inference over the 100 patches with
  device-side stitch (replaces the reference's batch-1 CPU loop,
  prediction.py:253-355), raster export, raster-space polygonize and
  optional LPIS homogenization.
- ``CacheManager``: cache sizing/cleanup (reference cache_management.py:21-116).

Inference defaults mirror the reference's hard-coded webapp config
(prediction.py:185-211): TimeUNet_v1, 15 classes, ref_date = {year-1}-09-01,
pretrained weights + NORM_S2_patch.json from a model directory.
"""
from __future__ import annotations

import json
import logging
import os
import shutil
from typing import Dict, Optional, Tuple

import numpy as np

CELL_PX = 1098         # webapp sub-cell edge in 10 m pixels
CELLS_PER_SIDE = 10    # 10x10 = 100 cells per tile (reference parts=11)
TILE_PX = 10980


def tile_cell_bounds(tile_origin_xy: Tuple[float, float], cell_idx: int,
                     res: float = 10.0) -> Tuple[float, float, float, float]:
    """Cell index (0..99, row-major) -> (left, bottom, right, top) in the
    tile CRS; tile_origin_xy is the tile's upper-left corner."""
    r, c = divmod(cell_idx, CELLS_PER_SIDE)
    left = tile_origin_xy[0] + c * CELL_PX * res
    top = tile_origin_xy[1] - r * CELL_PX * res
    return (left, top - CELL_PX * res, left + CELL_PX * res, top)


def cell_from_xy(tile_origin_xy: Tuple[float, float], x: float, y: float,
                 res: float = 10.0) -> int:
    """World coordinates (tile CRS) -> cell index 0..99 — the click->cell
    spatial join of the reference's leafmap picker (home.py:63-77,
    get_data.py:33-69). Inverse of :func:`tile_cell_bounds`; raises
    ValueError outside the 10x10 grid."""
    c = int((x - tile_origin_xy[0]) // (CELL_PX * res))
    r = int((tile_origin_xy[1] - y) // (CELL_PX * res))
    if not (0 <= r < CELLS_PER_SIDE and 0 <= c < CELLS_PER_SIDE):
        raise ValueError(f"point ({x}, {y}) outside the tile's cell grid")
    return r * CELLS_PER_SIDE + c


def cell_grid_figure(tile_name: str, selected: Optional[int] = None,
                     tile_origin_xy: Optional[Tuple[float, float]] = None,
                     index_path: Optional[str] = None):
    """Matplotlib rendering of a tile's 10x10 sub-cell grid in its UTM frame
    with cell indices labeled and the picked cell highlighted — the
    map-view companion of the app's clickable grid (the reference draws the
    same grid as leafmap polygons, home.py:13-77). Returns the Figure."""
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    if tile_origin_xy is None and index_path is not None:
        tile_origin_xy = tile_origin_from_index(tile_name, index_path)
    if tile_origin_xy is None:
        tile_origin_xy = mgrs_tile_origin(tile_name)
    fig, ax = plt.subplots(figsize=(5.4, 5.4))
    edge = CELL_PX * 10.0
    for idx in range(CELLS_PER_SIDE * CELLS_PER_SIDE):
        left, bottom, _, top = tile_cell_bounds(tile_origin_xy, idx)
        is_sel = idx == selected
        ax.add_patch(Rectangle(
            (left, bottom), edge, edge,
            facecolor="#2a9d8f" if is_sel else "none",
            alpha=0.65 if is_sel else 1.0,
            edgecolor="#264653", linewidth=0.6))
        ax.annotate(str(idx), (left + edge / 2, bottom + edge / 2),
                    ha="center", va="center", fontsize=7,
                    color="white" if is_sel else "#264653")
    ax.set_xlim(tile_origin_xy[0], tile_origin_xy[0] + 10 * edge)
    ax.set_ylim(tile_origin_xy[1] - 10 * edge, tile_origin_xy[1])
    ax.set_aspect("equal")
    ax.set_title(f"{tile_name} — 10x10 cells (1098 px @ 10 m)")
    ax.ticklabel_format(style="plain")
    ax.tick_params(labelsize=7)
    fig.tight_layout()
    return fig


def get_info(tile_name: str, cell_idx: int,
             tile_origin_xy: Optional[Tuple[float, float]] = None,
             index_path: Optional[str] = None) -> Dict:
    """Resolve a picked cell to tile + bounds (reference get_data.py:176-185).

    Origin resolution order: explicit ``tile_origin_xy`` > the authoritative
    Sentinel-2 shapefile index at ``index_path`` (what the reference clones,
    get_data.py:82-110) > the MGRS 100-km grid-square corner approximation
    (documented in :func:`mgrs_tile_origin`)."""
    if tile_origin_xy is None and index_path is not None:
        tile_origin_xy = tile_origin_from_index(tile_name, index_path)
    if tile_origin_xy is None:
        tile_origin_xy = mgrs_tile_origin(tile_name)
    return {"tile": tile_name, "cell": cell_idx,
            "bounds": tile_cell_bounds(tile_origin_xy, cell_idx),
            "crs": 32600 + int(tile_name[1:3])}


def tile_origin_from_index(tile_name: str, index_path: str
                           ) -> Tuple[float, float]:
    """Authoritative tile upper-left corner from the Sentinel-2 shapefile
    index (justinelliotmeyers/Sentinel-2-Shapefile-Index — the same file the
    reference clones and spatial-joins, get_data.py:82-110, home.py:63-77).

    The index stores WGS84 footprint polygons with a ``Name`` column
    ('33UVR'); the corners are reprojected into the tile's UTM zone with the
    pure-math transform and rounded to whole metres, mirroring the
    reference's ``round(geom.bounds)`` (get_data.py:34)."""
    from crop2seg_tpu.gis.geo import wgs84_to_utm
    from crop2seg_tpu.gis.vectorize import read_shapefile

    name = tile_name.lstrip("T")
    zone = int(name[:2])
    for feat in read_shapefile(index_path):
        if str(feat.get("Name", "")).strip() != name:
            continue
        xs, ys = [], []
        for ring in feat.get("rings", []):
            for lon, lat in ring:
                e, n = wgs84_to_utm(lon, lat, zone)
                xs.append(e)
                ys.append(n)
        if not xs:
            break
        return (round(min(xs)), round(max(ys)))
    raise KeyError(f"tile {tile_name} not in index {index_path}")


def mgrs_tile_origin(tile_name: str) -> Tuple[float, float]:
    """Approximate UTM upper-left corner of an S2 tile from its MGRS id.

    Uses the 100-km grid-square layout (column letter -> easting, row letter
    -> northing, AA pattern). Good to the grid-square corner; the official
    S2 footprint extends 4.9 km beyond it on each side (tiles overlap).
    """
    zone = int(tile_name[1:3])
    band, col_letter, row_letter = tile_name[3], tile_name[4], tile_name[5]
    col_sets = ["ABCDEFGH", "JKLMNPQR", "STUVWXYZ"]
    cols = col_sets[(zone - 1) % 3]
    easting = (cols.index(col_letter) + 1) * 100000.0
    rows = "ABCDEFGHJKLMNPQRSTUV"
    row_cycle = rows if zone % 2 == 1 else rows[5:] + rows[:5]
    row_idx = row_cycle.index(row_letter)
    # resolve the 2,000,000 m row ambiguity with the latitude band's centre
    band_lat = -80 + 8 * ("CDEFGHJKLMNPQRSTUVWX".index(band)) + 4
    approx_northing = band_lat * 111000.0
    northing = row_idx * 100000.0
    while northing + 1000000 < approx_northing:
        northing += 2000000.0
    return (easting, northing + 100000.0)  # upper-left of the 100k square


def get_time_series(tile_name: str, bounds, cache_dir: str, client=None,
                    loader=None, relax_steps=(0, 10, 20)) -> str:
    """Build the 100-patch inference time series for a cell
    (reference get_ts, get_data.py:188-247): DatasetCreator(for_inference)
    with download, retrying with cloud caps relaxed by ``relax_steps``."""
    from crop2seg_tpu.gis.dataset_creator import DatasetCreator

    out = os.path.join(cache_dir, "s2_patches", tile_name)
    if os.path.exists(os.path.join(out, "metadata.json")):
        logging.info("time series already generated, skipping")
        return out
    last_err = None
    # relax_steps are ABSOLUTE increments over the client's base cloud caps
    # (reference get_data.py:230-246 swaps in fresh absolute arrays per
    # retry): each attempt derives from the saved base — not the previous
    # attempt's caps — and the base is restored afterwards so a shared
    # client doesn't start the next tile pre-relaxed.
    base_cfg = client.cfg if client is not None else None
    try:
        for relax in relax_steps:
            try:
                if client is not None:
                    client.cfg = (base_cfg.with_clouds(relax) if relax
                                  else base_cfg)
                dc = DatasetCreator(out, loader=loader, for_inference=True,
                                    download=client is not None,
                                    client=client)
                dc.run_tile(tile_name, bounds=bounds)
                return out
            except Exception as err:  # retry w/ relaxed clouds (ref :230-246)
                logging.warning("acquisition failed (%s); relaxing clouds",
                                err)
                last_err = err
    finally:
        if client is not None:
            client.cfg = base_cfg
    raise RuntimeError(f"time-series acquisition failed: {last_err}")


_STREAM_FWD_CACHE: dict = {}


def _stream_fwd_cached(model, use_native: bool, mesh_key, mesh):
    """Jitted stream forward, cached across stream_tile_inference calls.

    flax modules are frozen dataclasses (hashable), so (model, layout,
    mesh identity) keys one compiled executable per configuration; dates
    and pad mask are traced arguments, not closed-over constants."""
    key = (model, use_native, mesh_key)
    fn = _STREAM_FWD_CACHE.get(key)
    if fn is not None:
        return fn
    import jax
    import jax.numpy as jnp

    def fwd_impl(v, xb, dates_j, mask_j):
        if use_native:  # planar (B, T, C, H, W) -> channels-last, free in XLA
            xb = jnp.transpose(xb, (0, 1, 3, 4, 2))
        probs = jax.nn.softmax(
            model.apply(v, xb, dates_j, pad_mask=mask_j,
                        train=False).astype(jnp.float32), axis=-1)
        # bf16 probs: the relay downlink is ~40 MB/s, halving the fetched
        # bytes halves the per-chunk download time; fp32 restored on host
        return (probs.astype(jnp.bfloat16),
                jnp.argmax(probs, -1).astype(jnp.uint8))

    if mesh is not None:
        from crop2seg_tpu.parallel.mesh import patch_parallel_infer
        fn = patch_parallel_infer(fwd_impl, mesh, extra_replicated=2)
    else:
        fn = jax.jit(fwd_impl)
    _STREAM_FWD_CACHE[key] = fn
    return fn


def stream_tile_inference(model, variables, ds, batch_size: int = 10,
                          mesh=None, timeline: Optional[dict] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Overlapped disk->crop-map inference over the 100 patches of a cell.

    With ``mesh`` (a jax.sharding.Mesh), each forward chunk's patch axis
    shards across the mesh devices (parallel.patch_parallel_infer — SURVEY
    §5's multi-chip whole-tile mapping); ``batch_size`` must then divide by
    the mesh size.

    Replaces the reference's decode-then-infer sequence (its batch-1 loop is
    at /root/reference/src/webapp/prediction.py:310-323) with a two-stage
    pipeline on this host's single core:

    - a producer thread decodes chunk k+1 with the native C++ loader
      (planar (T, C, H, W) bfloat16 — no host transpose, half the write and
      transfer bytes; ctypes releases the GIL) while
    - the main thread has chunk k's forward dispatched on the chip and
      blocks fetching chunk k-1's output (the axon relay executes lazily, so
      the per-chunk fetch is what forces execution; the GIL is released
      during the wait, letting the decoder run truly in parallel).

    Returns host (1098, 1098, K) float32 probabilities and (1098, 1098)
    uint8 classes, stitched on host (ops.patchify.np_stitch_inference_tile).

    ``timeline``: pass a dict to receive the per-stage wall-clock budget of
    the run (seconds summing to the loop total): 'decode' (host npy ->
    normalized planar bf16), 'upload' (jnp.asarray dispatch), 'dispatch'
    (forward dispatch), 'fetch' (np.asarray — on the lazily-executing relay
    this is where queued uploads+compute actually run), plus 'bytes_up' and
    'total'. Measured on the serial single-core path; with worker threads
    the stages overlap and only 'total' is meaningful.
    """
    import queue as _queue
    from collections import deque
    from threading import Thread

    import jax
    import jax.numpy as jnp

    from crop2seg_tpu.nn.temporal import pad_mask_from_lengths
    from crop2seg_tpu.ops.patchify import np_stitch_inference_tile

    n = len(ds)
    meta0 = ds.light_item(0)
    t, dates = meta0["length"], meta0["dates"]

    plan = ds.native_batch_plan()
    use_native = False
    if plan is not None:
        try:
            from crop2seg_tpu import native as nat
            use_native = nat.available()
        except Exception:
            use_native = False

    # decode buffers are recycled through a free-list: faulting in a fresh
    # multi-hundred-MB np.empty per chunk costs more than the decode itself
    # on this host (measured 149 vs 16 patches/s). The consumer returns a
    # buffer only AFTER jnp.asarray copied it, so reuse cannot race the
    # transfer.
    free_q: "_queue.Queue" = _queue.Queue()

    def chunks():
        if use_native:
            import ml_dtypes
            paths = [ds.light_item(i)["path"] for i in range(n)]
            h, w = nat.npy_shape(paths[0])[2:4]
            for _ in range(2):
                free_q.put(np.empty((batch_size, t, len(plan["reorder"]),
                                     h, w), ml_dtypes.bfloat16))
            for s0 in range(0, n, batch_size):
                chunk = paths[s0:s0 + batch_size]
                buf = free_q.get()
                x, _, _ = nat.load_batch(
                    chunk, t, h, w, reorder=plan["reorder"],
                    mean=plan["mean"], std=plan["std"],
                    layout="nchw", out_dtype="bf16",
                    out=buf[:len(chunk)])
                yield (buf, x, len(chunk))
        else:
            for s0 in range(0, n, batch_size):
                samples = [ds[i] for i in range(s0, min(n, s0 + batch_size))]
                yield (None, np.stack([s["x"] for s in samples]),
                       len(samples))

    def produce(q):
        try:
            for item in chunks():
                q.put(item)
            q.put(None)
        except Exception as err:  # surface in the consumer thread
            q.put(err)

    dates_j = jnp.tile(jnp.asarray(dates)[None, :], (batch_size, 1))
    mask_j = jnp.tile(pad_mask_from_lengths(jnp.asarray([t]), t),
                      (batch_size, 1))

    # dates/mask are traced ARGUMENTS and the jitted callable is cached by
    # (model, layout[, mesh]): a fresh closure per call would recompile the
    # whole forward on EVERY invocation (~40-60 s on the remote compile
    # helper — measured 0.3 vs 2.2 patches/s on back-to-back runs).
    base = _stream_fwd_cached(model, use_native,
                              None if mesh is None else id(mesh), mesh)
    fwd = lambda v, xb: base(v, xb, dates_j, mask_j)

    def pad_chunk(buf, xb_np, nb):
        if nb < batch_size and buf is None:
            return np.concatenate(
                [xb_np, np.zeros((batch_size - nb,) + xb_np.shape[1:],
                                 xb_np.dtype)])
        if nb < batch_size:
            buf[nb:] = 0          # pad rows of the recycled buffer
            return buf
        return xb_np

    results: list = []
    import os

    if (os.cpu_count() or 1) <= 1:
        # Single-core host (the axon harness): producer/fetcher threads
        # thrash the GIL against the relay's CPU-bound upload serialization
        # (measured 0.4-0.85 p/s threaded vs ~1.7 p/s serial; the whole
        # path is uplink-bound at ~2.4 p/s there anyway). Run a 1-deep
        # software pipeline: chunk k-1 is fetched only after chunk k's
        # forward is dispatched, so device compute still overlaps the
        # next host decode.
        import time as _time

        tl = {"decode": 0.0, "upload": 0.0, "dispatch": 0.0, "fetch": 0.0,
              "bytes_up": 0, "total": 0.0}
        t_run = _time.perf_counter()
        prev = None
        gen = chunks()
        while True:
            t0 = _time.perf_counter()
            item = next(gen, None)
            tl["decode"] += _time.perf_counter() - t0
            if item is None:
                break
            buf, xb_np, nb = item
            t0 = _time.perf_counter()
            xb_dev = jnp.asarray(pad_chunk(buf, xb_np, nb))
            tl["upload"] += _time.perf_counter() - t0
            tl["bytes_up"] += xb_dev.size * xb_dev.dtype.itemsize
            if buf is not None:
                free_q.put(buf)   # asarray copied; safe to recycle
            t0 = _time.perf_counter()
            out = (fwd(variables, xb_dev), nb)
            tl["dispatch"] += _time.perf_counter() - t0
            if prev is not None:
                (pb, cb), n0 = prev
                t0 = _time.perf_counter()
                results.append((np.asarray(pb)[:n0], np.asarray(cb)[:n0]))
                tl["fetch"] += _time.perf_counter() - t0
            prev = out
        if prev is not None:
            (pb, cb), n0 = prev
            t0 = _time.perf_counter()
            results.append((np.asarray(pb)[:n0], np.asarray(cb)[:n0]))
            tl["fetch"] += _time.perf_counter() - t0
        tl["total"] = _time.perf_counter() - t_run
        if timeline is not None:
            timeline.update(tl)
    else:
        import time as _time

        t_run = _time.perf_counter()
        q = _queue.Queue(maxsize=2)
        Thread(target=produce, args=(q,), daemon=True).start()

        # fetch on a separate thread so the downlink overlaps the uplink
        # (both release the GIL while waiting on the relay)
        pending: "_queue.Queue" = _queue.Queue()
        fetch_err: list = []

        def fetch_worker():
            try:
                while True:
                    item = pending.get()
                    if item is None:
                        return
                    (pb, cb), n0 = item
                    results.append((np.asarray(pb)[:n0], np.asarray(cb)[:n0]))
            except Exception as err:
                fetch_err.append(err)

        fetcher = Thread(target=fetch_worker, daemon=True)
        fetcher.start()

        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, Exception):
                pending.put(None)
                raise item
            buf, xb_np, nb = item
            xb_dev = jnp.asarray(pad_chunk(buf, xb_np, nb))
            if buf is not None:
                free_q.put(buf)   # asarray copied; safe to recycle
            pending.put((fwd(variables, xb_dev), nb))
        pending.put(None)
        fetcher.join()
        if fetch_err:
            raise fetch_err[0]
        if timeline is not None:
            # stages overlap across worker threads here, so only the wall
            # total is meaningful — but it IS recorded (the docstring's
            # per-stage budget contract promises at least 'total')
            timeline["total"] = _time.perf_counter() - t_run

    proba = np_stitch_inference_tile(
        np.concatenate([p for p, _ in results]).astype(np.float32))
    proba /= proba.sum(-1, keepdims=True)  # undo bf16-downlink drift (sum=1)
    classes = np_stitch_inference_tile(
        np.concatenate([c for _, c in results]))
    return np.ascontiguousarray(proba), np.ascontiguousarray(classes)


def generate_prediction(data_folder: str, model_dir: str, year: int,
                        cache_dir: str, use_pallas: bool = True,
                        lpis_parcels: Optional[np.ndarray] = None,
                        batch_size: int = 10,
                        mesh=None) -> Dict[str, np.ndarray]:
    """Whole-cell crop map (reference prediction.py:253-355, TPU-native).

    data_folder: DatasetCreator(for_inference) output (100 patches).
    model_dir: directory with conf.json + Fold_1/model.ckpt (or the
    reference's model.pth.tar) + NORM_S2_patch.json.
    Returns {'proba', 'classes', 'segments', 'soft'} plus writes the raster
    + homogenized map into the cache.

    mesh: 'auto' builds a patch-sharding mesh over every visible device when
    more than one exists (SURVEY §5 whole-tile scaling); a
    jax.sharding.Mesh uses that mesh; None stays single-device.
    """
    import jax.numpy as jnp

    from crop2seg_tpu.data import S2TSCZCropDataset, load_norm_values
    from crop2seg_tpu.gis.postprocess import (
        homogenize_raster, polygonize, soften_by_segments)
    from crop2seg_tpu.gis.raster import Affine, save_prediction_raster
    from crop2seg_tpu.learning import checkpoint as ckpt
    from crop2seg_tpu.models.factory import get_model

    pred_dir = os.path.join(cache_dir, "prediction")
    os.makedirs(pred_dir, exist_ok=True)
    done_marker = os.path.join(pred_dir, "classes.npy")
    # webapp config contract (reference prediction.py:185-211)
    conf = {"model": "timeunet", "num_classes": 15, "input_dim": 10,
            "ref_date": f"{year - 1}-09-01"}
    conf_path = os.path.join(model_dir, "conf.json")
    if os.path.exists(conf_path):
        stored = json.load(open(conf_path))
        stored.pop("dtype", None)
        # the architecture comes from the training conf, but the reference
        # date is per PREDICTION year (reference prediction.py:193-203): a
        # model trained on 2019 data with ref_date 2018-09-01 must see 2022
        # acquisitions as offsets from 2021-09-01 so day offsets land in
        # the trained 0-400 range — the stored ref_date must not win here.
        stored.pop("ref_date", None)
        conf.update(stored)
    conf["use_pallas"] = use_pallas
    model = get_model({**conf, "out_conv": conf.get("out_conv", [32, 15])})

    norm = load_norm_values(os.path.join(model_dir, "NORM_S2_patch.json"))
    ds = S2TSCZCropDataset(data_folder, norm=True, norm_values=norm,
                           set_type="train", for_inference=True,
                           reference_date=conf["ref_date"])

    fold_dir = os.path.join(model_dir, "Fold_1")
    if os.path.exists(os.path.join(fold_dir, "model.ckpt")):
        payload = ckpt.load_state(fold_dir)
        variables = {"params": payload["params"],
                     "batch_stats": payload.get("batch_stats", {})}
    else:
        variables = ckpt.load_torch_checkpoint(
            os.path.join(fold_dir, "model.pth.tar"), conf["model"],
            n_stages=len(conf.get("encoder_widths", (64, 64, 64, 128))))

    if mesh == "auto":
        import jax

        from crop2seg_tpu.parallel import make_mesh
        devs = jax.devices()
        mesh = make_mesh(devs) if len(devs) > 1 else None
    if mesh is not None and batch_size % mesh.shape["data"]:
        # round the chunk up so each device gets equal patch rows
        n = mesh.shape["data"]
        batch_size += n - batch_size % n
    proba, classes = stream_tile_inference(model, variables, ds, batch_size,
                                           mesh=mesh)
    out = {"proba": proba, "classes": classes}

    np.save(done_marker, out["classes"])
    affine = None
    meta = json.load(open(os.path.join(data_folder, "metadata.json")))
    if meta and "affine" in meta[0]:
        affine = Affine(*meta[0]["affine"])
    save_prediction_raster(os.path.join(pred_dir, "prediction.tif"),
                           out["classes"], out["proba"], affine)
    segments, seg_class = polygonize(out["classes"])
    soft = soften_by_segments(out["proba"], segments)
    # vector cache, like the reference's shapefile outputs (crop2seg.py:344-353)
    from crop2seg_tpu.gis.vectorize import (
        polygons_to_geojson, segments_to_polygons, write_shapefile)
    feats = segments_to_polygons(segments, seg_class, affine)
    write_shapefile(os.path.join(pred_dir, "prediction.shp"), feats)
    polygons_to_geojson(feats, os.path.join(pred_dir, "prediction.geojson"),
                        crs=meta[0].get("crs") if meta else None)
    result = {"proba": out["proba"], "classes": out["classes"],
              "segments": segments, "soft": soft["raster"],
              "polygons": feats}
    if lpis_parcels is not None:
        result["lpis"] = lpis_parcels
        result["homogenized"] = homogenize_raster(out["classes"], lpis_parcels)
        np.save(os.path.join(pred_dir, "homogenized.npy"),
                result["homogenized"])
    return result


class CacheManager:
    """Cache sizing + cleanup (reference cache_management.py:21-116)."""

    SUBDIRS = ("lpis", "prediction", "s2_patches", "s2_tiles", "rasters")

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        for sub in self.SUBDIRS:
            os.makedirs(os.path.join(cache_dir, sub), exist_ok=True)

    def sizes(self) -> Dict[str, int]:
        out = {}
        for sub in self.SUBDIRS:
            total = 0
            for root, _, files in os.walk(os.path.join(self.cache_dir, sub)):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files)
            out[sub] = total
        return out

    def clear(self, *subdirs: str) -> None:
        for sub in subdirs or self.SUBDIRS:
            path = os.path.join(self.cache_dir, sub)
            shutil.rmtree(path, ignore_errors=True)
            os.makedirs(path, exist_ok=True)
