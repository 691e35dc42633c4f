"""S2TSCzCrop dataset reader (host side, numpy).

Behavior-compatible re-implementation of
/root/reference/src/datasets/s2_ts_cz_crop.py:139-508:

- reads ``DATA_S2/S2_<id>`` (T, 10, 128, 128) float arrays and
  ``ANNOTATIONS/TARGET_<id>`` (H, W) labels, metadata from ``metadata.json``
  filtered by ``Status == 'OK'`` and ``set == set_type`` (reference :284)
- channel reorder to the PASTIS band order [2,1,0,4,5,6,3,7,8,9]
  (reference :248)
- optional NDVI channel (B08-B04)/(B08+B04) appended AFTER standardization,
  clipped to [-1, 1] and 0 where undefined (reference :376-402)
- per-channel standardization with precomputed mean/std (reference :393-398)
- dates as days relative to ``reference_date`` and/or day-of-year
  (reference :331-355)
- train-time geometric augmentation + temporal dropout (reference :476-487)

TPU-native departures: samples come back channels-LAST with their true length
T; fixed-T bucketing + pad masks live in crop2seg_tpu.data.batcher (no
per-batch max-T, no data-dependent shapes downstream).
"""
from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Dict, Optional, Sequence

import numpy as np

# PASTIS band order applied to the .SAFE order 10-band stack (reference :248).
PASTIS_CHANNEL_ORDER = (2, 1, 0, 4, 5, 6, 3, 7, 8, 9)

# 15-class nomenclature (reference :34-48).
LABELS = (
    "Background", "Permanent grassland", "Annual fruit and vegetable",
    "Summer cereals", "Winter cereals", "Rapeseed", "Maize", "Annual forage crops",
    "Sugar beet", "Flax and Hemp", "Permanent fruit", "Hops", "Vineyards",
    "Other crops", "Not classified",
)

# Reference minority-class sample weights (s2_ts_cz_crop.py:712).
SAMPLE_WEIGHT_CLASSES = (0, 1, 1, 0, 0, 0, 0, 5, 0, 14, 8, 4, 4, 0, 0)


def _load_array(folder: str, sub: str, name: str) -> np.ndarray:
    """np.load tolerant of the reference's extensionless filenames."""
    path = os.path.join(folder, sub, name)
    if not os.path.exists(path) and os.path.exists(path + ".npy"):
        path = path + ".npy"
    return np.load(path)


def load_norm_values(path: str, folds=None,
                     reorder: bool = True) -> Dict[str, np.ndarray]:
    """Parse NORM_S2_patch.json into the CHANNEL ORDER THE DATASET SERVES
    (reference train.py:282-296 / webapp/prediction.py:232-251):

    - ``{'train': {...}}`` — the S2TSCzCrop release format; stats are in
      .SAFE band order and are REORDERED by ``PASTIS_CHANNEL_ORDER`` here,
      because the dataset standardizes AFTER reordering the data to PASTIS
      order (the reference applies the same [2,1,0,4,5,6,3,7,8,9] fix when
      loading this format).
    - ``{'Fold_k': {...}}`` — the PASTIS format; already PASTIS-ordered
      (identity in the reference), averaged over ``folds``.
    - flat ``{'mean', 'std'}`` — already in served order (what
      scripts/convert_checkpoint.py writes); returned as-is.

    ``folds``: restrict the average to these fold numbers — the PASTIS 5-fold
    protocol normalizes with the statistics of the *training* folds only
    (reference train.py:283-286). ``reorder=False`` keeps 'train'-keyed
    stats in .SAFE order for a dataset built with
    ``channels_like_pastis=False``."""
    with open(path) as f:
        blob = json.load(f)
    if "mean" in blob:
        return {"mean": np.asarray(blob["mean"], np.float32),
                "std": np.asarray(blob["std"], np.float32)}
    keys = [f"Fold_{f}" for f in folds] if folds is not None else list(blob)
    means = [np.asarray(blob[k]["mean"], np.float32) for k in keys]
    stds = [np.asarray(blob[k]["std"], np.float32) for k in keys]
    mean, std = np.stack(means).mean(0), np.stack(stds).mean(0)
    if reorder and any(k.startswith("train") for k in keys):
        order = list(PASTIS_CHANNEL_ORDER)
        mean, std = mean[order], std[order]
    return {"mean": mean, "std": std}


class S2TSCZCropDataset:
    """Yields dict samples with true (un-padded) length T.

    Keys: x (T, H, W, C) float32, dates (T,) or (T, 2), y (H, W) int32
    (absent when for_inference), length (int), id (int),
    affine (6,) when get_affine.
    """

    def __init__(self, folder: str, norm: bool = True,
                 norm_values: Optional[Dict] = None, folds=None,
                 set_type: str = "train", reference_date: str = "2018-09-01",
                 class_mapping=None, mono_date=None,
                 channels_like_pastis: bool = True, use_doy: bool = False,
                 use_abs_rel_enc: bool = False, transform=None,
                 add_ndvi: bool = False, temporal_dropout: float = 0.0,
                 get_affine: bool = False, for_inference: bool = False,
                 cache: bool = False, seed: int = 0):
        import pandas as pd

        self.folder = folder
        self.set_type = set_type
        self.reference_date = datetime(*map(int, reference_date.split("-")))
        self.use_abs_rel_enc = use_abs_rel_enc
        self.use_doy = False if use_abs_rel_enc else use_doy
        self.transform = transform
        self.add_ndvi = add_ndvi
        self.temporal_dropout = temporal_dropout
        self.get_affine = get_affine
        self.for_inference = for_inference
        self.channels_order = list(PASTIS_CHANNEL_ORDER) if channels_like_pastis \
            else list(range(10))
        self.class_mapping = class_mapping
        self.mono_date = mono_date
        self.cache = cache
        self._memory: Dict[int, tuple] = {}
        self._rng = np.random.default_rng(seed)

        meta = pd.read_json(os.path.join(folder, "metadata.json"),
                            orient="records")
        if not for_inference:
            meta = meta[(meta["Status"] == "OK") & (meta["set"] == set_type)]
        meta.index = meta["ID_PATCH"].astype(int)
        meta = meta.sort_index()
        self.meta_patch = meta
        self.id_patches = list(meta.index)

        if norm:
            if not isinstance(norm_values, dict):
                raise ValueError("norm=True requires norm_values dict")
            self.norm = (np.asarray(norm_values["mean"], np.float32),
                         np.asarray(norm_values["std"], np.float32))
        else:
            self.norm = None

    def __len__(self):
        return len(self.id_patches)

    def _dates_relative(self, id_patch: int) -> np.ndarray:
        d = self.meta_patch.loc[id_patch, "dates-S2"]
        out = []
        for key in sorted(d, key=lambda s: int(s)):
            s = str(d[key])
            dt = datetime(int(s[:4]), int(s[4:6]), int(s[6:]))
            out.append((dt - self.reference_date).days)
        return np.asarray(out, np.float32)

    def _dates_absolute(self, id_patch: int) -> np.ndarray:
        d = self.meta_patch.loc[id_patch, "dates-S2"]
        out = []
        for key in sorted(d, key=lambda s: int(s)):
            s = str(d[key])
            dt = datetime(int(s[:4]), int(s[4:6]), int(s[6:]))
            out.append(dt.timetuple().tm_yday)
        return np.asarray(out, np.float32)

    def _load_raw(self, id_patch: int):
        data = _load_array(self.folder, "DATA_S2", f"S2_{id_patch}"
                           ).astype(np.float32)
        data = data[:, self.channels_order]
        if self.add_ndvi:
            # B08/B04 positions follow the SERVED order (reference
            # s2_ts_cz_crop.py:384-390 branches the same way): PASTIS order
            # has B08 at 6 / B04 at 2; .SAFE order has them at 3 / 0.
            i_nir, i_red = (6, 2) if self.channels_order[0] == 2 else (3, 0)
            nir, red = data[:, i_nir], data[:, i_red]
            denom = nir + red
            ndvi = np.where(denom == 0, 0.0, (nir - red) / np.where(denom == 0, 1, denom))
            ndvi = np.where((ndvi < -1) | (ndvi > 1), 0.0, ndvi).astype(np.float32)
        if self.norm is not None:
            mean, std = self.norm
            data = (data - mean[None, :, None, None]) / std[None, :, None, None]
        if self.add_ndvi:
            data = np.concatenate([data, ndvi[:, None]], axis=1)
        target = None
        if not self.for_inference:
            target = _load_array(self.folder, "ANNOTATIONS",
                                 f"TARGET_{id_patch}").astype(np.int32)
            if self.class_mapping is not None:
                target = np.vectorize(lambda v: self.class_mapping[v])(target)
        return data, target

    # --- native C++ fast path (crop2seg_tpu/native) ----------------------

    def native_batch_plan(self):
        """Channel-reorder + normalization spec for the native batch
        assembler, or None when per-item Python work (NDVI, mono-date,
        RAM cache, non-geometric augmentation) makes it inapplicable.

        Geometric augmentation (flip+rotate) and temporal dropout DO run
        natively: the RNG draws stay in Python (aug_item) and the C++ loader
        applies the per-sample pixel/frame gather maps during decode
        (loader.cpp c2s_load_batch_aug)."""
        if self.add_ndvi or self.mono_date is not None or self.cache:
            return None
        augment = (self.set_type == "train"
                   and (self.transform is not None
                        or self.temporal_dropout > 0.0))
        if augment and self.transform is not None and (
                not hasattr(self.transform, "index_map")
                or getattr(self.transform, "add_noise", True)
                or getattr(self.transform, "crop", True)):
            return None  # noise/crop (or a custom transform) need Python
        mean, std = self.norm if self.norm is not None else (None, None)
        return {"reorder": list(self.channels_order), "mean": mean,
                "std": std, "augment": augment}

    def aug_item(self, item: int) -> Dict[str, np.ndarray]:
        """light_item plus the native assembler's per-sample augmentation
        plans, consuming ``self._rng`` in exactly the order ``__getitem__``
        does (transform geometry first, then temporal dropout), so the
        native and Python paths produce identical batches for an identical
        generator state: 'frame_idx' (t',) int32 kept source frames (the
        batcher pads them into a bucket-length frame_map) and 'gather'
        (H*W,) int32 pixel permutation or None; 'y'/'dates'/'length' arrive
        already transformed."""
        s = self.light_item(item)
        t = s["length"]
        s["gather"] = None
        if (not self.for_inference and self.transform is not None
                and self.set_type == "train"):
            deg, flip = self.transform.sample_geometry(self._rng)
            y = s["y"]
            gather = self.transform.index_map(*y.shape[-2:], deg, flip)
            s["y"] = self.transform.apply_map(y, gather)
            s["gather"] = gather
        frame_idx = np.arange(t)
        if (not self.for_inference and self.set_type == "train"
                and self.temporal_dropout > 0.0):
            keep = self._rng.random(t) > self.temporal_dropout
            keep[0] = keep[0] or not keep.any()  # never drop everything
            frame_idx = np.nonzero(keep)[0]
        s["frame_idx"] = frame_idx.astype(np.int32)
        s["dates"] = s["dates"][frame_idx]
        s["length"] = int(len(frame_idx))
        return s

    def data_path(self, id_patch: int) -> str:
        p = os.path.join(self.folder, "DATA_S2", f"S2_{id_patch}")
        return p if os.path.exists(p) else p + ".npy"

    def light_item(self, item: int) -> Dict[str, np.ndarray]:
        """Everything __getitem__ yields EXCEPT x (which the native loader
        assembles): dates, y, id, affine, path."""
        id_patch = self.id_patches[item]
        dates = self._dates_absolute(id_patch) if self.use_doy else \
            self._dates_relative(id_patch)
        if self.use_abs_rel_enc:
            dates2 = self._dates_absolute(id_patch) if not self.use_doy else \
                self._dates_relative(id_patch)
            d = np.stack([dates, dates2], axis=-1)
        else:
            d = dates
        sample = {"dates": d.astype(np.float32), "id": id_patch,
                  "length": int(dates.shape[0]),
                  "path": self.data_path(id_patch)}
        if not self.for_inference:
            target = _load_array(self.folder, "ANNOTATIONS",
                                 f"TARGET_{id_patch}").astype(np.int32)
            if self.class_mapping is not None:
                target = np.vectorize(
                    lambda v: self.class_mapping[v])(target)
            sample["y"] = target
        if self.get_affine:
            sample["affine"] = np.asarray(
                self.meta_patch.loc[id_patch, "affine"], np.float32)
        return sample

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        id_patch = self.id_patches[item]
        if self.cache and item in self._memory:
            data, target = self._memory[item]
        else:
            data, target = self._load_raw(id_patch)
            if self.cache:
                self._memory[item] = (data, target)

        dates = self._dates_absolute(id_patch) if self.use_doy else \
            self._dates_relative(id_patch)
        dates2 = None
        if self.use_abs_rel_enc:
            dates2 = self._dates_absolute(id_patch) if not self.use_doy else \
                self._dates_relative(id_patch)

        if self.mono_date is not None:
            if isinstance(self.mono_date, int):
                idx = self.mono_date
            else:
                mono_dt = datetime(*map(int, self.mono_date.split("-")))
                delta = (mono_dt - self.reference_date).days
                idx = int(np.argmin(np.abs(dates - delta)))
            data = data[idx:idx + 1]
            dates = dates[idx:idx + 1]
            if dates2 is not None:
                dates2 = dates2[idx:idx + 1]

        assert data.shape[0] == dates.shape[0]

        if not self.for_inference and self.transform is not None and \
                self.set_type == "train":
            data, target = self.transform(data, target, self._rng)

        if (not self.for_inference and self.set_type == "train"
                and self.temporal_dropout > 0.0):
            keep = self._rng.random(data.shape[0]) > self.temporal_dropout
            keep[0] = keep[0] or not keep.any()  # never drop everything
            data, dates = data[keep], dates[keep]
            if dates2 is not None:
                dates2 = dates2[keep]

        x = np.transpose(data, (0, 2, 3, 1))  # channels-last
        d = dates if dates2 is None else np.stack([dates, dates2], axis=-1)
        sample = {"x": x, "dates": d.astype(np.float32),
                  "length": x.shape[0], "id": id_patch}
        if target is not None:
            sample["y"] = target
        if self.get_affine:
            sample["affine"] = np.asarray(
                self.meta_patch.loc[id_patch, "affine"], np.float32)
        return sample
