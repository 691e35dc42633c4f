"""Offline dataset curation: cover stats, balanced split, weights, norms.

Re-design of /root/reference/src/datasets/s2_ts_cz_crop.py:511-753:
- ``calc_cover_statistics``: per-class pixel covers over OK patches (:511-545)
- ``create_train_test_split``: connected-component, class-balanced 70/15/15
  split over the 82x82 patch grid per tile (:548-684) — minority-class
  patches seed the components, a 10-px corridor grid separates them, border
  components go to train, remaining components greedily fill the set ratios
- ``compute_sample_weights``: minority-class presence weights for weighted
  resampling (:687-722)
- ``compute_norm_vals``: train-set channel mean/std in .SAFE channel order
  (:725-753)
"""
from __future__ import annotations

import json
import logging
import os
from typing import Sequence

import numpy as np
from scipy import ndimage

# Cover-column order = class code order 1..14 (reference labels_super_short,
# s2_ts_cz_crop.py:40-48).
COVER_COLUMNS = (
    "Grassland_Cover", "Fruit_vegetable_Cover", "Summer_cereals_Cover",
    "Winter_cereals_Cover", "Rapeseed_Cover", "Maize_Cover",
    "Annual_forage_Cover", "Sugar_beat_Cover", "Flax_Hemp_Cover",
    "Permanent_fruit_Cover", "Hopyards_Cover", "Vineyards_Cover",
    "Other_crops_Cover", "Not_classified_Cover",
)
MINORITY_COLUMNS = ("Flax_Hemp_Cover", "Hopyards_Cover", "Sugar_beat_Cover",
                    "Permanent_fruit_Cover", "Vineyards_Cover")
# per-cover-column presence weights (reference :712)
SAMPLE_WEIGHTS = np.array([0, 1, 1, 0, 0, 0, 0, 5, 0, 14, 8, 4, 4, 0, 0])


def calc_cover_statistics(folder: str, grid: int = 82):
    """Write metadata_and_stats.json with per-class pixel counts."""
    import pandas as pd

    from crop2seg_tpu.data.s2tsczcrop import _load_array

    m = pd.read_json(os.path.join(folder, "metadata.json"))
    m.index = m["ID_PATCH"].astype(int)
    m = m.sort_index()
    stats = {k: [] for k in COVER_COLUMNS}
    for _, v in m.iterrows():
        if v.get("Status") == "REMOVED":
            for k in stats:
                stats[k].append(np.nan)
            continue
        t = _load_array(folder, "ANNOTATIONS", f"TARGET_{int(v['ID_PATCH'])}")
        for i, k in enumerate(COVER_COLUMNS):
            stats[k].append(int(np.count_nonzero(t == i + 1)))
    for k, vals in stats.items():
        m[k] = vals
    m.to_json(os.path.join(folder, "metadata_and_stats.json"), indent=4,
              orient="records")
    return m


def split_tile_grid(minority_mask: np.ndarray, flax_mask: np.ndarray,
                    rng: np.random.Generator,
                    ratios=(0.7, 0.15, 0.15)) -> np.ndarray:
    """Core split algorithm on one tile's patch grid (reference :594-654).

    minority/flax masks: (G, G) booleans marking patches that seed split
    components. Returns (G, G) int grid with 1=train, 2=val, 3=test, 0=unused.
    """
    g = minority_mask.shape[0]
    grid = minority_mask.astype(int).copy()
    grid[0:-1:10] = 0           # corridor rows/cols every 10 patches
    grid[:, 0:-1:10] = 0
    grid[flax_mask] = 1          # flax patches always kept (reference :604)

    labeled, _ = ndimage.label(grid, np.ones((3, 3)))
    border = np.unique(np.concatenate(
        [labeled[:, [0, g - 1]].ravel(), labeled[[0, g - 1]].ravel()]))
    border = [int(i) for i in border if i != 0]
    others = [int(i) for i in np.unique(labeled) if i != 0 and i not in border]
    others = list(rng.permutation(others))

    sizes = {int(i): int((labeled == i).sum()) for i in border + others}
    total = max(sum(sizes.values()), 1)
    sums = [sum(sizes[i] for i in border) / total, 0.0, 0.0]
    assign = {i: 0 for i in border}  # 0=train,1=val,2=test
    for comp in sorted(others, key=lambda i: sizes[i]):
        w = np.array([max(1 - s / r, 0.0) for s, r in zip(sums, ratios)])
        w = w / w.sum() if w.sum() > 0 else np.ones(3) / 3
        choice = int(rng.choice(3, p=w))
        assign[comp] = choice
        sums[choice] += sizes[comp] / total

    out = np.zeros((g, g), int)
    for comp, choice in assign.items():
        out[labeled == comp] = choice + 1
    return out


def create_train_test_split(folder: str, tiles: Sequence[str] | None = None,
                            grid: int = 82, seed: int = 42):
    """Assign 'set' in metadata.json per the reference protocol (:548-684)."""
    import pandas as pd

    stats_path = os.path.join(folder, "metadata_and_stats.json")
    if not os.path.isfile(stats_path):
        logging.info("calculating cover statistics")
        calc_cover_statistics(folder, grid)
    m = pd.read_json(stats_path)
    m.index = m["ID_PATCH"].astype(int)
    m = m.sort_index()
    tiles = tiles if tiles is not None else sorted(m["TILE"].unique())
    rng = np.random.default_rng(seed)
    per_tile = grid * grid

    set_col = np.array([""] * len(m), dtype=object)
    for e, tile in enumerate(tiles):
        sel = m["TILE"] == tile
        sub = m[sel]
        minority_mask = np.zeros((grid, grid), bool)
        flax_mask = np.zeros((grid, grid), bool)
        for pid, row in sub.iterrows():
            local = int(pid) % per_tile
            r, c = local // grid, local % grid
            # seed criterion (reference s2_ts_cz_crop.py:585-590): any
            # minority class present, OR all three majority classes below
            # their caps. Reference quirk preserved: the Cover columns hold
            # PIXEL COUNTS (calc_cover_statistics), so '< 0.2'/'< 0.3'
            # effectively means ZERO pixels of each majority class.
            low_majority = (row.get("Background_Cover", np.inf) < 0.2
                            and row.get("Grassland_Cover", np.inf) < 0.3
                            and row.get("Winter_cereals_Cover", np.inf) < 0.3)
            if low_majority or any(row.get(col, 0) > 0
                                   for col in MINORITY_COLUMNS):
                minority_mask[r, c] = True
            if row.get("Flax_Hemp_Cover", 0) > 0:
                flax_mask[r, c] = True
        final = split_tile_grid(minority_mask, flax_mask, rng)
        np.save(os.path.join(folder, f"patches_distribution_{tile}.npy"), final)
        names = {1: "train", 2: "val", 3: "test"}
        for pid in sub.index:
            local = int(pid) % per_tile
            r, c = local // grid, local % grid
            code = int(final[r, c])
            if code:
                set_col[m.index.get_loc(pid)] = names[code]
    m["set"] = set_col
    meta = pd.read_json(os.path.join(folder, "metadata.json"))
    meta.index = meta["ID_PATCH"].astype(int)
    meta = meta.sort_index()
    meta["set"] = set_col
    meta.to_json(os.path.join(folder, "metadata.json"), indent=4,
                 orient="records")
    m.to_json(stats_path, indent=4, orient="records")
    return meta


def compute_sample_weights(folder: str) -> np.ndarray:
    """Minority-presence sample weights (reference :687-722); also written
    into metadata.json as a 'weight' column."""
    import pandas as pd

    stats = pd.read_json(os.path.join(folder, "metadata_and_stats.json"))
    m = pd.read_json(os.path.join(folder, "metadata.json"))
    m.index = m["ID_PATCH"].astype(int)
    m = m.sort_index()
    stats = stats[(stats["Status"] == "OK") & (stats["set"] == "train")]
    stats.index = stats["ID_PATCH"].astype(int)
    stats = stats.sort_index()
    cols = [c for c in stats.columns if "Cover" in c
            and c not in ("Nodata_Cover", "Snow_Cloud_Cover")]
    weights = SAMPLE_WEIGHTS[:len(cols)]
    presence = (stats[cols].values > 0).astype(int)
    w = (presence * weights[None, :len(cols)]).sum(axis=1)
    w[w == 0] = 1
    m.loc[stats.index, "weight"] = w
    m.to_json(os.path.join(folder, "metadata.json"), indent=4, orient="records")
    return w


def compute_norm_vals(folder: str):
    """Train-set channel mean/std (reference :725-753), .SAFE channel order."""
    from crop2seg_tpu.data.s2tsczcrop import S2TSCZCropDataset

    dt = S2TSCZCropDataset(folder=folder, norm=False, set_type="train",
                           channels_like_pastis=False)
    means, stds = [], []
    for i in range(len(dt)):
        x = dt[i]["x"]  # (T, H, W, C)
        flat = x.reshape(-1, x.shape[-1])
        means.append(flat.mean(axis=0))
        stds.append(flat.std(axis=0))
    out = {"train": {"mean": np.stack(means).mean(0).tolist(),
                     "std": np.stack(stds).mean(0).tolist()}}
    with open(os.path.join(folder, "NORM_S2_patch.json"), "w") as f:
        json.dump(out, f, indent=4)
    return out
