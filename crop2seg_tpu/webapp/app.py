"""Streamlit crop-map UI (run: ``streamlit run crop2seg_tpu/webapp/app.py``).

Thin shell over crop2seg_tpu.webapp.pipeline mirroring the reference app's
three tabs (Home / Crop map / Cache) and session-state machine
(/root/reference/crop2seg.py:47-163,263-385). All heavy lifting is in the
headless pipeline so the app works identically from scripts and notebooks.
"""
from __future__ import annotations

import os

try:
    import streamlit as st
except ImportError as err:  # streamlit is not baked into this image
    raise SystemExit(
        "streamlit is not installed; use crop2seg_tpu.webapp.pipeline "
        "directly (generate_prediction / get_info / CacheManager)") from err

import numpy as np

from crop2seg_tpu.config import DEFAULT_TILES
from crop2seg_tpu.data.s2tsczcrop import LABELS
from crop2seg_tpu.webapp.pipeline import (
    CacheManager, generate_prediction, get_info, get_time_series)

CACHE_DIR = os.environ.get("CROP2SEG_CACHE", os.path.expanduser("~/.crop2seg"))
MODEL_DIR = os.environ.get("CROP2SEG_MODEL", "data/inference/timeunet_v1_base")


def main():
    st.set_page_config(page_title="crop2seg-tpu", layout="wide")
    page = st.sidebar.radio("Menu", ["Home", "Crop map", "Cache"])
    cache = CacheManager(CACHE_DIR)

    if page == "Home":
        st.title("Predict crops (TPU)")
        tile = st.selectbox("Sentinel-2 tile", DEFAULT_TILES)
        cell = st.number_input("Cell index (0-99)", 0, 99, 0)
        year = st.number_input("Year", 2016, 2026, 2019)
        if st.button("Predict crops"):
            info = get_info(tile, int(cell))
            st.write(f"Acquiring time series for {info['tile']} "
                     f"cell {info['cell']} ...")
            data_folder = get_time_series(tile, info["bounds"], CACHE_DIR)
            st.write("Running TPU inference ...")
            result = generate_prediction(data_folder, MODEL_DIR, int(year),
                                         CACHE_DIR)
            st.session_state["result"] = result
            st.success("Crop map generated")

    elif page == "Crop map":
        st.title("Crop map")
        result = st.session_state.get("result")
        if result is None:
            path = os.path.join(CACHE_DIR, "prediction", "classes.npy")
            if os.path.exists(path):
                result = {"classes": np.load(path)}
        if result is None:
            st.info("No prediction cached yet — run one from Home.")
        else:
            st.image((result["classes"].astype(float)
                      / max(len(LABELS) - 1, 1)), caption="Predicted classes",
                     clamp=True)
            st.write({i: name for i, name in enumerate(LABELS)})

    else:
        st.title("Cache management")
        for sub, size in cache.sizes().items():
            col1, col2 = st.columns([3, 1])
            col1.write(f"{sub}: {size / 1e6:.1f} MB")
            if col2.button(f"Delete {sub}"):
                cache.clear(sub)
                st.rerun()


if __name__ == "__main__":
    main()
