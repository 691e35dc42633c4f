"""Web application layer: whole-tile crop-map generation pipeline + UI.

Re-design of /root/reference/src/webapp/ and crop2seg.py. The pipeline logic
(patch picking, time-series acquisition, batched TPU inference, crop-map
post-processing, cache management) is headless and fully importable
(crop2seg_tpu.webapp.pipeline); the Streamlit UI (crop2seg_tpu.webapp.app)
is a thin shell over it, gated on streamlit being installed.
"""
from crop2seg_tpu.webapp.pipeline import (
    CacheManager, get_info, generate_prediction, tile_cell_bounds,
)
