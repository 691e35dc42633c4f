from crop2seg_tpu.ops.boundary import boundary_mask, dilate_classes
from crop2seg_tpu.ops.patchify import (
    patchify_grid, unpatchify_grid, patchify_inference_tile,
    stitch_inference_tile, patchify_training_tile,
    INFER_TILE, INFER_PADDED, PATCH,
)
