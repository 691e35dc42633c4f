"""crop2seg_tpu — TPU-native Sentinel-2 time-series crop segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of Many98/Crop2Seg
(reference mounted read-only at /root/reference):

- ``crop2seg_tpu.nn``        core neural layers (conv blocks, L-TAE attention,
                             positional encoders, temporal aggregation)
- ``crop2seg_tpu.models``    model zoo: UTAE, TimeUNet, WTAE, UNet3D, ConvLSTM,
                             ConvGRU, RecUNet, UNet baselines + factory
- ``crop2seg_tpu.ops``       fused on-device ops (Pallas L-TAE kernel, boundary
                             extraction, patchify/stitch, input preprocessing)
- ``crop2seg_tpu.data``      S2TSCzCrop / PASTIS readers, fixed-T bucketed
                             batching with explicit masks, augmentation
- ``crop2seg_tpu.learning``  losses, streaming IoU metrics, jitted train loop,
                             orbax checkpointing, torch-checkpoint conversion
- ``crop2seg_tpu.parallel``  mesh construction + sharding rules (dp/spatial)
- ``crop2seg_tpu.inference`` whole-tile (10980 m grid) batched inference
- ``crop2seg_tpu.gis``       raster post-processing (numpy; vector IO gated)

Design notes (TPU-first, not a torch translation):
- layouts are channels-last (B, T, H, W, C); convs run NHWC on the MXU
- ragged time series use fixed-T buckets + explicit length masks; there is no
  data-dependent shape anywhere under jit (reference pads per-batch instead:
  /root/reference/src/utils.py:20-66)
- temporally-shared conv blocks compute padded frames densely and mask them
  (reference scatters around them: /root/reference/src/backbones/temp_shared_block.py:18-47)
- scaling is jax.sharding Mesh + shard_map collectives, not a DDP port.
"""

__version__ = "0.1.0"
