#!/usr/bin/env python
"""Headline benchmark: whole-tile-class inference throughput on one chip.

Measures TimeUNet_v1 (the reference's shipped inference model,
/root/reference/src/webapp/prediction.py:201) forward throughput in
S2 patches/sec/chip at the hardest shape (T=61, 10ch, 128x128), bf16 compute.

vs_baseline is the ratio against the reference implementation measured on
this host: PyTorch CPU TimeUNet_v1, batch 1, T=61 -> 57.3 s/patch
(0.01745 patches/sec, single thread — the webapp inference path at
prediction.py:310-323 runs batch-1 CPU/single-GPU; no GPU exists here, and
the repo publishes no latency numbers: README.md benchmark section is TODO).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp

REFERENCE_PATCHES_PER_SEC = 0.01745  # torch CPU, measured on this host

B = 8          # patches per device batch
T = 61         # max S2TSCzCrop series length
H = W = 128
C = 10
WARMUP = 3
ITERS = 10


def main():
    from crop2seg_tpu.models import TimeUNet
    from crop2seg_tpu.nn.temporal import pad_mask_from_lengths

    model = TimeUNet(input_dim=C, out_conv=(32, 15), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, C), jnp.float32)
    dates = jnp.tile((jnp.arange(T, dtype=jnp.float32) * 5 + 3)[None, :], (B, 1))
    pad_mask = pad_mask_from_lengths(jnp.full((B,), T), T)
    variables = model.init(jax.random.PRNGKey(1), x, dates,
                           pad_mask=pad_mask, train=False)

    import numpy as np

    @jax.jit
    def fwd(v, x, d, m):
        logits = model.apply(v, x, d, pad_mask=m, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    # Timing note: under the axon relay, block_until_ready does NOT force
    # execution (it is lazy until data is fetched), so every timed call
    # fetches the full class map to host — which is also what real
    # whole-tile inference does with its predictions.
    for _ in range(WARMUP):
        np.asarray(fwd(variables, x, dates, pad_mask))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(fwd(variables, x, dates, pad_mask))
    dt = time.perf_counter() - t0

    patches_per_sec = B * ITERS / dt
    print(json.dumps({
        "metric": "timeunet_v1 infer throughput (T=61, 10ch, 128^2, bf16)",
        "value": round(patches_per_sec, 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / REFERENCE_PATCHES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
