#!/usr/bin/env python
"""Headline benchmark: whole-tile-class inference throughput on one chip.

Measures TimeUNet_v1 (the reference's shipped inference model,
/root/reference/src/webapp/prediction.py:201) forward throughput in
S2 patches/sec/chip at the hardest shape (T=61, 10ch, 128x128), bf16 compute.

Methodology notes for this environment:
- the axon relay executes lazily (block_until_ready is a no-op) and adds
  ~31 ms round-trip latency per host fetch; the benchmark therefore runs
  N_CHUNKS forward passes inside ONE jitted lax.scan over distinct inputs
  and fetches all N argmax maps with a single round trip.
- vs_baseline is the ratio against the reference implementation measured on
  this host: PyTorch CPU TimeUNet_v1, batch 1, T=61 -> 57.3 s/patch
  (0.01745 patches/sec, single thread — the webapp inference path at
  prediction.py:310-323 runs batch-1 CPU/single-GPU; no GPU exists here and
  the repo publishes no latency numbers: README.md benchmark section is TODO).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_PATCHES_PER_SEC = 0.01745  # torch CPU, measured on this host

B = 8          # patches per forward
N_CHUNKS = 6   # forwards per timed round trip
T = 61         # max S2TSCzCrop series length
H = W = 128
C = 10
WARMUP = 2
ROUNDS = 4


def main():
    from crop2seg_tpu.models import TimeUNet
    from crop2seg_tpu.nn.temporal import pad_mask_from_lengths

    model = TimeUNet(input_dim=C, out_conv=(32, 15), dtype=jnp.bfloat16)
    xs = jax.random.normal(jax.random.PRNGKey(0),
                           (N_CHUNKS, B, T, H, W, C), jnp.bfloat16)
    dates = jnp.tile((jnp.arange(T, dtype=jnp.float32) * 5 + 3)[None, :], (B, 1))
    pad_mask = pad_mask_from_lengths(jnp.full((B,), T), T)
    variables = model.init(jax.random.PRNGKey(1), xs[0], dates,
                           pad_mask=pad_mask, train=False)

    @jax.jit
    def fwd_many(v, xs):
        def body(_, xb):
            logits = model.apply(v, xb, dates, pad_mask=pad_mask, train=False)
            return None, jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        _, preds = jax.lax.scan(body, None, xs)
        return preds

    for _ in range(WARMUP):
        np.asarray(fwd_many(variables, xs))

    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        np.asarray(fwd_many(variables, xs))
    dt = time.perf_counter() - t0

    patches_per_sec = ROUNDS * N_CHUNKS * B / dt
    print(json.dumps({
        "metric": "timeunet_v1 infer throughput (T=61, 10ch, 128^2, bf16)",
        "value": round(patches_per_sec, 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(patches_per_sec / REFERENCE_PATCHES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
