#!/usr/bin/env python
"""Time the L-TAE segment on TPU: XLA module path vs fused Pallas kernel.

Usage: python scripts/bench_ltae.py xla|fused[:row_block] [--attn] [--fp32]

Flagship TimeUNet shape: B=8, T=61, N=128*128, C=64 -> d_model=256, d_out=64.
Fetches the full output array inside the timed loop (axon executes lazily).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

B, T, H, W, C = 8, 61, 128, 128, 64
N_HEAD, D_K, D_MODEL, D_OUT = 16, 4, 256, 64
ROUNDS = 6


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "xla"
    need_attn = "--attn" in sys.argv
    dtype = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16

    from crop2seg_tpu.nn.ltae import LTAE

    # generate on device: 8 GB of host-side RNG would take minutes on 1 core
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, C), dtype)
    dates = jnp.asarray(np.tile(np.arange(T, dtype=np.float32)[None] * 5 + 3,
                                (B, 1)))
    pad = jnp.asarray(np.zeros((B, T), bool))

    m = LTAE(in_channels=C, n_head=N_HEAD, d_k=D_K, mlp=(D_MODEL, D_OUT),
             d_model=D_MODEL, dtype=None if dtype == jnp.float32 else dtype)
    v = m.init(jax.random.PRNGKey(1), x, dates, pad_mask=pad, train=False)

    if mode == "xla":
        fn = jax.jit(lambda v, x: m.apply(
            v, x, dates, pad_mask=pad, train=False, need_attn=need_attn)[0])
    else:
        rb = int(mode.split(":")[1]) if ":" in mode else 128
        from crop2seg_tpu.ops.ltae_pallas import (
            ltae_fused_forward, params_from_ltae_variables)
        params = params_from_ltae_variables(v, n_head=N_HEAD)
        pe = m.bind(v).positional_encoder(dates)

        @jax.jit
        def fn(v, x):
            rows = x.reshape(B, T, H * W, C)
            out, _ = ltae_fused_forward(
                rows, pe, pad, params, n_head=N_HEAD, d_k=D_K, row_block=rb,
                need_attn=need_attn, interpret=False)
            return out

    out = np.asarray(fn(v, x))  # compile + warm
    assert np.isfinite(out).all(), "non-finite output"
    np.asarray(fn(v, x))
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        out = np.asarray(fn(v, x))
    dt = (time.perf_counter() - t0) / ROUNDS
    print(f"mode={mode} attn={need_attn} dtype={np.dtype(out.dtype).name} "
          f"out{out.shape}: {dt * 1e3:.2f} ms/call "
          f"({B * H * W / dt / 1e6:.1f} Mrow/s)")


if __name__ == "__main__":
    main()
