#!/usr/bin/env python
"""Debug the fused L-TAE kernel on the real TPU at small shapes: compare
against the XLA module path; report where outputs diverge / go non-finite."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# TPU fp32 matmuls default to bf16-grade passes; pin exact fp32 so the
# module path is a real oracle (tests/conftest.py does the same).
jax.config.update("jax_default_matmul_precision", "highest")

B, T, H, W, C = 1, 61, 16, 16, 64
N_HEAD, D_K, D_MODEL, D_OUT = 16, 4, 256, 64


def run(dtype, row_block, exact):
    from crop2seg_tpu.nn.ltae import LTAE
    from crop2seg_tpu.ops.ltae_pallas import (
        ltae_fused_forward, params_from_ltae_variables)

    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, C), dtype)
    dates = jnp.asarray(np.tile(np.arange(T, dtype=np.float32)[None] * 5 + 3,
                                (B, 1)))
    pad_np = np.zeros((B, T), bool)
    pad_np[:, 55:] = True
    pad = jnp.asarray(pad_np)

    m = LTAE(in_channels=C, n_head=N_HEAD, d_k=D_K, mlp=(D_MODEL, D_OUT),
             d_model=D_MODEL, dtype=None if dtype == jnp.float32 else dtype)
    v = m.init(jax.random.PRNGKey(1), x, dates, pad_mask=pad, train=False)

    ref_out, ref_attn = jax.jit(lambda v, x: m.apply(
        v, x, dates, pad_mask=pad, train=False, need_attn=True))(v, x)
    ref_out = np.asarray(ref_out.astype(jnp.float32))
    ref_attn = np.asarray(ref_attn.astype(jnp.float32))

    params = params_from_ltae_variables(v, n_head=N_HEAD)
    pe = m.bind(v).positional_encoder(dates)

    def mk(interpret):
        @jax.jit
        def fn(v, x):
            rows = x.reshape(B, T, H * W, C)
            return ltae_fused_forward(
                rows, pe, pad, params, n_head=N_HEAD, d_k=D_K,
                row_block=row_block, need_attn=True, exact=exact,
                interpret=interpret)
        return fn

    print(f"dtype={np.dtype(dtype).name} rb={row_block} exact={exact}")
    results = {}
    for tag, interp in [("mosaic", False), ("interp", True)]:
        out, attn = mk(interp)(v, x)
        out = np.asarray(out.astype(jnp.float32)).reshape(B, H, W, D_OUT)
        attn = np.asarray(attn.astype(jnp.float32)).reshape(
            B, H, W, N_HEAD, T)
        results[tag] = (out, attn)
        print(f"  {tag}: out_err_vs_module {np.abs(out - ref_out).max():.3e}"
              f"  attn_err {np.abs(attn - ref_attn).max():.3e}"
              f"  finite={np.isfinite(out).all()}")
    d_out = np.abs(results["mosaic"][0] - results["interp"][0]).max()
    d_attn = np.abs(results["mosaic"][1] - results["interp"][1]).max()
    print(f"  mosaic vs interp: out {d_out:.3e}  attn {d_attn:.3e}")


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["bf16:64"]:
        dt, rb = arg.split(":")
        dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
        try:
            run(dtype, int(rb), exact=dtype == jnp.float32)
        except Exception as err:
            print(f"{arg}: FAILED {type(err).__name__}: {str(err)[:4000]}")
