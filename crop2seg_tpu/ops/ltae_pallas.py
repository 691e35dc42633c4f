"""Fused masked L-TAE forward as a Pallas TPU kernel.

The reference L-TAE hot path (/root/reference/src/backbones/tae.py:451-504,
760-847) is, per pixel row r over T<=61 steps:

    GroupNorm -> 1x1 proj (C->256) -> +PE -> K proj -> masked 1-query
    softmax attention -> head-grouped weighted sum -> MLP+BN+ReLU -> GroupNorm

Run as separate XLA ops this materializes the projected sequence
h (N, T, 256) — 4x the input — in HBM several times. The fused kernel keeps
h in VMEM for a block of rows: HBM traffic becomes read x once + write
out (N, 128) and attn (N, heads, T), a ~6x reduction for the bandwidth-bound
TimeUNet full-resolution case (N = B*16384).

Scope: inference path (eval mode: dropout off, BatchNorm folded into the MLP
matmul) with num_queries=1. Training keeps the XLA path (autodiff).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, pe_ref, mask_ref,
            in_scale_ref, in_bias_ref, win_ref, bin_ref, wk_ref, bk_ref,
            q_ref, wm_ref, bm_ref, out_scale_ref, out_bias_ref,
            out_ref, attn_ref, *, n_head: int, d_k: int, eps: float):
    r, t, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    d_model = win_ref.shape[1]
    d_out = wm_ref.shape[1]
    d_v = d_model // n_head

    c_g = c // n_head

    def grouping(n_ch: int, g: int):
        """0/1 matrix (n_ch, g): S[i, j] = 1 iff channel i is in head j.
        Per-group sum = X @ S; per-group broadcast = V @ S.T. Mosaic cannot
        shape-cast the lane dim, so grouped reductions go through the MXU."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 1)
        return (rows // (n_ch // g) == cols).astype(jnp.float32)

    def mm(a, b, exact=True):
        # fp32 MXU passes everywhere: grouped GroupNorm statistics flow
        # through these matmuls and the downstream small-group norms amplify
        # bf16 input rounding ~100x. The matmuls are tiny and the kernel is
        # bandwidth/overhead bound, so exactness is nearly free.
        precision = jax.lax.Precision.HIGHEST if exact else None
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=precision)

    sg_c = grouping(c, n_head)          # (C, G)
    sg_o = grouping(d_out, n_head)      # (d_out, G)
    sg_k = grouping(n_head * d_k, n_head)   # (64, G)
    sg_v = grouping(d_model, n_head)    # (d_model, G)

    x = x_ref[0].astype(jnp.float32)                      # (R, T, C)
    # --- GroupNorm over (T, C/G) per row (torch GroupNorm((N, C, T))) ------
    cnt = float(t * c_g)
    mean = mm(jnp.sum(x, axis=1), sg_c) / cnt             # (R, G)
    mean_big = mm(mean, sg_c.T)                           # (R, C)
    d = x - mean_big[:, None, :]
    var = mm(jnp.sum(jnp.square(d), axis=1), sg_c) / cnt  # (R, G)
    inv_big = mm(jax.lax.rsqrt(var + eps), sg_c.T)        # (R, C)
    xn = d * inv_big[:, None, :] * in_scale_ref[:][None, None, :] \
        + in_bias_ref[:][None, None, :]

    # --- 1x1 projection + positional encoding ------------------------------
    h = mm(xn.reshape(r * t, c), win_ref[:]) + bin_ref[:][None, :]
    h = (h.reshape(r, t, d_model) + pe_ref[0][None, :, :]).reshape(r * t, d_model)

    # --- keys + scores ------------------------------------------------------
    k = mm(h, wk_ref[:]) + bk_ref[:][None, :]             # (R*T, 64)
    # scores[n, g] = sum_d q[g, d] * k[n, g*d_k+d] / sqrt(d_k)
    # q arrives pre-flattened (1, n_head*d_k), head-major
    scores = mm(k * q_ref[:], sg_k) * (1.0 / np.sqrt(d_k))  # (R*T, G)
    # Move T to the LANE axis before the softmax: reducing over the middle
    # axis of (R, T, G) with tiny G makes Mosaic pad G to 128 lanes and blow
    # scoped VMEM; over the last axis of (R*G, T) it is a native reduction.
    scores = jnp.swapaxes(scores.reshape(r, t, n_head), 1, 2)  # (R, G, T)
    scores = scores.reshape(r * n_head, t)
    # pad mask: mask_ref (1, T) 1.0 at pads -> set to -1e6 (reference
    # tae.py:829-831 uses masked_fill, not add)
    scores = jnp.where(mask_ref[0][None, :] > 0.5, -1e6, scores)
    smax = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - smax)
    attn = e / jnp.sum(e, axis=1, keepdims=True)          # (R*G, T)

    # --- head-grouped weighted sum over T ----------------------------------
    # broadcast each head's weight over its d_v channels via S.T, then sum T.
    attn_rtg = jnp.swapaxes(attn.reshape(r, n_head, t), 1, 2)  # (R, T, G)
    attn_big = mm(attn_rtg.reshape(r * t, n_head), sg_v.T)  # (R*T, d_model)
    o = jnp.sum((attn_big * h).reshape(r, t, d_model), axis=1)  # (R, d_model)

    # --- MLP (BatchNorm pre-folded) + ReLU ----------------------------------
    m = mm(o, wm_ref[:]) + bm_ref[:][None, :]
    m = jnp.maximum(m, 0.0)

    # --- out GroupNorm per row over channel groups --------------------------
    o_g = d_out // n_head
    omean_big = mm(mm(m, sg_o) / float(o_g), sg_o.T)      # (R, d_out)
    dcen = m - omean_big
    ovar = mm(jnp.square(dcen), sg_o) / float(o_g)        # (R, G)
    oinv_big = mm(jax.lax.rsqrt(ovar + eps), sg_o.T)      # (R, d_out)
    mn = dcen * oinv_big
    out_ref[0] = (mn * out_scale_ref[:][None, :]
                  + out_bias_ref[:][None, :]).astype(out_ref.dtype)
    # attn is already in (R*G, T) = (R, G, T) layout
    attn_ref[0] = attn.reshape(r, n_head, t).astype(attn_ref.dtype)


def fold_batchnorm(wm: jax.Array, bm: jax.Array, bn_scale, bn_bias,
                   bn_mean, bn_var, eps: float = 1e-5):
    """Fold eval-mode BatchNorm1d into the MLP Dense: y = (xW+b -m)/s*g+B."""
    s = bn_scale * jax.lax.rsqrt(bn_var + eps)
    return wm * s[None, :], (bm - bn_mean) * s + bn_bias


def ltae_fused_forward(x: jax.Array, pe: jax.Array, pad_mask: jax.Array,
                       params: Dict[str, jax.Array], *, n_head: int = 16,
                       d_k: int = 4, row_block: int = 16,
                       eps: float = 1e-5, interpret: bool | None = None):
    """Fused L-TAE forward.

    x: (B, N, T, C) rows (N = H*W), pe: (B, T, d_model),
    pad_mask: (B, T) bool. params keys: in_scale, in_bias, win (C, d),
    bin, wk (d, n_head*d_k), bk, q (n_head, d_k), wm_folded (d, d_out),
    bm_folded, out_scale, out_bias.

    Returns out (B, N, d_out), attn (B, N, n_head, T).
    """
    if interpret is None:  # interpret off-TPU so the same code runs in tests
        dev = jax.config.jax_default_device or jax.devices()[0]
        interpret = getattr(dev, "platform", "cpu") not in ("tpu", "axon")
    b, n, t, c = x.shape
    d_model = params["win"].shape[1]
    d_out = params["wm_folded"].shape[1]
    r = min(row_block, n)
    assert n % r == 0, (n, r)
    grid = (b, n // r)

    mask_f = pad_mask.astype(jnp.float32)

    kernel = functools.partial(_kernel, n_head=n_head, d_k=d_k, eps=eps)

    def vec(_=None):  # whole small tensor resident in VMEM
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    out, attn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, r, t, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d_model), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            vec(None), vec(None), vec(None), vec(None), vec(None), vec(None),
            vec(None), vec(None), vec(None), vec(None), vec(None),
        ],
        out_specs=[
            pl.BlockSpec((1, r, d_out), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, n_head, t), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d_out), x.dtype),
            jax.ShapeDtypeStruct((b, n, n_head, t), jnp.float32),
        ],
        interpret=interpret,
    )(x, pe, mask_f,
      params["in_scale"], params["in_bias"], params["win"], params["bin"],
      params["wk"], params["bk"],
      params["q"].reshape(1, n_head * d_k),  # flatten outside: Mosaic
      params["wm_folded"],                   # rejects lane-dim reshapes
      params["bm_folded"], params["out_scale"], params["out_bias"])
    return out, attn


def params_from_ltae_variables(variables: Dict, n_head: int = 16) -> Dict:
    """Extract + fold the fused-kernel parameter dict from flax LTAE
    variables (crop2seg_tpu.nn.ltae.LTAE layout)."""
    p = variables["params"]
    bs = variables.get("batch_stats", {})
    wm, bm = p["mlp_dense"]["kernel"], p["mlp_dense"]["bias"]
    if "mlp_bn" in bs:
        wm, bm = fold_batchnorm(
            wm, bm, p["mlp_bn"]["scale"], p["mlp_bn"]["bias"],
            bs["mlp_bn"]["mean"], bs["mlp_bn"]["var"])
    return {
        "in_scale": p["in_norm_scale"], "in_bias": p["in_norm_bias"],
        "win": p["inconv"]["kernel"], "bin": p["inconv"]["bias"],
        "wk": p["attention"]["fc1_k"]["kernel"],
        "bk": p["attention"]["fc1_k"]["bias"],
        "q": p["attention"]["query"][:, 0, :],  # (n_head, 1, d_k) -> (n_head, d_k)
        "wm_folded": wm, "bm_folded": bm,
        "out_scale": p["out_norm_scale"], "out_bias": p["out_norm_bias"],
    }
