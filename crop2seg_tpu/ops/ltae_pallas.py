"""Fused masked L-TAE forward as a Pallas TPU kernel.

The reference L-TAE hot path (/root/reference/src/backbones/tae.py:451-504,
760-847) is, per pixel row r over T<=61 steps:

    GroupNorm -> 1x1 proj (C->256) -> +PE -> K proj -> masked 1-query
    softmax attention -> head-grouped weighted sum -> MLP+BN+ReLU -> GroupNorm

Run as separate XLA ops this materializes the projected sequence
h (N, T, 256) — 4x the input — in HBM and reads it back at least twice
(key projection + attention values). The fused kernel keeps h in VMEM for a
block of rows: HBM traffic becomes read x once + write out (N, d_out)
[+ attn (N, heads, T) only when the caller consumes it], a ~10x reduction for
the bandwidth-bound TimeUNet full-resolution case (N = B*16384).

Design notes (v3; v2 was correct but compute-bound at ~2x the DMA floor —
a cached-input probe showed the 13 ms HBM stream fully hidden behind 27 ms
of compute, ~8 ms of it a softmax running on 16 of 128 lanes):
- input is TIME-MAJOR (B, T, N, C), a free reshape of the model's natural
  (B, T, H, W, C) layout, so no HBM transpose feeds the kernel;
- the learnable query is contracted into the key projection offline
  (U[:, g] = W_k[:, g*d_k:(g+1)*d_k] @ q[g] / sqrt(d_k)) and U is folded
  on through the input projection: scores = xn @ (Win@U) + (bin + pe)@U + cs
  — exact linear algebra, removes both the K tensor and the per-block
  (T*R, D)@(D, G) matmul;
- the pad mask is folded into the per-(b, t) score bias as an additive
  -1e6 (exp underflows to exactly 0, same result as masked_fill);
- the in-GroupNorm affine is folded into W_in, eval BatchNorm into the MLP;
- matmuls run in the input dtype (bf16 on the inference path) with fp32
  accumulation on the MXU; GroupNorm statistics and the softmax are fp32;
- the softmax runs in the (G, T, R) layout — R=128 row-blocks fill the lane
  axis (the earlier (T, R, G) layout lit only G=16 of 128 lanes, 8x VPU
  waste) — with sublane reductions over T, then one rank-3 transpose back;
- one flat grid over row blocks of 128; Pallas double-buffers the block
  DMAs automatically; blocks narrower than 128 lanes fall back to the
  (T, R, G) softmax (the (G, T, R) dot_general crashes Mosaic there);
- Mosaic cannot reshape/split the lane (last) axis, so grouped reductions
  and broadcasts go through tiny 0/1 matrices on the MXU;
- (v3.1) two pixels are packed per lane row: C=64 on lanes leaves bf16
  (16, 128)-tiles half-empty, so x is viewed as (B, T, N/2, 2C) — a free
  reinterpret — and every per-pixel weight is block-diagonalized
  (ltae_fused_forward); the kernel then runs the identical math at full
  lane width. Output is bitwise identical to the unpacked form.
Measured (v5e, B=8, N=16384, T=61, C=64): v2 28.1 -> v3 18.8 -> packed
13.0 ms (stage probe: ~10.6 ms of that is the platform's flat ~96 GB/s
Pallas DMA floor for the 1 GB x stream).

Scope: inference path (eval mode: dropout off, BatchNorm folded into the MLP
matmul); num_queries >= 1 (the nq > 1 rank-extended variant of
tae.py:490-499 runs the per-query math lane-widened — see
ltae_fused_forward). Training goes through the custom-VJP kernel pair in
ops/ltae_pallas_train.py instead.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, pe_ref,
            win_ref, bin_ref, ws_ref, pes_ref, wm_ref, bm_ref,
            out_scale_ref, out_bias_ref, *rest,
            n_head: int, nq: int, eps: float, exact: bool,
            tail: bool, need_attn: bool):
    # optional trailing inputs (tail=True): tsc/tsh (1, T, C) — the deferred
    # conv-tail GroupNorm affine applied as max(x*sc+sh, 0) right after the
    # block DMA (see ltae_fused_forward tail_affine).
    if tail:
        tsc_ref, tsh_ref = rest[0], rest[1]
        rest = rest[2:]
    out_ref = rest[0]
    attn_ref = rest[1] if need_attn else None
    t, r, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    d_model = win_ref.shape[1]
    d_out = wm_ref.shape[1]       # = nq * d_true (wm arrives block-diag'd)
    g = n_head                    # GroupNorm / value-split head count
    gs = g * nq                   # score groups: one per (head, query)
    c_g = c // g
    cdt = jnp.float32 if exact else x_ref.dtype

    def grouping(n_ch: int, dt=jnp.float32):
        """0/1 matrix (n_ch, g): S[i, j] = 1 iff channel i is in head j.
        Per-group sum = X @ S; per-group broadcast = V @ S.T."""
        rows = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 1)
        return (rows // (n_ch // g) == cols).astype(dt)

    def mm(a, b, out_dt=jnp.float32):
        # Non-exact mode must pin DEFAULT explicitly: precision=None falls
        # back to the global jax_default_matmul_precision, and 'highest'
        # with bf16 operands makes Mosaic emit a multi-pass matmul that
        # crashes the v5e compiler (observed: remote compile-helper rc=1).
        precision = (jax.lax.Precision.HIGHEST if exact
                     else jax.lax.Precision.DEFAULT)
        return jnp.dot(a, b, preferred_element_type=out_dt,
                       precision=precision)

    sg_c = grouping(c)
    sg_o = grouping(d_out)

    x = x_ref[0]                                           # (T, R, C)
    xf = x.astype(jnp.float32)
    if tail:
        xf = jnp.maximum(xf * tsc_ref[0][:, None, :]
                         + tsh_ref[0][:, None, :], 0.0)
    # --- GroupNorm over (T, C/G) per row (torch GroupNorm((N, C, T))) ------
    # Two-pass variance (E[(x-mean)^2], not E[x^2]-E[x]^2): the one-pass
    # cancellation under bf16-truncated MXU passes went NEGATIVE for rows
    # with small within-group variance and rsqrt(negative) poisoned whole
    # rows with NaN (~1e-4 of real rows). Centering first removes the
    # cancellation, so the cheap DEFAULT-precision matmuls are safe; the
    # clamp guards the last ulp.
    cnt = float(t * c_g)
    sum_t = jnp.sum(xf, axis=0)                            # (R, C)
    mean = mm(sum_t, sg_c) / cnt                           # (R, G)
    mean_big = mm(mean, sg_c.T)                            # (R, C)
    cen = xf - mean_big[None]                              # (T, R, C)
    var = jnp.maximum(
        mm(jnp.sum(cen * cen, axis=0), sg_c) / cnt, 0.0)   # (R, G)
    inv_big = mm(jax.lax.rsqrt(var + eps), sg_c.T)         # (R, C)
    xn = (cen * inv_big[None]).astype(cdt)

    # --- 1x1 projection (GN affine pre-folded) + positional encoding -------
    h = mm(xn.reshape(t * r, c), win_ref[:].astype(cdt)) + bin_ref[:][None]
    h = (h.reshape(t, r, d_model)
         + pe_ref[0][:, None, :]).astype(cdt)              # (T, R, D)
    h2 = h.reshape(t * r, d_model)

    # --- scores + masked softmax over T ------------------------------------
    # The query was contracted into the key projection (U = Wk q / sqrt(dk))
    # and U is folded all the way through the input projection offline:
    #   scores = h@U + cs = xn@(Win@U) + (bin + pe)@U + cs = xn@Ws + pes[t]
    # so the kernel never runs the (T*R, D)@(D, G) matmul — only a
    # (C, G)-weight one. The pad mask is folded into pes as an additive
    # -1e6 (exp underflows to exactly 0 either way), killing the where pass
    # and the mask input. The softmax runs in the (G, T, R) layout — R=128
    # fills the lane axis (the previous (T, R, G) layout lit only G=16 of
    # 128 lanes: 8x VPU waste, ~8 of the kernel's 26 ms) — with axis-1
    # (sublane) reductions, then ONE rank-3 transpose back to (T, R, G)
    # for the weighted sum. The dot_general emits (G, T, R) directly; no
    # lane-axis split/merge anywhere (Mosaic cannot reshape lanes).
    if r % 128 == 0:
        scores = jax.lax.dot_general(
            ws_ref[:].astype(cdt), xn, (((0,), (2,)), ((), ())),
            precision=(jax.lax.Precision.HIGHEST if exact
                       else jax.lax.Precision.DEFAULT),
            preferred_element_type=jnp.float32)            # (G, T, R) fp32
        scores = scores + pes_ref[0][:, :, None]           # += (G, T, 1)
        smax = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - smax)
        a_gtr = e / jnp.sum(e, axis=1, keepdims=True)      # (G, T, R) fp32
        a_trg = jnp.transpose(a_gtr, (1, 2, 0))            # (T, R, G) fp32
    else:
        # narrow blocks (< 128 lanes) crash Mosaic on the (G, T, R)
        # dot_general; keep the (T, R, G)-layout softmax for them (slower
        # but these are small-N eval shapes, not the flagship path)
        a_gtr = None
        scores = (mm(xn.reshape(t * r, c), ws_ref[:].astype(cdt))
                  .reshape(t, r, gs)
                  + jnp.transpose(pes_ref[0])[:, None, :])  # (T, R, G) fp32
        smax = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - smax)
        a_trg = e / jnp.sum(e, axis=0, keepdims=True)      # (T, R, G) fp32

    # --- head-grouped weighted sum over T -----------------------------------
    # broadcast each head's weight over its d_v channels via S.T, then sum T.
    # Mosaic requires 32-bit matmul accumulators; cast after. NOTE: a
    # widening jnp.sum(bf16, dtype=fp32) crashes the Mosaic compiler on
    # v5e, so the product is cast to fp32 explicitly before the reduce.
    if nq == 1:
        attn_big = mm(a_trg.reshape(t * r, g).astype(cdt),
                      grouping(d_model, cdt).T).astype(cdt)  # (T*R, D)
        h_rep = h2
    else:
        # query q's output block reuses head g's values: broadcast weight
        # (g, q) onto channels [q*D + g*dv, q*D + (g+1)*dv) of the
        # query-major (T*R, nq*D) product (reference tae.py:776-805 runs
        # the same weighted sum per query).
        dv = d_model // g
        rows = jax.lax.broadcasted_iota(jnp.int32, (gs, nq * d_model), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (gs, nq * d_model), 1)
        m_gq = (((rows % nq) == (cols // d_model))
                & ((rows // nq) == ((cols % d_model) // dv))).astype(cdt)
        attn_big = mm(a_trg.reshape(t * r, gs).astype(cdt),
                      m_gq).astype(cdt)                    # (T*R, nq*D)
        h_rep = jnp.concatenate([h2] * nq, axis=1)         # (T*R, nq*D)
    o = jnp.sum((attn_big * h_rep)
                .reshape(t, r, attn_big.shape[1]).astype(jnp.float32),
                axis=0)                                    # (R, nq*D) fp32

    # --- MLP (BatchNorm pre-folded) + ReLU ----------------------------------
    m = mm(o.astype(cdt), wm_ref[:].astype(cdt)) + bm_ref[:][None]
    m = jnp.maximum(m, 0.0)                                # (R, d_out) fp32

    # --- out GroupNorm per row over channel groups --------------------------
    # nq > 1: torch applies GroupNorm to (N, C, nq) (tae.py:488) — each of
    # the g groups pools its C/g channels ACROSS all nq queries, so the
    # grouping matrix maps query-major lane q*d_true + ch to group ch // og.
    o_g = d_out // g            # = og * nq: elements per group either way
    if nq > 1:
        d_true = d_out // nq
        rows = jax.lax.broadcasted_iota(jnp.int32, (d_out, g), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (d_out, g), 1)
        sg_o = (((rows % d_true) // (d_true // g)) == cols).astype(
            jnp.float32)
    omean = mm(m, sg_o) / float(o_g)                       # (R, G)
    ocen = m - mm(omean, sg_o.T)
    ovar = jnp.maximum(mm(ocen * ocen, sg_o) / float(o_g), 0.0)
    oinv_big = mm(jax.lax.rsqrt(ovar + eps), sg_o.T)
    mn = ocen * oinv_big
    out_ref[0] = (mn * out_scale_ref[:][None]
                  + out_bias_ref[:][None]).astype(out_ref.dtype)
    if attn_ref is not None:
        # one relayout, only on the need_attn path (TimeUNet skips it)
        if a_gtr is not None:
            attn_ref[0] = jnp.transpose(a_gtr, (2, 0, 1)).astype(
                attn_ref.dtype)
        else:
            attn_ref[0] = jnp.transpose(a_trg, (1, 2, 0)).astype(
                attn_ref.dtype)


def fold_batchnorm(wm: jax.Array, bm: jax.Array, bn_scale, bn_bias,
                   bn_mean, bn_var, eps: float = 1e-5):
    """Fold eval-mode BatchNorm1d into the MLP Dense: y = (xW+b -m)/s*g+B."""
    s = bn_scale * jax.lax.rsqrt(bn_var + eps)
    return wm * s[None, :], (bm - bn_mean) * s + bn_bias


def ltae_fused_forward(x: jax.Array, pe: jax.Array, pad_mask: jax.Array,
                       params: Dict[str, jax.Array], *, n_head: int = 16,
                       d_k: int = 4, row_block: int = 256,
                       eps: float = 1e-5, need_attn: bool = True,
                       exact: Optional[bool] = None,
                       interpret: Optional[bool] = None,
                       vmem_limit_mb: Optional[int] = None,
                       packed_input: bool = False,
                       tail_affine: Optional[tuple] = None):
    """Fused L-TAE forward.

    x: TIME-MAJOR (B, T, N, C) rows (N = H*W — a free reshape of the model's
    (B, T, H, W, C)); pe: (B, T, d_model); pad_mask: (B, T) bool.
    params keys (raw module parameters — folding happens here, in XLA):
    in_scale, in_bias (C,), win (C, d), bin, wk (d, n_head*d_k), bk,
    q (n_head, d_k), wm_folded (d, d_out), bm_folded, out_scale, out_bias.

    packed_input=True: x arrives LANE-PACKED as (B, T, N/2, 2C) — two pixels
    per lane row, pairs (2m, 2m+1) — and the kernel runs the v3.1 packed
    pipeline (see the module docstring). The producer must write that shape
    natively (e.g. the pair-conv in nn/layers.py): reshaping an unpacked
    (…, N, C) array to (…, N/2, 2C) inside XLA is NOT free — 64-lane bf16
    arrays are stored lane-padded in HBM, so the reshape is a physical
    relayout (~8 ms for the 1 GB flagship tensor, erasing the win).

    tail_affine: optional (sc, sh) of shape (B, T, C_x) fp32 — a deferred
    per-frame affine (the producing conv tail's GroupNorm, with the pad
    mask folded in as zeroed rows) applied as ``max(x*sc+sh, 0)`` in VMEM
    right after the block DMA. C_x is x's LAST dim as passed (2C when
    packed_input). This removes the producer's materialized normalized
    copy: the XLA tail shrinks to conv-out write + stats read, saving the
    normalize read+write (~2 GB on the flagship in_conv tail).

    Returns (out (B, N, d_out), attn (B, N, n_head, T) or None).
    exact=None: fp32 matmuls for fp32 inputs, native-dtype (bf16) matmuls
    with fp32 accumulation otherwise.

    num_queries > 1 (reference tae.py:490-499): pass params["q"] as
    (n_head, nq, d_k) — the scores fold produces one score group per
    (head, query), the weighted sum runs all queries in one lane-axis-
    widened pass, and the MLP/out-GroupNorm apply per query (the out
    GroupNorm pools each head's channels across ALL queries, exactly
    torch GroupNorm on (N, C, nq) at tae.py:488). Returns
    out (B, N, nq, d_out) and attn (B, N, n_head, nq, T). Incompatible
    with packed_input (the flagship packed path is nq=1).
    """
    if interpret is None:  # interpret off-TPU so the same code runs in tests
        dev = jax.config.jax_default_device or jax.devices()[0]
        interpret = getattr(dev, "platform", "cpu") not in ("tpu", "axon")
    if exact is None:
        exact = x.dtype == jnp.float32
    b, t, n, c = x.shape
    if packed_input:
        n, c = 2 * n, c // 2  # logical pixels / true channels
    n_orig = n
    d_model = params["win"].shape[1]
    d_out = params["wm_folded"].shape[1]

    # --- offline folds (tiny XLA ops, fused into the enclosing jit) --------
    # in-GroupNorm affine into W_in:  xn@W+b = xhat@(s*W) + (b + bias_c@W)
    win = params["win"] * params["in_scale"][:, None]
    bin_ = params["bin"] + params["in_bias"] @ params["win"]
    # learnable query into the key projection (exact linear algebra):
    # scores[n,g] = (h@Wk+bk)[n, g*dk:+dk] . q[g] / sqrt(dk) = (h@U + cs)[n,g]
    # (nq > 1: one folded column per (head, query), head-major)
    q3 = params["q"] if params["q"].ndim == 3 else params["q"][:, None, :]
    nq = q3.shape[1]
    assert not (packed_input and nq > 1), \
        "packed_input requires num_queries == 1"
    wk = params["wk"].reshape(d_model, n_head, d_k)
    u = (jnp.einsum("dgk,gqk->dgq", wk, q3)
         / np.sqrt(d_k)).reshape(d_model, n_head * nq)
    cs = (jnp.einsum("gk,gqk->gq", params["bk"].reshape(n_head, d_k),
                     q3) / np.sqrt(d_k)).reshape(1, n_head * nq)
    # ... and U folded through the input projection + PE (all fp32, offline):
    # scores = h@U + cs = xn@(Win@U) + (bin + pe[t])@U + cs = xn@Ws + pes[t],
    # with the pad mask folded in additively (-1e6 biases exp to exactly 0,
    # same as the reference's masked_fill at tae.py:829-831) and the (g, t)
    # layout pre-transposed so the kernel's (G, T, R) scores broadcast it
    # without any in-kernel relayout.
    ws = win.astype(jnp.float32) @ u
    pes = (jnp.einsum("btd,dg->btg", pe.astype(jnp.float32), u)
           + (bin_.astype(jnp.float32) @ u)[None, None] + cs[None])
    pes = pes - 1e6 * pad_mask.astype(jnp.float32)[:, :, None]
    pes = jnp.swapaxes(pes, 1, 2)                          # (B, G, T)

    wm, bm = params["wm_folded"], params["bm_folded"]
    osc, obi = params["out_scale"], params["out_bias"]

    # --- lane packing: 2 pixels per lane row -------------------------------
    # Every kernel array carries C=64 (or D=256, d_out=128...) on the lane
    # axis — a fraction that leaves bf16 (16, 128)-tiles half-empty, halving
    # both DMA and VPU throughput. Viewing x (B, T, N, C) as
    # (B, T, N/2, 2C) is a FREE reinterpret (trailing dims are contiguous),
    # and with every per-pixel weight block-diagonalized (and per-head
    # tables tiled) the existing kernel runs the identical per-pixel math at
    # full lane width: out/attn unpack by the inverse free reinterpret.
    # Measured v5e, B=8, N=16384, T=61, C=64: 18.8 -> 13.0 ms, output
    # bitwise identical. Packing is only applied when the input already
    # arrives packed (packed_input): reshaping an unpacked array here would
    # trigger the HBM relayout described in the docstring and lose more
    # than the kernel gains.
    pack = packed_input
    if pack:
        def bd(a):  # block-diag [[a, 0], [0, a]]
            z = jnp.zeros(a.shape, a.dtype)
            return jnp.concatenate([jnp.concatenate([a, z], 1),
                                    jnp.concatenate([z, a], 1)], 0)

        win, ws, wm = bd(win), bd(ws), bd(wm)
        bin_ = jnp.concatenate([bin_] * 2)
        bm = jnp.concatenate([bm] * 2)
        osc = jnp.concatenate([osc] * 2)
        obi = jnp.concatenate([obi] * 2)
        pe = jnp.concatenate([pe, pe], axis=-1)
        pes = jnp.tile(pes, (1, 2, 1))
        n, c, d_model, d_out = n // 2, 2 * c, 2 * d_model, 2 * d_out
    g_eff = 2 * n_head if pack else n_head
    if nq > 1:
        # per-query MLP: block-diagonal Dense on the query-major (R, nq*D)
        # weighted sum; the out affine repeats per query (torch shares the
        # GroupNorm affine across queries, tae.py:488)
        wm = jax.scipy.linalg.block_diag(*([wm] * nq))
        bm = jnp.concatenate([bm] * nq)
        osc = jnp.concatenate([osc] * nq)
        obi = jnp.concatenate([obi] * nq)
        d_out = nq * d_out

    # fp32/exact keeps h + the weighted-sum product in fp32: a 64-pixel
    # block already fills ~13 MB of the 16 MB scoped VMEM, so cap there.
    r_cap = row_block if not exact else min(row_block, 16 if pack else 32)
    if nq > 1:  # nq-x wider weighted-sum temporaries
        r_cap = min(r_cap, 128)
    r = min(r_cap, n)
    while n % r:
        r //= 2
    grid = (b, n // r)
    # 256-row blocks double the per-T contiguous DMA chunk (32 -> 64 KB):
    # 14.4 -> 13.8 ms on the packed flagship stream, bit-identical output
    # (measured v5e; 512 regresses). Their live temporaries exceed the 16 MB
    # default scoped-VMEM limit, so raise the cap (physical VMEM is 128 MB).
    if vmem_limit_mb is None and not interpret and (r > 128 or nq > 1):
        vmem_limit_mb = 100

    kernel = functools.partial(_kernel, n_head=g_eff, nq=nq, eps=eps,
                               exact=exact, tail=tail_affine is not None,
                               need_attn=need_attn)

    def vec(_=None):  # whole small tensor resident in VMEM
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, t, r, c), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d_model), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vec(), vec(), vec(),
        pl.BlockSpec((1, g_eff * nq, t), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vec(), vec(), vec(), vec(),
    ]
    inputs = [x, pe.astype(jnp.float32),
              win, bin_.astype(jnp.float32), ws, pes,
              wm, bm.astype(jnp.float32), osc, obi]
    if tail_affine is not None:
        tsc, tsh = tail_affine
        assert tsc.shape == (b, t, c) and tsh.shape == (b, t, c), (
            tsc.shape, tsh.shape, (b, t, c))
        in_specs += [pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        inputs += [tsc.astype(jnp.float32), tsh.astype(jnp.float32)]
    out_specs = [pl.BlockSpec((1, r, d_out), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, n, d_out), x.dtype)]
    if need_attn:
        out_specs.append(pl.BlockSpec((1, r, g_eff * nq, t),
                                      lambda i, j: (i, j, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, n, g_eff * nq, t),
                                              jnp.float32))

    kw = {}
    if vmem_limit_mb is not None and not interpret:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kw,
    )(*inputs)
    # unpack: (B, N/2, 2*d) and (B, N/2, 2G, T) are the SAME memory as
    # (B, N, d) / (B, N, G, T) — free reinterpret, inverse of the x view.
    if nq > 1:
        out = res[0].reshape(b, n_orig, nq, d_out // nq)
        if need_attn:
            return out, res[1].reshape(b, n_orig, n_head, nq, t)
        return out, None
    out = res[0].reshape(b, n_orig, d_out // (2 if pack else 1))
    if need_attn:
        return out, res[1].reshape(b, n_orig, n_head, t)
    return out, None


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
        "q": p["attention"]["query"],  # (n_head, nq, d_k)
        "wm_folded": wm, "bm_folded": bm,
        "out_scale": p["out_norm_scale"], "out_bias": p["out_norm_bias"],
    }
