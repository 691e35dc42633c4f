"""Fused masked L-TAE attention pooling with a custom VJP (training path).

The reference trains the model it ships — TimeUNet_v1, whose L-TAE runs at
full 128^2 resolution (/root/reference/src/backbones/timeunet.py:169-210,
trained by train.py:327-328). Its projected sequence h = proj(GN(x)) + PE is
(B*16384, T<=61, 256): an ~8 GB bf16 backward residual at B=16 that a plain
XLA autodiff must materialize. The existing ``seq_chunk`` path (nn/ltae.py)
streams it through a rematerialized online-softmax scan; each chunk still
round-trips its embed through HBM twice (forward + backward recompute).

This module removes the HBM round-trips entirely: a Pallas forward kernel
computes the attention-pooled output o = sum_t softmax_t(QK^T) V per 64-row
block with h living only in VMEM, and a Pallas backward kernel *recomputes*
h from x for the same block and produces every gradient in one fused pass.
HBM traffic becomes: read x twice, write o + dx, plus tiny weight-grad
accumulators — independent of T for the big tensors.

Scope: num_queries=1, attention masks not consumed (TimeUNet discards them),
attention dropout supported via the on-core PRNG (the same per-block seed
reproduces identical keep bits in forward and backward — nothing stored).
The MLP+BatchNorm+ReLU+Dropout+GroupNorm tail stays in XLA: train-mode
BatchNorm needs cross-row batch statistics, and its tensors are (N, d_out) —
small next to the fused-away (N, T, d_model) embed.

Math (per pixel row r, head group g; reference tae.py:451-504, 760-847):
    xhat = (x - mean_{T,C/G}) * rsqrt(var + eps)        # GN, affine folded
    h    = xhat @ Wf + bf + pe[t]                       # (T, D)
    s    = h @ U + cs, masked -1e6 at pads              # query folded into U
    a    = softmax_T(s);  a_d = dropout(a)              # drop AFTER softmax
    o[d] = sum_t a_d[t, g(d)] * h[t, d]                 # head-grouped pool

Backward (derived by hand, verified against jax.grad in tests):
    p1   = sum_{d in g} go[d] h[t,d];    da = keep/(1-p) * p1
    ds   = a * (da - sum_t a*da)                        # softmax jacobian
    dh   = ds @ U^T + a_d_big * go
    du   = h^T ds;  dcs = sum ds;  dbf = sum dh;  dpe = sum_rows dh
    dWf  = xhat^T dh
    dxhat= dh @ Wf^T
    dx   = inv * (dxhat - m1/n - xhat * m2/n)           # GN backward
           with m1 = sum_{T,C/G} dxhat, m2 = sum_{T,C/G} dxhat*xhat
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _grouping(n_ch: int, g: int, dt=jnp.float32):
    """0/1 matrix (n_ch, g): S[i, j] = 1 iff channel i is in head group j.
    Per-group sum = X @ S; per-group broadcast = V @ S.T (Mosaic cannot
    reshape/split the lane axis, so grouped reductions ride the MXU)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_ch, g), 1)
    return (rows // (n_ch // g) == cols).astype(dt)


def _mm(a, b, exact: bool, out_dt=jnp.float32):
    # precision=None inherits the global jax_default_matmul_precision and
    # 'highest' with bf16 operands crashes the v5e Mosaic compiler — pin it.
    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)
    return jnp.dot(a, b, preferred_element_type=out_dt, precision=precision)


def _embed_block(x, mask_col, win_ref, bin_ref, pe_ref, *, g: int, eps: float,
                 exact: bool, cdt, tail=None):
    """Shared fwd/bwd recompute: [deferred conv-tail affine+ReLU ->] GN
    (two-pass, affine folded into W) -> 1x1 projection -> +PE. Returns
    (xf (T,R,C) f32, xhat (T,R,C) f32, inv_big (R,C) f32, h (T,R,D) cdt,
    h2 (T*R, D)).

    tail: optional (tsc, tsh) each (T, C) f32 — the producing conv tail's
    deferred GroupNorm affine (nn/layers.py defer_tail_norm): the kernel
    input is then the RAW pair-conv output z and xf = max(z*tsc+tsh, 0) is
    applied in VMEM right after the block DMA, saving the materialized
    normalized copy in HBM (see ops/ltae_pallas.py tail_affine)."""
    t, r, c = x.shape
    sg_c = _grouping(c, g)
    xf = x.astype(jnp.float32)
    if tail is not None:
        tsc, tsh = tail
        xf = jnp.maximum(xf * tsc[:, None, :] + tsh[:, None, :], 0.0)
    cnt = float(t * (c // g))
    sum_t = jnp.sum(xf, axis=0)                                  # (R, C)
    mean_big = _mm(_mm(sum_t, sg_c, exact) / cnt, sg_c.T, exact)  # (R, C)
    cen = xf - mean_big[None]                                    # (T, R, C)
    var = jnp.maximum(
        _mm(jnp.sum(cen * cen, axis=0), sg_c, exact) / cnt, 0.0)  # (R, G)
    inv_big = _mm(jax.lax.rsqrt(var + eps), sg_c.T, exact)       # (R, C)
    xhat = cen * inv_big[None]                                   # f32
    d_model = win_ref.shape[1]
    h = _mm(xhat.reshape(t * r, c).astype(cdt), win_ref[:].astype(cdt),
            exact) + bin_ref[:][None]
    h = (h.reshape(t, r, d_model) + pe_ref[0][:, None, :]).astype(cdt)
    return xf, xhat, inv_big, h, h.reshape(t * r, d_model)


def _attn_weights(xhat, pe_ref, mask_col, win_ref, bin_ref, u_ref, cs_ref,
                  *, t, r, g, exact, cdt):
    """Masked softmax over T; returns attention in the (T, R, G) layout.

    Scores come straight from the normalized input: s = h@U + cs with
    h = xhat@Win + bin + pe  ==  xhat@(Win@U) + (bin + pe)@U + cs — exact
    algebra, replacing the (T*R, D)@(D, G) matmul by a (C, G)-weight one
    (Win@U and (bin+pe)@U are per-block (C,G)/(T,G) crumbs). The pad mask
    is an additive -1e6 (exp underflows to exactly 0, same as masked_fill).
    On 128-lane row blocks the softmax runs in the (G, T, R) layout — R
    fills the lane axis; the old (T, R, G) form lit 16/128 lanes — then one
    rank-3 transpose returns (T, R, G). fwd and bwd call this identically,
    so the recomputed weights (and the dropout bits applied by the callers
    in (T, R, G)) match the forward bit-for-bit."""
    uf = u_ref[:].astype(jnp.float32)
    ws = _mm(win_ref[:].astype(jnp.float32), uf, exact)          # (C, G) f32
    pes = _mm(pe_ref[0] + bin_ref[:][None], uf, exact) + cs_ref[:]  # (T, G)
    pes = pes - 1e6 * mask_col                                   # (T, G) f32
    xc = xhat.astype(cdt)                                        # (T, R, C)
    precision = (jax.lax.Precision.HIGHEST if exact
                 else jax.lax.Precision.DEFAULT)
    if r % 128 == 0:
        s = jax.lax.dot_general(ws.astype(cdt), xc,
                                (((0,), (2,)), ((), ())),
                                precision=precision,
                                preferred_element_type=jnp.float32)
        s = s + jnp.transpose(pes)[:, :, None]                   # (G, T, R)
        smax = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - smax)
        a = e / jnp.sum(e, axis=1, keepdims=True)
        return jnp.transpose(a, (1, 2, 0))                       # (T, R, G)
    # narrow blocks (< 128 lanes) crash Mosaic on the (G, T, R) dot_general
    s = _mm(xc.reshape(t * r, xc.shape[-1]), ws.astype(cdt),
            exact).reshape(t, r, g) + pes[:, None, :]
    smax = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - smax)
    return e / jnp.sum(e, axis=0, keepdims=True)                 # (T, R, G)


def _keep_mask(seed_ref, drop_p: float, shape, interpret: bool):
    """Deterministic per-block dropout keep mask. The same seed (folded with
    the grid position) reproduces identical bits in the backward kernel —
    the mask is never stored.

    On hardware the bits come from the TPU on-core PRNG. In interpret mode
    (CPU tests / CPU meshes) that primitive has no lowering, so the mask is
    derived from jax.random keyed by the same per-block counter — equally
    deterministic across fwd/bwd, different bit pattern (dropout is random;
    no contract ties the two streams together)."""
    i, j = pl.program_id(0), pl.program_id(1)
    blk = seed_ref[0] + i * pl.num_programs(1) + j
    if interpret:
        key = jax.random.fold_in(jax.random.PRNGKey(0), blk)
        return jax.random.bernoulli(key, 1.0 - drop_p, shape).astype(
            jnp.float32)
    pltpu.prng_seed(blk)
    bits = pltpu.prng_random_bits(shape)                         # uint32
    thresh = np.uint32(int(drop_p * float(2**32)))
    return (pltpu.bitcast(bits, jnp.uint32) >= thresh).astype(jnp.float32)


def _fwd_kernel(seed_ref, x_ref, pe_ref, mask_ref, win_ref, bin_ref,
                u_ref, cs_ref, *rest, n_head: int, eps: float,
                exact: bool, drop_p: float, tail: bool, interpret: bool):
    # optional trailing inputs (tail=True): tsc/tsh (1, T, C) — the deferred
    # conv-tail GroupNorm affine (see _embed_block).
    if tail:
        tail_refs = (rest[0][0], rest[1][0])
        rest = rest[2:]
    else:
        tail_refs = None
    o_ref = rest[0]
    t, r, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cdt = jnp.float32 if exact else x_ref.dtype
    g = n_head
    d_model = win_ref.shape[1]

    _, xhat, _, h, h2 = _embed_block(
        x_ref[0], mask_ref[0], win_ref, bin_ref, pe_ref,
        g=g, eps=eps, exact=exact, cdt=cdt, tail=tail_refs)
    a = _attn_weights(xhat, pe_ref, mask_ref[0], win_ref, bin_ref, u_ref,
                      cs_ref, t=t, r=r, g=g, exact=exact, cdt=cdt)
    if drop_p > 0.0:
        a = a * _keep_mask(seed_ref, drop_p, a.shape,
                           interpret) / (1.0 - drop_p)
    abig = _mm(a.reshape(t * r, g).astype(cdt),
               _grouping(d_model, g, cdt).T, exact).astype(cdt)
    # widening jnp.sum(bf16, dtype=f32) crashes Mosaic on v5e: cast first
    o = jnp.sum((abig * h2).reshape(t, r, d_model).astype(jnp.float32),
                axis=0)                                          # (R, D) f32
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, pe_ref, mask_ref, win_ref, bin_ref,
                u_ref, cs_ref, *rest,
                n_head: int, eps: float, exact: bool, drop_p: float,
                tail: bool, interpret: bool):
    if tail:
        tsc_ref, tsh_ref = rest[0], rest[1]
        rest = rest[2:]
        tail_refs = (tsc_ref[0], tsh_ref[0])
    else:
        tail_refs = None
    go_ref = rest[0]
    dx_ref, dpe_ref, dwin_ref, dbin_ref, du_ref, dcs_ref = rest[1:7]
    if tail:
        dtsc_ref, dtsh_ref = rest[7], rest[8]
    t, r, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cdt = jnp.float32 if exact else x_ref.dtype
    g = n_head
    d_model = win_ref.shape[1]
    i, j = pl.program_id(0), pl.program_id(1)
    sg_c = _grouping(c, g)
    sg_d = _grouping(d_model, g)

    xf, xhat, inv_big, h, h2 = _embed_block(
        x_ref[0], mask_ref[0], win_ref, bin_ref, pe_ref,
        g=g, eps=eps, exact=exact, cdt=cdt, tail=tail_refs)
    a = _attn_weights(xhat, pe_ref, mask_ref[0], win_ref, bin_ref, u_ref,
                      cs_ref, t=t, r=r, g=g, exact=exact, cdt=cdt)
    if drop_p > 0.0:
        keep_sc = _keep_mask(seed_ref, drop_p, a.shape,
                             interpret) / (1.0 - drop_p)
        a_d = a * keep_sc
    else:
        keep_sc = None
        a_d = a

    go = go_ref[0].astype(jnp.float32)                           # (R, D)
    hf = h.reshape(t, r, d_model).astype(jnp.float32)

    # dL/da (post-dropout chain): p1[t,r,g] = sum_{d in g} go[r,d] h[t,r,d]
    prod = (go[None] * hf).reshape(t * r, d_model)
    p1 = _mm(prod, sg_d, exact).reshape(t, r, g)
    da = p1 * keep_sc if keep_sc is not None else p1
    # softmax jacobian over T (a of MASKED rows is ~0 -> ds ~0 there)
    ds = a * (da - jnp.sum(a * da, axis=0, keepdims=True))       # (T, R, G)

    ds2 = ds.reshape(t * r, g)
    # dh = ds @ U^T (score path) + a_d_big * go (value path)
    abig = _mm(a_d.reshape(t * r, g), sg_d.T, exact)             # (T*R, D)
    dh = (_mm(ds2, u_ref[:].astype(jnp.float32).T, exact)
          + abig * jnp.broadcast_to(go[None], (t, r, d_model)
                                    ).reshape(t * r, d_model))    # f32

    # --- parameter/PE grads (accumulated across grid steps in VMEM) --------
    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_global():
        dwin_ref[:] = jnp.zeros_like(dwin_ref)
        dbin_ref[:] = jnp.zeros_like(dbin_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        dcs_ref[:] = jnp.zeros_like(dcs_ref)

    @pl.when(j == 0)
    def _init_pe():
        dpe_ref[:] = jnp.zeros_like(dpe_ref)

    du_ref[:] += _mm(h2.astype(jnp.float32).T, ds2, exact)       # (D, G)
    dcs_ref[:] += jnp.sum(ds2, axis=0, keepdims=True)            # (1, G)
    dbin_ref[:] += jnp.sum(dh, axis=0, keepdims=True)            # (1, D)
    dpe_ref[0] += jnp.sum(dh.reshape(t, r, d_model), axis=1)     # (T, D)
    dwin_ref[:] += _mm(xhat.reshape(t * r, c).astype(cdt).T,
                       dh.astype(cdt), exact)                    # (C, D)

    # --- GroupNorm backward -------------------------------------------------
    dxhat = _mm(dh.astype(cdt), win_ref[:].astype(cdt).T,
                exact).reshape(t, r, c)                          # f32
    n = float(t * (c // g))
    m1 = _mm(jnp.sum(dxhat, axis=0), sg_c, exact) / n            # (R, G)
    m2 = _mm(jnp.sum(dxhat * xhat, axis=0), sg_c, exact) / n     # (R, G)
    corr = (dxhat - _mm(m1, sg_c.T, exact)[None]
            - xhat * _mm(m2, sg_c.T, exact)[None])
    dxf = corr * inv_big[None]                                   # (T, R, C)
    if not tail:
        dx_ref[0] = dxf.astype(dx_ref.dtype)
        return
    # --- deferred conv-tail backward ---------------------------------------
    # xf = max(z*tsc+tsh, 0): dz = dxf*tsc*1[xf>0]; the per-(t, c) affine
    # grads sum over the block's rows and accumulate across grid steps like
    # dpe (xf>0 == pre>0 except at pre==0 where the subgradient is 0 anyway).
    relu_m = (xf > 0.0).astype(jnp.float32)                      # (T, R, C)
    live = dxf * relu_m
    tsc, _ = tail_refs
    dx_ref[0] = (live * tsc[:, None, :]).astype(dx_ref.dtype)

    @pl.when(j == 0)
    def _init_tail():
        dtsc_ref[:] = jnp.zeros_like(dtsc_ref)
        dtsh_ref[:] = jnp.zeros_like(dtsh_ref)

    zf = x_ref[0].astype(jnp.float32)
    dtsc_ref[0] += jnp.sum(live * zf, axis=1)                    # (T, C)
    dtsh_ref[0] += jnp.sum(live, axis=1)                         # (T, C)


def _vmem_kw(interpret: bool) -> dict:
    """256-row packed blocks hold ~72 MB of live fp32 temporaries in the
    backward kernel — far above the 16 MB default scoped-VMEM limit (v5e has
    128 MB physical VMEM; 110 MB compiles and runs; the kernels serialize
    their own DMA so double-buffering headroom is not needed)."""
    if interpret:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024)}


def _interpret_default() -> bool:
    dev = jax.config.jax_default_device or jax.devices()[0]
    return getattr(dev, "platform", "cpu") not in ("tpu", "axon")


def _bd2(a: jax.Array) -> jax.Array:
    """Block-diag [[a, 0], [0, a]] (lane-packing weight transform)."""
    z = jnp.zeros_like(a)
    return jnp.concatenate([jnp.concatenate([a, z], 1),
                            jnp.concatenate([z, a], 1)], 0)


def _pack_tables(pe, win_f, bin_f, u, cs):
    """Lane-packing weight transform: block-diagonalize every per-pixel
    weight / tile every per-head table so the kernels run the identical
    per-pixel math on (N/2, 2C) rows at full 128-lane width."""
    return (jnp.concatenate([pe, pe], axis=-1),
            _bd2(win_f), jnp.concatenate([bin_f] * 2), _bd2(u),
            jnp.concatenate([cs, cs], axis=1))


def _pack2(x, pe, win_f, bin_f, u, cs):
    """Pack 2 pixels per lane row (see ops/ltae_pallas.py v3.1 note): view
    x (B, T, N, C) as (B, T, N/2, 2C) — a free reinterpret — and transform
    the weights via _pack_tables (C=64 on lanes leaves bf16 tiles
    half-empty: ~1.45x measured).
    """
    b, t, n, c = x.shape
    return (x.reshape(b, t, n // 2, 2 * c),) + _pack_tables(
        pe, win_f, bin_f, u, cs)


def _pick_block(n: int, want: int) -> int:
    r = min(want, n)
    while n % r:
        r //= 2
    return r


def _block_want(exact: bool, pack: bool) -> int:
    """Row-block size shared by the fwd and bwd kernels. MUST be identical
    in both directions: the attention-dropout keep bits are reproduced in
    backward from (seed, grid position, block shape) — a different block
    split would change the bits. 256 packed rows (512 pixels) quadruple the
    per-T contiguous DMA chunk vs the old 64: measured on the flagship
    train shape (B=16, T=61, N=16k, v5e) fwd 27.8 -> 24.0 ms and fwd+bwd
    60.9 -> 58.1 ms standalone, 273 -> 270 ms on the full TimeUNet step;
    the ~72 MB of live bwd fp32 temporaries need the 110 MB VMEM cap
    (_vmem_kw). The unpacked fallback (odd/small N) keeps 128 rows — the
    same bytes per block, unmeasured beyond that."""
    if exact:
        return 16 if pack else 32
    return 256 if pack else 128


def _specs(b, t, n, r, c, d_model, g):
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    def vec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, t, r, c), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d_model), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, 1), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        vec(), vec(), vec(), vec(),
    ]
    return seed_spec, in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def ltae_pool(x, pe, pad_mask, win_f, bin_f, u, cs, seed,
              n_head: int = 16, drop_p: float = 0.0,
              interpret: Optional[bool] = None):
    """Fused masked-attention pooling o = sum_t softmax(h U + cs) h with
    h = GN(x) @ win_f + bin_f + pe, differentiable via fused Pallas kernels.

    x: TIME-MAJOR (B, T, N, C); pe: (B, T, D) fp32; pad_mask: (B, T) bool;
    win_f: (C, D) with the GN affine folded in; u: (D, G) with the learnable
    query folded into the key projection; cs: (1, G); seed: int32 array (1,)
    dropout seed (a traced input — a fresh per-step seed must not trigger a
    recompile).
    Returns o: (B, N, D) in x.dtype. All folds are plain jnp outside, so
    grads flow to the raw module parameters by the chain rule.
    """
    o, _ = _ltae_pool_fwd(x, pe, pad_mask, win_f, bin_f, u, cs, seed,
                          n_head, drop_p, interpret)
    return o


def _prep_pack(x, pe, win_f, bin_f, u, cs, n_head, tail, packed_input):
    """Shared fwd/bwd packing prep. Returns (x, pe, win_f, bin_f, u, cs,
    tail, n_head_eff, pack, n, c, n_orig, d_orig) with x/tail in the layout
    the kernels consume.

    packed_input: x (and tail) ALREADY arrive lane-packed as (B, T, N/2, 2C)
    from a pair-conv producer (nn/layers.py packed_tail) — only the weights
    are transformed; no HBM relayout of the big tensor.
    """
    b, t, n, c = x.shape
    d_orig = win_f.shape[1]
    if packed_input:
        n_orig = 2 * n
        pe, win_f, bin_f, u, cs = _pack_tables(pe, win_f, bin_f, u, cs)
        return (x, pe, win_f, bin_f, u, cs, tail, 2 * n_head, True,
                n, c, n_orig, d_orig)
    n_orig = n
    pack = n % 2 == 0 and n >= 4
    if pack:
        x, pe, win_f, bin_f, u, cs = _pack2(x, pe, win_f, bin_f, u, cs)
        n, c = n // 2, 2 * c
        n_head *= 2
        if tail is not None:
            # both packed pixels share the per-(t, channel) affine
            tail = (jnp.concatenate([tail[0]] * 2, axis=-1),
                    jnp.concatenate([tail[1]] * 2, axis=-1))
    return (x, pe, win_f, bin_f, u, cs, tail, n_head, pack,
            n, c, n_orig, d_orig)


def _tail_spec(t, c):
    return pl.BlockSpec((1, t, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _run_fwd(x, pe, mask_f, win_f, bin_f, u, cs, seed, n_head, drop_p,
             interpret, exact, tail=None, packed_input=False):
    b, t = x.shape[:2]
    (x, pe, win_f, bin_f, u, cs, tail, n_head, pack,
     n, c, n_orig, d_orig) = _prep_pack(
        x, pe, win_f, bin_f, u, cs, n_head, tail, packed_input)
    d_model = win_f.shape[1]
    r = _pick_block(n, _block_want(exact, pack))
    seed_spec, in_specs = _specs(b, t, n, r, c, d_model, n_head)
    inputs = [jnp.asarray(seed, jnp.int32).reshape(1), x,
              pe.astype(jnp.float32), mask_f, win_f,
              bin_f.astype(jnp.float32), u.astype(jnp.float32),
              cs.astype(jnp.float32)]
    if tail is not None:
        in_specs += [_tail_spec(t, c)] * 2
        inputs += [tail[0].astype(jnp.float32), tail[1].astype(jnp.float32)]
    kernel = functools.partial(_fwd_kernel, n_head=n_head, eps=1e-5,
                               exact=exact, drop_p=drop_p,
                               tail=tail is not None, interpret=interpret)
    o = pl.pallas_call(
        kernel,
        grid=(b, n // r),
        in_specs=[seed_spec] + in_specs,
        out_specs=pl.BlockSpec((1, r, d_model), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d_model), x.dtype),
        interpret=interpret,
        **_vmem_kw(interpret),
    )(*inputs)
    # (B, N/2, 2D) is the same memory as (B, N, D): free reinterpret back
    return o.reshape(b, n_orig, d_orig)


def _ltae_pool_fwd(x, pe, pad_mask, win_f, bin_f, u, cs, seed,
                   n_head, drop_p, interpret):
    if interpret is None:
        interpret = _interpret_default()
    exact = x.dtype == jnp.float32
    mask_f = pad_mask.astype(jnp.float32)[:, :, None]            # (B, T, 1)
    o = _run_fwd(x, pe, mask_f, win_f, bin_f, u, cs, seed, n_head, drop_p,
                 interpret, exact)
    return o, (x, pe, mask_f, win_f, bin_f, u, cs, seed)


def _run_bwd(res, go, n_head, drop_p, interpret, tail=None,
             packed_input=False):
    x, pe, mask_f, win_f, bin_f, u, cs, seed = res
    if interpret is None:
        interpret = _interpret_default()
    exact = x.dtype == jnp.float32
    b, t = x.shape[:2]
    c_in, g_orig = x.shape[3], n_head
    (x, pe, win_f, bin_f, u, cs, tail, n_head, pack,
     n, c, n_orig, d_orig) = _prep_pack(
        x, pe, win_f, bin_f, u, cs, n_head, tail, packed_input)
    if pack and not packed_input:
        go = go.reshape(b, n, 2 * d_orig)  # free reinterpret
    d_model = win_f.shape[1]
    r = _pick_block(n, _block_want(exact, pack))
    seed_spec, in_specs = _specs(b, t, n, r, c, d_model, n_head)
    inputs = [jnp.asarray(seed, jnp.int32).reshape(1), x,
              pe.astype(jnp.float32), mask_f, win_f,
              bin_f.astype(jnp.float32), u.astype(jnp.float32),
              cs.astype(jnp.float32)]
    if tail is not None:
        in_specs += [_tail_spec(t, c)] * 2
        inputs += [tail[0].astype(jnp.float32), tail[1].astype(jnp.float32)]
    in_specs.append(pl.BlockSpec((1, r, d_model), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM))
    inputs.append(go)
    kernel = functools.partial(_bwd_kernel, n_head=n_head, eps=1e-5,
                               exact=exact, drop_p=drop_p,
                               tail=tail is not None, interpret=interpret)
    out_specs = [
        pl.BlockSpec((1, t, r, c), lambda i, j: (i, 0, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, d_model), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, d_model), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_model), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((d_model, n_head), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_head), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct(x.shape, x.dtype),
        jax.ShapeDtypeStruct((b, t, d_model), jnp.float32),
        jax.ShapeDtypeStruct((c, d_model), jnp.float32),
        jax.ShapeDtypeStruct((1, d_model), jnp.float32),
        jax.ShapeDtypeStruct((d_model, n_head), jnp.float32),
        jax.ShapeDtypeStruct((1, n_head), jnp.float32),
    ]
    if tail is not None:
        out_specs += [_tail_spec(t, c)] * 2
        out_shape += [jax.ShapeDtypeStruct((b, t, c), jnp.float32)] * 2
    res_out = pl.pallas_call(
        kernel,
        grid=(b, n // r),
        in_specs=[seed_spec] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **_vmem_kw(interpret),
    )(*inputs)
    dx, dpe, dwin, dbin, du, dcs = res_out[:6]
    dtail = res_out[6:8] if tail is not None else None
    if pack and not packed_input:
        # unpack the gradients: the packing map is linear (block-diag embed
        # of weights, channel-duplicate of pe/bias), so its transpose sums
        # each parameter's two diagonal blocks / halves; the off-diagonal
        # cross-pixel blocks belong to constructed zeros and are dropped.
        d, g = d_orig, g_orig
        dx = dx.reshape(b, t, n_orig, c_in)            # free reinterpret
        dpe = dpe[:, :, :d] + dpe[:, :, d:]
        dwin = dwin[:c_in, :d] + dwin[c_in:, d:]
        dbin = dbin[:, :d] + dbin[:, d:]
        du = du[:d, :g] + du[d:, g:]
        dcs = dcs[:, :g] + dcs[:, g:]
        if dtail is not None:
            dtail = (dtail[0][:, :, :c_in] + dtail[0][:, :, c_in:],
                     dtail[1][:, :, :c_in] + dtail[1][:, :, c_in:])
    elif packed_input:
        # weights were passed UNPACKED by the caller: fold their packed
        # grads back; dx/dtail keep the caller's packed layout.
        d, g = d_orig, g_orig
        dpe = dpe[:, :, :d] + dpe[:, :, d:]
        dwin = dwin[:c_in // 2, :d] + dwin[c_in // 2:, d:]
        dbin = dbin[:, :d] + dbin[:, d:]
        du = du[:d, :g] + du[d:, g:]
        dcs = dcs[:, :g] + dcs[:, g:]
    return dx, dpe, dwin, dbin, du, dcs, dtail


def _ltae_pool_bwd(n_head, drop_p, interpret, res, go):
    x, pe, mask_f, win_f, bin_f, u, cs, seed = res
    dx, dpe, dwin, dbin, du, dcs, _ = _run_bwd(res, go, n_head, drop_p,
                                               interpret)
    return (dx, dpe.astype(pe.dtype), None, dwin.astype(win_f.dtype),
            dbin[0].astype(bin_f.dtype), du.astype(u.dtype),
            dcs.astype(cs.dtype), None)


ltae_pool.defvjp(_ltae_pool_fwd, _ltae_pool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def ltae_pool_tail(x, tsc, tsh, pe, pad_mask, win_f, bin_f, u, cs, seed,
                   n_head: int = 16, drop_p: float = 0.0,
                   interpret: Optional[bool] = None,
                   packed_input: bool = False):
    """``ltae_pool`` with the producing conv tail's GroupNorm DEFERRED into
    the kernels: the input x is the RAW pair-conv output z and the kernels
    apply xf = max(z*tsc+tsh, 0) in VMEM right after the block DMA — the
    normalized copy is never materialized in HBM, in either direction
    (the backward kernel emits dz plus the (B, T, C) affine grads fused).

    tsc/tsh: (B, T, C_x) f32 with C_x = x's LAST dim as passed — the
    per-frame GroupNorm affine from nn/layers.py ``defer_tail_norm`` (pad
    frames folded in as zeroed rows; see models/timeunet.py). Their grads
    flow back to the producer's stats/params by XLA autodiff outside.

    packed_input: x arrives LANE-PACKED as (B, T, N/2, 2C) straight from the
    pair conv — no relayout anywhere on the training path.
    """
    o, _ = _ltae_pool_tail_fwd(x, tsc, tsh, pe, pad_mask, win_f, bin_f, u,
                               cs, seed, n_head, drop_p, interpret,
                               packed_input)
    return o


def _ltae_pool_tail_fwd(x, tsc, tsh, pe, pad_mask, win_f, bin_f, u, cs,
                        seed, n_head, drop_p, interpret, packed_input):
    if interpret is None:
        interpret = _interpret_default()
    exact = x.dtype == jnp.float32
    mask_f = pad_mask.astype(jnp.float32)[:, :, None]            # (B, T, 1)
    o = _run_fwd(x, pe, mask_f, win_f, bin_f, u, cs, seed, n_head, drop_p,
                 interpret, exact, tail=(tsc, tsh),
                 packed_input=packed_input)
    return o, (x, tsc, tsh, pe, mask_f, win_f, bin_f, u, cs, seed)


def _ltae_pool_tail_bwd(n_head, drop_p, interpret, packed_input, res, go):
    x, tsc, tsh, pe, mask_f, win_f, bin_f, u, cs, seed = res
    if packed_input:
        b, t, n2, c2 = x.shape
        go = go.reshape(b, n2, 2 * win_f.shape[1])     # free reinterpret
    dx, dpe, dwin, dbin, du, dcs, dtail = _run_bwd(
        (x, pe, mask_f, win_f, bin_f, u, cs, seed), go, n_head, drop_p,
        interpret, tail=(tsc, tsh), packed_input=packed_input)
    return (dx, dtail[0].astype(tsc.dtype), dtail[1].astype(tsh.dtype),
            dpe.astype(pe.dtype), None, dwin.astype(win_f.dtype),
            dbin[0].astype(bin_f.dtype), du.astype(u.dtype),
            dcs.astype(cs.dtype), None)


ltae_pool_tail.defvjp(_ltae_pool_tail_fwd, _ltae_pool_tail_bwd)


def ltae_pool_reference(x, pe, pad_mask, win_f, bin_f, u, cs,
                        n_head: int = 16):
    """Pure-XLA oracle of the same math (no dropout) for grad-parity tests."""
    b, t, n, c = x.shape
    g = n_head
    cg = c // g
    xf = x.astype(jnp.float32).reshape(b, t, n, g, cg)
    mean = jnp.mean(xf, axis=(1, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 4), keepdims=True)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, t, n, c)
    h = (xhat.astype(x.dtype) @ win_f + bin_f
         + pe[:, :, None, :].astype(x.dtype)).astype(jnp.float32)
    s = jnp.einsum("btnd,dg->btng", h, u.astype(jnp.float32)) + cs[None, None]
    s = jnp.where(pad_mask[:, :, None, None], -1e6, s)
    a = jax.nn.softmax(s, axis=1)                                # (B,T,N,G)
    d_model = win_f.shape[1]
    dv = d_model // g
    hv = h.reshape(b, t, n, g, dv)
    o = jnp.einsum("btng,btngd->bngd", a, hv).reshape(b, n, d_model)
    return o.astype(x.dtype)
