"""Masked lightweight temporal attention encoders (L-TAE family).

TPU-native re-design of /root/reference/src/backbones/tae.py:349-635 and the
lightweight attention at :738-847. Math (per pixel row, T steps, C channels):

    h   = GroupNorm_{n_head}(x)                       # over (C/G, T) jointly
    h   = W_in h                                      # 1x1 proj C -> d_model
    h   = h + PE(dates)                               # broadcast over pixels
    K   = W_k h        (n_head, d_k per head)         # keys only
    V   = h split into n_head contiguous channel groups
    A   = softmax_T( Q K^T / sqrt(d_k)  masked -1e6 at pads )   # Q learnable
    o   = A V  -> concat heads -> MLP(d_model->d_out) + BN + ReLU + Dropout
    out = GroupNorm_{n_head}(o)

Layouts are TPU-first: features last, attention runs over the flattened
(B, H, W) row axis which shards embarrassingly across a device mesh. The
returned attention mask layout is (B, H, W, head, T) (use
``attn_to_torch_layout`` for the reference's head x B x T x H x W).

GroupNorm statistics intentionally include padded timesteps, exactly like the
reference (torch GroupNorm over (C/G, T) at tae.py:461 sees zero pad frames);
bit-parity therefore holds whenever the padded T matches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from crop2seg_tpu.nn.positional import AbsolutePositionalEncoder, PositionalEncoder


def attn_to_torch_layout(attn: jax.Array) -> jax.Array:
    """(B, H, W, head, T) -> (head, B, T, H, W) (reference tae.py:491-493)."""
    return jnp.transpose(attn, (3, 0, 4, 1, 2))


def _group_norm_over_time(x: jax.Array, n_groups: int, scale: jax.Array,
                          bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over joint (T, C/G) per pixel row, torch GroupNorm((N,C,T)).

    x: (..., T, C). Statistics in fp32; the big elementwise normalize stays
    in x.dtype via a fused scale/shift (no fp32 materialization of x-sized
    intermediates — the model is HBM-bound).
    """
    t, c = x.shape[-2], x.shape[-1]
    sdt = jnp.promote_types(x.dtype, jnp.float32)  # f32 stats (f64 under x64)
    g = x.reshape(x.shape[:-2] + (t, n_groups, c // n_groups))
    mean = jnp.mean(g.astype(sdt), axis=(-3, -1), keepdims=True)
    var = jnp.mean(jnp.square(g.astype(sdt) - mean), axis=(-3, -1),
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    sc = scale.reshape(n_groups, c // n_groups) * inv
    sh = bias.reshape(n_groups, c // n_groups) - mean * sc
    y = g.astype(sdt) * sc + sh
    return y.reshape(x.shape).astype(x.dtype)


def _group_norm_btc(x: jax.Array, n_groups: int, scale: jax.Array,
                    bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Same GroupNorm but on the natural (B, T, H, W, C) layout — stats over
    (T, C/G) per pixel without transposing the big tensor."""
    b, t, h, w, c = x.shape
    sdt = jnp.promote_types(x.dtype, jnp.float32)
    g = x.reshape(b, t, h, w, n_groups, c // n_groups)
    g32 = g.astype(sdt)
    mean = jnp.mean(g32, axis=(1, 5), keepdims=True)
    var = jnp.mean(jnp.square(g32 - mean), axis=(1, 5), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    sc = scale.reshape(1, 1, 1, 1, n_groups, c // n_groups) * inv
    sh = bias.reshape(1, 1, 1, 1, n_groups, c // n_groups) - mean * sc
    y = g32 * sc + sh
    return y.reshape(x.shape).astype(x.dtype)


class MaskedLightweightAttention(nn.Module):
    """Learnable-query masked attention (reference tae.py:738-847).

    Input h: (B, H, W, T, d_model); pad_mask: (B, T) True at pads.
    Returns (out, attn): out (B, H, W, nq, d_model), attn (B, H, W, head, nq, T).
    """

    n_head: int = 16
    d_k: int = 4
    num_queries: int = 1
    attn_dropout: float = 0.1
    # time_major=True takes h as (B, T, H, W, d): the attention einsums
    # contract the big tensor in its natural layout instead of transposing
    # ~GBs of activations (the model is HBM-bound); only the small
    # scores/attn tensors carry the permutation.
    time_major: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, h: jax.Array, pad_mask: jax.Array | None = None,
                 train: bool = False):
        d_model = h.shape[-1]
        d_v = d_model // self.n_head
        q = self.param(
            "query",
            nn.initializers.normal(stddev=float(np.sqrt(2.0 / self.d_k))),
            (self.n_head, self.num_queries, self.d_k), jnp.float32,
        )
        k = nn.Dense(
            self.n_head * self.d_k, name="fc1_k", dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=float(np.sqrt(2.0 / self.d_k))),
        )(h)
        k = k.reshape(k.shape[:-1] + (self.n_head, self.d_k))
        h_pat = "btxygd" if self.time_major else "bxytgd"

        scores = jnp.einsum(f"gqd,{h_pat}->bxygqt", q.astype(k.dtype), k)
        scores = scores / jnp.asarray(np.sqrt(self.d_k), scores.dtype)
        if pad_mask is not None:
            scores = jnp.where(
                pad_mask[:, None, None, None, None, :],
                jnp.asarray(-1e6, scores.dtype), scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.attn_dropout, deterministic=not train,
                          name="attn_drop")(attn)

        v = h.reshape(h.shape[:-1] + (self.n_head, d_v))
        out = jnp.einsum(f"bxygqt,{h_pat}->bxyqgd", attn, v)
        out = out.reshape(out.shape[:-2] + (d_model,))  # concat heads (head-major)
        return out, attn


class LTAE(nn.Module):
    """Full lightweight temporal attention encoder (reference tae.py:349-504).

    Call: x (B, T, H, W, C), batch_positions (B, T) or (B, T, 2),
    pad_mask (B, T) bool (True at pads). Returns (out, attn) with
    out (B, H, W, mlp[-1]) for num_queries=1, else (B, nq, H, W, mlp[-1]);
    attn (B, H, W, head, T), or (B, H, W, head, nq, T) for nq > 1.
    """

    in_channels: int = 128
    n_head: int = 16
    d_k: int = 4
    mlp: tuple = (256, 128)
    dropout: float = 0.2
    d_model: int | None = 256
    T: float = 1000.0
    positional_encoding: bool = True
    use_abs_rel_enc: bool = False
    use_doy: bool = False
    num_queries: int = 1
    add_linear: bool = False
    # Use the fused Pallas kernel (crop2seg_tpu.ops.ltae_pallas) on the
    # inference path (eval; any num_queries). Training keeps the XLA path.
    use_pallas: bool = False
    # Use the fused custom-VJP Pallas kernel pair (ops/ltae_pallas_train) on
    # the TRAINING path too (nq=1, masks not consumed): forward computes the
    # attention-pooled output with the (B*H*W, T, d_model) embed living only
    # in VMEM; backward recomputes it per block and emits every gradient in
    # one fused pass. The MLP/BatchNorm tail stays in XLA (train BatchNorm
    # needs cross-row statistics). Attention dropout runs on the on-core
    # PRNG, reproduced bit-exactly in backward from a per-step seed.
    use_pallas_train: bool = False
    # Stream the temporal axis in chunks of this many steps through a
    # rematerialized lax.scan with an online (flash-attention-style) softmax.
    # The (B*H*W, T, d_model) embed — an ~8 GB backward residual for
    # TimeUNet's full-resolution L-TAE at B=16 bf16 — is then never
    # materialized: peak memory drops to one chunk's embed plus small fp32
    # accumulators, making TimeUNet *trainable* on one chip (the reference
    # trains this model: timeunet.py:169-210 + train.py:327-328). Numerics
    # match the unchunked path (online softmax is exact; GroupNorm stats are
    # precomputed over the full T; BatchNorm still sees every pixel row).
    # Used when the attention masks are not consumed (TimeUNet discards
    # them); attn returns None.
    seq_chunk: int | None = None
    attn_dropout: float = 0.1
    dtype: jnp.dtype | None = None

    def setup(self):
        d_model = self.d_model if self.d_model is not None else self.in_channels
        assert self.mlp[0] == d_model
        if self.positional_encoding:
            # Encoder choice mirrors reference tae.py:406-423.
            if self.use_doy and not self.add_linear:
                self.positional_encoder = AbsolutePositionalEncoder(
                    d_model // self.n_head, repeat=self.n_head, dtype=self.dtype)
            else:
                self.positional_encoder = PositionalEncoder(
                    d_model // self.n_head, T=self.T, repeat=self.n_head,
                    add_linear=self.add_linear, dtype=self.dtype)
            if self.use_abs_rel_enc:
                self.positional_encoder_abs = AbsolutePositionalEncoder(
                    d_model // self.n_head, repeat=self.n_head, dtype=self.dtype)
        if self.d_model is not None:
            self.inconv = nn.Dense(self.d_model, dtype=self.dtype)
        self.in_scale = self.param("in_norm_scale", nn.initializers.ones,
                                   (self.in_channels,), jnp.float32)
        self.in_bias = self.param("in_norm_bias", nn.initializers.zeros,
                                  (self.in_channels,), jnp.float32)
        self.attention = MaskedLightweightAttention(
            n_head=self.n_head, d_k=self.d_k, num_queries=self.num_queries,
            attn_dropout=self.attn_dropout, time_major=True, dtype=self.dtype)
        self.mlp_dense = nn.Dense(self.mlp[1], dtype=self.dtype)
        self.mlp_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        self.out_scale = self.param("out_norm_scale", nn.initializers.ones,
                                    (self.mlp[-1],), jnp.float32)
        self.out_bias = self.param("out_norm_bias", nn.initializers.zeros,
                                   (self.mlp[-1],), jnp.float32)
        self.drop = nn.Dropout(self.dropout)

    def embed(self, x: jax.Array, batch_positions: jax.Array) -> jax.Array:
        """GroupNorm -> 1x1 proj -> +PE in the natural time-major layout.
        x: (B, T, H, W, C) -> (B, T, H, W, d_model)."""
        h = _group_norm_btc(x, self.n_head, self.in_scale, self.in_bias)
        if self.d_model is not None:
            h = self.inconv(h)
        if self.positional_encoding:
            pe = self._pe(batch_positions)
            h = h + pe[:, :, None, None, :].astype(h.dtype)  # (B,T,1,1,d)
        return h

    def _pe(self, batch_positions: jax.Array) -> jax.Array:
        if self.use_abs_rel_enc:
            return (self.positional_encoder(batch_positions[..., 0])
                    + self.positional_encoder_abs(batch_positions[..., 1]))
        bp = batch_positions if batch_positions.ndim == 2 else batch_positions[..., 0]
        return self.positional_encoder(bp)

    def _fused(self, x: jax.Array, batch_positions: jax.Array,
               pad_mask: jax.Array | None, need_attn: bool = True,
               input_packed: bool = False, tail_affine=None):
        """Fused Pallas path (eval); x: (B, T, H, W, C). The kernel
        takes the time-major layout directly — no HBM transpose.

        input_packed: x arrives LANE-PACKED as (B, T, H, W/2, 2C) from a
        pair-conv producer (nn/layers.py packed_tail) — two adjacent-W
        pixels per lane row; the kernel then runs its packed pipeline with
        full 128-lane DMA (ops/ltae_pallas.py v3.1 note).

        tail_affine: optional (sc, sh) of (B, T, 2C) — the producer conv
        tail's DEFERRED GroupNorm(+pad-mask) affine; the kernel applies
        max(x*sc+sh, 0) in VMEM (ops/ltae_pallas.py tail_affine)."""
        from crop2seg_tpu.ops.ltae_pallas import (
            fold_batchnorm, ltae_fused_forward)

        b, t, hh, w_in, c_in = x.shape
        ww, c = (2 * w_in, c_in // 2) if input_packed else (w_in, c_in)
        pe = self._pe(batch_positions) if self.positional_encoding else \
            jnp.zeros((b, t, self.d_model or c), x.dtype)
        wm = self.mlp_dense.variables["params"]["kernel"]
        bm = self.mlp_dense.variables["params"]["bias"]
        bn_p = self.mlp_bn.variables["params"]
        bn_s = self.mlp_bn.variables["batch_stats"]
        wm, bm = fold_batchnorm(wm, bm, bn_p["scale"], bn_p["bias"],
                                bn_s["mean"], bn_s["var"])
        att_p = self.attention.variables["params"]
        params = {
            "in_scale": self.in_scale, "in_bias": self.in_bias,
            "win": self.inconv.variables["params"]["kernel"],
            "bin": self.inconv.variables["params"]["bias"],
            "wk": att_p["fc1_k"]["kernel"], "bk": att_p["fc1_k"]["bias"],
            "q": att_p["query"],                    # (n_head, nq, d_k)
            "wm_folded": wm, "bm_folded": bm,
            "out_scale": self.out_scale, "out_bias": self.out_bias,
        }
        if pad_mask is None:
            pad_mask = jnp.zeros((b, t), bool)
        rows = x.reshape(b, t, hh * w_in, c_in)
        out, attn = ltae_fused_forward(
            rows, pe, pad_mask, params,
            n_head=self.n_head, d_k=self.d_k, need_attn=need_attn,
            packed_input=input_packed, tail_affine=tail_affine)
        if self.num_queries > 1:
            # rank-extended returns, same as the XLA path (ref tae.py:490-499)
            out = jnp.transpose(out.reshape(b, hh, ww, self.num_queries, -1),
                                (0, 3, 1, 2, 4))    # (B, nq, H, W, d)
            return out, (None if attn is None else attn.reshape(
                b, hh, ww, self.n_head, self.num_queries, t))
        return (out.reshape(b, hh, ww, -1),
                None if attn is None
                else attn.reshape(b, hh, ww, self.n_head, t))

    def _fused_train(self, x: jax.Array, batch_positions: jax.Array | None,
                     pad_mask: jax.Array | None, train: bool,
                     input_packed: bool = False, tail_affine=None):
        """Training path through the custom-VJP kernel pair
        (ops/ltae_pallas_train.ltae_pool / ltae_pool_tail). The parameter
        folds below are plain jnp, so gradients reach the raw module
        parameters by the chain rule; the XLA _mlp_tail handles
        MLP/BN/dropout/out-GN.

        input_packed: x is LANE-PACKED (B, T, H, W/2, 2C) straight from the
        pair-conv producer; tail_affine: (sc, sh) of (B, T, 2C) — that
        producer's deferred GroupNorm affine, applied in-kernel with its
        grads emitted fused (ops/ltae_pallas_train.ltae_pool_tail)."""
        from crop2seg_tpu.ops.ltae_pallas_train import (
            ltae_pool, ltae_pool_tail)

        b, t, hh, ww, c = x.shape
        if input_packed:
            ww, c = 2 * ww, c // 2  # logical pixels / true channels
        d_model = self.d_model
        pe = (self._pe(batch_positions) if self.positional_encoding
              else jnp.zeros((b, t, d_model), jnp.float32))
        win = self.inconv.variables["params"]["kernel"]
        b_in = self.inconv.variables["params"]["bias"]
        win_f = win * self.in_scale[:, None]
        bin_f = b_in + self.in_bias @ win
        att_p = self.attention.variables["params"]
        wk = att_p["fc1_k"]["kernel"].reshape(d_model, self.n_head, self.d_k)
        q = att_p["query"][:, 0, :]
        u = jnp.einsum("dgk,gk->dg", wk, q) / np.sqrt(self.d_k)
        cs = (jnp.einsum("gk,gk->g",
                         att_p["fc1_k"]["bias"].reshape(self.n_head, self.d_k),
                         q) / np.sqrt(self.d_k))[None, :]
        if pad_mask is None:
            pad_mask = jnp.zeros((b, t), bool)
        if train and self.attn_dropout > 0.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            drop_p = float(self.attn_dropout)
        else:
            seed = jnp.zeros((1,), jnp.int32)
            drop_p = 0.0
        if tail_affine is not None:
            assert input_packed, "tail_affine requires the packed producer"
            rows = x.reshape(b, t, hh * ww // 2, 2 * c)
            o = ltae_pool_tail(rows, tail_affine[0], tail_affine[1], pe,
                               pad_mask, win_f, bin_f, u, cs, seed,
                               n_head=self.n_head, drop_p=drop_p,
                               packed_input=True)
        else:
            assert not input_packed, (
                "packed input without tail_affine is unsupported on the "
                "train path (the producer always defers its tail norm)")
            o = ltae_pool(x.reshape(b, t, hh * ww, c), pe, pad_mask,
                          win_f, bin_f, u, cs, seed,
                          n_head=self.n_head, drop_p=drop_p)
        out = o.reshape(b, hh, ww, d_model)
        out = self._mlp_tail(out[:, :, :, None, :], train)
        return out[:, :, :, 0, :], None

    def _mlp_tail(self, out: jax.Array, train: bool) -> jax.Array:
        """MLP -> BN -> ReLU -> Dropout -> out GroupNorm on (B, H, W, nq, d)."""
        out = self.mlp_dense(out)
        out = self.mlp_bn(out, use_running_average=not train)
        out = nn.relu(out)
        out = self.drop(out, deterministic=not train)

        # out_norm: per pixel GroupNorm over (nq, C/G) — torch applies
        # GroupNorm to (N, C, nq) at tae.py:488.
        b, hh, ww, nq, c = out.shape
        o = out.reshape(b * hh * ww, nq, c)
        o = _group_norm_over_time(o, self.n_head, self.out_scale, self.out_bias)
        return o.reshape(b, hh, ww, nq, c)

    def _chunked(self, x: jax.Array, batch_positions: jax.Array | None,
                 pad_mask: jax.Array | None, train: bool):
        """Streaming T-chunk attention (see ``seq_chunk``). Exact math:

        - GroupNorm statistics are computed over the ORIGINAL T in a cheap
          fused reduction (small (B, H, W, G) stats; the reference's GN sees
          padded frames too, tae.py:461 — chunk padding to a multiple of
          seq_chunk is masked out of attention and excluded from stats).
        - Per chunk: normalize -> W_in -> +PE -> keys -> masked scores, then
          an online softmax (running max m, normalizer l, fp32 value
          accumulator) — identical to the full softmax up to fp association.
        - Attention dropout is applied to the normalized weights per chunk
          (reference drops AFTER softmax, tae.py:836-837: the normalizer l
          intentionally excludes dropout).
        - The scan body is jax.checkpoint'ed: backward recomputes one chunk's
          embed at a time.
        """
        b, t, hh, ww, c = x.shape
        G, dk = self.n_head, self.d_k
        d_model = self.d_model
        dv, cg = d_model // G, c // G
        wdt = self.dtype or x.dtype
        tc = int(self.seq_chunk)
        n_chunks = -(-t // tc)
        tp = n_chunks * tc

        if pad_mask is None:
            pad_mask = jnp.zeros((b, t), bool)

        # GroupNorm stats over the true T — op-for-op the _group_norm_btc
        # formula (keepdims f32 two-pass) so the chunked normalize is
        # bit-identical to the monolithic path
        sdt = jnp.promote_types(x.dtype, jnp.float32)
        g32 = x.reshape(b, t, hh, ww, G, cg).astype(sdt)
        mean = jnp.mean(g32, axis=(1, 5), keepdims=True)  # (b,1,hh,ww,G,1)
        var = jnp.mean(jnp.square(g32 - mean), axis=(1, 5), keepdims=True)
        inv = jax.lax.rsqrt(var + 1e-5)
        sc = self.in_scale.reshape(G, cg) * inv           # (b,1,hh,ww,G,cg)
        sh = self.in_bias.reshape(G, cg) - mean * sc

        pe = (self._pe(batch_positions) if self.positional_encoding
              else jnp.zeros((b, t, d_model), jnp.float32))

        # pad T to a chunk multiple; the extra frames are attention-masked
        x_p = jnp.pad(x, ((0, 0), (0, tp - t), (0, 0), (0, 0), (0, 0)))
        pe_p = jnp.pad(pe, ((0, 0), (0, tp - t), (0, 0)))
        mask_p = jnp.pad(pad_mask, ((0, 0), (0, tp - t)),
                         constant_values=True)

        xs_x = jnp.moveaxis(
            x_p.reshape(b, n_chunks, tc, hh, ww, c), 1, 0)
        xs_pe = jnp.moveaxis(pe_p.reshape(b, n_chunks, tc, d_model), 1, 0)
        xs_m = jnp.moveaxis(mask_p.reshape(b, n_chunks, tc), 1, 0)
        use_attn_drop = train and self.attn_dropout > 0.0
        if use_attn_drop:
            xs_key = jax.random.split(self.make_rng("dropout"), n_chunks)
        else:
            xs_key = jnp.zeros((n_chunks, 2), jnp.uint32)

        acc_dt = jnp.promote_types(wdt, jnp.float32)  # fp32 accumulators
        win = self.inconv.variables["params"]["kernel"].astype(wdt)
        b_in = self.inconv.variables["params"]["bias"].astype(wdt)
        att_p = self.attention.variables["params"]
        wk = att_p["fc1_k"]["kernel"].astype(wdt)
        bk = att_p["fc1_k"]["bias"].astype(wdt)
        q = att_p["query"][:, 0, :].astype(wdt)                 # (G, dk)
        scale = 1.0 / float(np.sqrt(dk))

        def body(carry, xs):
            m, l, acc = carry
            x_c, pe_c, mask_c, key_c = xs
            h = (x_c.reshape(b, tc, hh, ww, G, cg).astype(sdt)
                 * sc + sh).astype(wdt)
            h = h.reshape(b, tc, hh, ww, c)
            h = jnp.einsum("btxyc,cd->btxyd", h, win) + b_in
            h = h + pe_c[:, :, None, None, :].astype(wdt)
            k = (jnp.einsum("btxyd,de->btxye", h, wk) + bk).reshape(
                b, tc, hh, ww, G, dk)
            scores = jnp.einsum("gd,btxygd->bxygt", q, k,
                                preferred_element_type=acc_dt) * scale
            scores = jnp.where(mask_c[:, None, None, None, :],
                               jnp.asarray(-1e6, acc_dt), scores)
            m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
            corr = jnp.exp(m - m_new)
            w = jnp.exp(scores - m_new[..., None])              # (b,x,y,G,tc)
            l_new = l * corr + jnp.sum(w, axis=-1)
            if use_attn_drop:
                keep = jax.random.bernoulli(
                    key_c, 1.0 - self.attn_dropout, w.shape)
                wd = jnp.where(keep, w / (1.0 - self.attn_dropout), 0.0)
            else:
                wd = w
            v = h.reshape(b, tc, hh, ww, G, dv)
            pv = jnp.einsum("bxygt,btxygd->bxygd", wd.astype(wdt), v,
                            preferred_element_type=acc_dt)
            acc_new = acc * corr[..., None] + pv
            return (m_new, l_new, acc_new), None

        init = (jnp.full((b, hh, ww, G), -jnp.inf, acc_dt),
                jnp.zeros((b, hh, ww, G), acc_dt),
                jnp.zeros((b, hh, ww, G, dv), acc_dt))
        (m, l, acc), _ = jax.lax.scan(jax.checkpoint(body), init,
                                      (xs_x, xs_pe, xs_m, xs_key))
        out = (acc / l[..., None]).astype(wdt).reshape(b, hh, ww, d_model)
        out = self._mlp_tail(out[:, :, :, None, :], train)
        return out[:, :, :, 0, :], None

    def __call__(self, x: jax.Array, batch_positions: jax.Array | None = None,
                 pad_mask: jax.Array | None = None, train: bool = False,
                 need_attn: bool = True, input_packed: bool = False,
                 tail_affine=None):
        # x stays (B, T, H, W, C): attention contracts T in place.
        # need_attn=False lets the fused kernel skip writing the attention
        # masks (TimeUNet discards them; XLA DCEs the same work itself).
        # input_packed (lane-packed x from a pair-conv producer) and
        # tail_affine (that producer's deferred GroupNorm affine) are only
        # meaningful on the fused path; callers must mirror its gate.
        if (self.use_pallas and not train
                and self.d_model is not None and not self.is_initializing()):
            return self._fused(x, batch_positions, pad_mask,
                               need_attn=need_attn, input_packed=input_packed,
                               tail_affine=tail_affine)
        if (self.use_pallas_train and not need_attn and self.num_queries == 1
                and self.d_model is not None and not self.is_initializing()):
            return self._fused_train(x, batch_positions, pad_mask, train,
                                     input_packed=input_packed,
                                     tail_affine=tail_affine)
        assert not input_packed and tail_affine is None, (
            "input_packed/tail_affine require a fused path")
        if (self.seq_chunk and not need_attn and self.num_queries == 1
                and self.d_model is not None and not self.is_initializing()):
            return self._chunked(x, batch_positions, pad_mask, train)
        h = self.embed(x, batch_positions)
        out, attn = self.attention(h, pad_mask=pad_mask, train=train)
        out = self._mlp_tail(out, train)

        if self.num_queries == 1:
            return out[:, :, :, 0, :], attn[:, :, :, :, 0, :]
        return jnp.transpose(out, (0, 3, 1, 2, 4)), attn


class LTAE4WTAE(nn.Module):
    """L-TAE variant returning attention masks only (reference tae.py:507-635)."""

    in_channels: int = 128
    n_head: int = 16
    d_k: int = 4
    d_model: int | None = 256
    T: float = 1000.0
    positional_encoding: bool = True
    use_abs_rel_enc: bool = False
    use_doy: bool = False
    num_queries: int = 1
    add_linear: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions: jax.Array | None = None,
                 pad_mask: jax.Array | None = None, train: bool = False):
        # x stays (B, T, H, W, C) — see MaskedLightweightAttention.time_major
        in_scale = self.param("in_norm_scale", nn.initializers.ones,
                              (self.in_channels,), jnp.float32)
        in_bias = self.param("in_norm_bias", nn.initializers.zeros,
                             (self.in_channels,), jnp.float32)
        h = _group_norm_btc(x, self.n_head, in_scale, in_bias)
        d_model = self.d_model if self.d_model is not None else self.in_channels
        if self.d_model is not None:
            h = nn.Dense(self.d_model, dtype=self.dtype, name="inconv")(h)
        if self.positional_encoding:
            if self.use_doy and not self.add_linear:
                pe_mod = AbsolutePositionalEncoder(
                    d_model // self.n_head, repeat=self.n_head,
                    dtype=self.dtype, name="positional_encoder")
            else:
                pe_mod = PositionalEncoder(
                    d_model // self.n_head, T=self.T, repeat=self.n_head,
                    add_linear=self.add_linear, dtype=self.dtype,
                    name="positional_encoder")
            if self.use_abs_rel_enc:
                pe = pe_mod(batch_positions[..., 0])
                pe = pe + AbsolutePositionalEncoder(
                    d_model // self.n_head, repeat=self.n_head,
                    dtype=self.dtype, name="positional_encoder_abs"
                )(batch_positions[..., 1])
            else:
                bp = batch_positions if batch_positions.ndim == 2 else batch_positions[..., 0]
                pe = pe_mod(bp)
            h = h + pe[:, :, None, None, :].astype(h.dtype)
        _, attn = MaskedLightweightAttention(
            n_head=self.n_head, d_k=self.d_k, num_queries=self.num_queries,
            time_major=True, dtype=self.dtype, name="attention",
        )(h, pad_mask=pad_mask, train=train)
        if self.num_queries == 1:
            return attn[:, :, :, :, 0, :]
        return attn
