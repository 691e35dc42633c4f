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
    g = x.reshape(x.shape[:-2] + (t, n_groups, c // n_groups))
    mean = jnp.mean(g.astype(jnp.float32), axis=(-3, -1), keepdims=True)
    var = jnp.mean(jnp.square(g.astype(jnp.float32) - mean), axis=(-3, -1),
                   keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    sc = scale.reshape(n_groups, c // n_groups) * inv
    sh = bias.reshape(n_groups, c // n_groups) - mean * sc
    y = g.astype(jnp.float32) * sc + sh
    return y.reshape(x.shape).astype(x.dtype)


def _group_norm_btc(x: jax.Array, n_groups: int, scale: jax.Array,
                    bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Same GroupNorm but on the natural (B, T, H, W, C) layout — stats over
    (T, C/G) per pixel without transposing the big tensor."""
    b, t, h, w, c = x.shape
    g = x.reshape(b, t, h, w, n_groups, c // n_groups)
    g32 = g.astype(jnp.float32)
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
    # inference path (eval, num_queries=1). Training keeps the XLA path.
    use_pallas: bool = False
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
            time_major=True, dtype=self.dtype)
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
               pad_mask: jax.Array | None, need_attn: bool = True):
        """Fused Pallas path (eval, nq=1); x: (B, T, H, W, C). The kernel
        takes the time-major layout directly — no HBM transpose."""
        from crop2seg_tpu.ops.ltae_pallas import (
            fold_batchnorm, ltae_fused_forward)

        b, t, hh, ww, c = x.shape
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
            "q": att_p["query"][:, 0, :],
            "wm_folded": wm, "bm_folded": bm,
            "out_scale": self.out_scale, "out_bias": self.out_bias,
        }
        if pad_mask is None:
            pad_mask = jnp.zeros((b, t), bool)
        rows = x.reshape(b, t, hh * ww, c)
        out, attn = ltae_fused_forward(
            rows, pe, pad_mask, params,
            n_head=self.n_head, d_k=self.d_k, need_attn=need_attn)
        return (out.reshape(b, hh, ww, -1),
                None if attn is None
                else attn.reshape(b, hh, ww, self.n_head, t))

    def __call__(self, x: jax.Array, batch_positions: jax.Array | None = None,
                 pad_mask: jax.Array | None = None, train: bool = False,
                 need_attn: bool = True):
        # x stays (B, T, H, W, C): attention contracts T in place.
        # need_attn=False lets the fused kernel skip writing the attention
        # masks (TimeUNet discards them; XLA DCEs the same work itself).
        if (self.use_pallas and not train and self.num_queries == 1
                and self.d_model is not None and not self.is_initializing()):
            return self._fused(x, batch_positions, pad_mask,
                               need_attn=need_attn)
        h = self.embed(x, batch_positions)
        out, attn = self.attention(h, pad_mask=pad_mask, train=train)

        out = self.mlp_dense(out)
        out = self.mlp_bn(out, use_running_average=not train)
        out = nn.relu(out)
        out = self.drop(out, deterministic=not train)

        # out_norm: per pixel GroupNorm over (nq, C/G) — torch applies
        # GroupNorm to (N, C, nq) at tae.py:488.
        b, hh, ww, nq, c = out.shape
        o = out.reshape(b * hh * ww, nq, c)
        o = _group_norm_over_time(o, self.n_head, self.out_scale, self.out_bias)
        out = o.reshape(b, hh, ww, nq, c)

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
