"""TAE2d: generic temporal attention encoder (classical + lightweight).

Re-design of the reference's experimental TAE2d
(/root/reference/src/backbones/tae.py:14-346, @experimental) and its
classical multi-head attention (:638-711):

- ``ClassicalMultiHeadAttention``: self-attention with per-head q/k width
  d_hidden and per-head value width d_in (the reference's unusually wide
  values, :654-657), output projection, dropout, residual + LayerNorm.
- ``TAE2d``: GroupNorm -> 1x1 proj -> +PE -> [cls tokens] -> N attention
  stages -> embedding/attention reductions (mean | cls | linear) -> MLP ->
  GroupNorm.

Notes vs the reference: the reference's ``embedding_reduction=None`` path
feeds a (T, d) sequence through BatchNorm1d sized for channels and then
flattens T into channels before a conv (tae.py:330-334) — shape-inconsistent
except for special sizes; here the no-reduction path returns a proper
(B, T, H, W, C_out) sequence with the MLP applied per timestep.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from crop2seg_tpu.nn.ltae import MaskedLightweightAttention, _group_norm_over_time
from crop2seg_tpu.nn.positional import AbsolutePositionalEncoder, PositionalEncoder


def _adaptive_pool_matrix(t_in: int, t_out: int = 45) -> np.ndarray:
    """(t_in, t_out) averaging matrix with torch AdaptiveAvgPool1d window
    semantics: output i averages input [floor(i*t/o), ceil((i+1)*t/o))."""
    m = np.zeros((t_in, t_out), np.float32)
    for i in range(t_out):
        a = (i * t_in) // t_out
        b = -(-((i + 1) * t_in) // t_out)
        m[a:b, i] = 1.0 / (b - a)
    return m


class ClassicalMultiHeadAttention(nn.Module):
    """Full TxT self-attention (reference tae.py:638-711)."""

    n_head: int
    d_hidden: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, v: jax.Array, pad_mask: jax.Array | None = None,
                 train: bool = False):
        # v: (..., T, d_in); pad_mask broadcastable (..., T) True at pads
        d_in = v.shape[-1]
        residual = v
        q = nn.Dense(self.n_head * self.d_hidden, dtype=self.dtype,
                     name="fc_q")(v)
        k = nn.Dense(self.n_head * self.d_hidden, dtype=self.dtype,
                     name="fc_k")(v)
        val = nn.Dense(self.n_head * d_in, dtype=self.dtype, name="fc_v")(v)
        t = v.shape[-2]
        q = q.reshape(q.shape[:-1] + (self.n_head, self.d_hidden))
        k = k.reshape(k.shape[:-1] + (self.n_head, self.d_hidden))
        val = val.reshape(val.shape[:-1] + (self.n_head, d_in))
        scores = jnp.einsum("...qhd,...khd->...hqk", q, k)
        scores = scores / jnp.asarray(np.sqrt(self.d_hidden), scores.dtype)
        if pad_mask is not None:
            # pad_mask (B, T) -> broadcast over (..., head, T_q, T_k): insert
            # singleton axes for the non-batch leading dims + (head, q).
            extra = scores.ndim - 3 - pad_mask.ndim + 1
            m = pad_mask.reshape(
                pad_mask.shape[:1] + (1,) * extra + (1, 1)
                + pad_mask.shape[1:])
            scores = jnp.where(m, jnp.asarray(-1e6, scores.dtype), scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train,
                          name="attn_drop")(attn)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, val)
        out = out.reshape(out.shape[:-2] + (self.n_head * d_in,))
        out = nn.Dense(d_in, use_bias=False, dtype=self.dtype,
                       name="fc_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train,
                         name="out_drop")(out)
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                           name="layer_norm")(out + residual)
        return out, attn  # attn: (..., head, T, T)


class PositionwiseFeedForward(nn.Module):
    """Two-layer FFN with residual + LayerNorm (reference tae.py:714-735)."""

    d_hid: int
    dropout: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        h = nn.Dense(self.d_hid, dtype=self.dtype, name="w_1")(x)
        h = nn.Dense(d_in, dtype=self.dtype, name="w_2")(nn.relu(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(h + x)


class TAE2d(nn.Module):
    attention_type: str = "lightweight"
    embedding_reduction: Optional[str] = "mean"       # None | mean | cls | linear
    attention_mask_reduction: Optional[str] = "mean"  # None | mean | cls | linear
    num_attention_stages: int = 1
    num_cls_tokens: int = 1
    in_channels: int = 128
    n_head: int = 16
    d_k: int = 4
    mlp: Sequence[int] = (256, 128)
    dropout: float = 0.2
    d_model: int | None = 256
    T: float = 1000.0
    positional_encoding: bool = True
    use_abs_rel_enc: bool = False
    num_queries: int = 1
    add_linear: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions: jax.Array | None = None,
                 pad_mask: jax.Array | None = None, train: bool = False):
        """x: (B, T, H, W, C). Returns (out, attn):
        - lightweight / reduced: out (B, H, W, mlp[-1]), attn (B, H, W, head, T)
        - classical with no reduction: out (B, T, H, W, mlp[-1]),
          attn (B, H, W, head, T, T).
        """
        b, t, hh, ww, c = x.shape
        d_model = self.d_model if self.d_model is not None else c
        x = jnp.transpose(x, (0, 2, 3, 1, 4))  # (B, H, W, T, C)

        seq_len = t
        use_cls = self.attention_type == "classical" and (
            self.embedding_reduction == "cls"
            or self.attention_mask_reduction == "cls")
        if use_cls:
            # Learned SPATIAL cls tokens — (nct, H, W, C_in), prepended to
            # the raw sequence BEFORE in_norm/inconv with position -1 and
            # never padded (reference tae.py:176-187, 225-241: the token is
            # (nct, in_channels, cls_h, cls_w) and rides through the whole
            # front end; its stats join the GroupNorm rows).
            cls = self.param("cls_token", nn.initializers.normal(1.0),
                             (self.num_cls_tokens, hh, ww, c), jnp.float32)
            cls_b = jnp.broadcast_to(
                jnp.transpose(cls, (1, 2, 0, 3))[None],
                (b, hh, ww, self.num_cls_tokens, c))
            x = jnp.concatenate([cls_b.astype(x.dtype), x], axis=3)
            if pad_mask is not None:
                pad_mask = jnp.concatenate(
                    [jnp.zeros((b, self.num_cls_tokens), bool), pad_mask],
                    axis=1)
            if batch_positions is not None:
                minus1 = -jnp.ones(
                    (b, self.num_cls_tokens) + batch_positions.shape[2:],
                    batch_positions.dtype)
                batch_positions = jnp.concatenate(
                    [minus1, batch_positions], axis=1)
            seq_len = t + self.num_cls_tokens

        in_scale = self.param("in_norm_scale", nn.initializers.ones, (c,),
                              jnp.float32)
        in_bias = self.param("in_norm_bias", nn.initializers.zeros, (c,),
                             jnp.float32)
        h = _group_norm_over_time(x, self.n_head, in_scale, in_bias)
        if self.d_model is not None:
            h = nn.Dense(self.d_model, dtype=self.dtype, name="inconv")(h)
        if self.positional_encoding:
            pe_mod = PositionalEncoder(d_model // self.n_head, T=self.T,
                                       repeat=self.n_head,
                                       add_linear=self.add_linear,
                                       dtype=self.dtype,
                                       name="positional_encoder")
            if self.use_abs_rel_enc:
                pe = pe_mod(batch_positions[..., 0])
                pe = pe + AbsolutePositionalEncoder(
                    d_model // self.n_head, repeat=self.n_head,
                    dtype=self.dtype, name="positional_encoder_abs"
                )(batch_positions[..., 1])
            else:
                bp = batch_positions if batch_positions is None or \
                    batch_positions.ndim == 2 else batch_positions[..., 0]
                pe = pe_mod(bp)
            h = h + pe[:, None, None, :, :].astype(h.dtype)

        if self.attention_type == "lightweight":
            out, attn = MaskedLightweightAttention(
                n_head=self.n_head, d_k=self.d_k,
                num_queries=self.num_queries, dtype=self.dtype,
                name="attention")(h, pad_mask=pad_mask, train=train)
            # nq = 1 only: the reference concatenates n queries into
            # channels (tae.py:284-346), but its lightweight path is
            # unconstructable as shipped (BN1d crash, PARITY.md) so nq>1
            # has no oracle; shipped configs are all nq=1.
            out = out[:, :, :, 0, :]
            attn = attn[:, :, :, :, 0, :]              # (B,H,W,head,T)
        else:
            out = h
            for i in range(self.num_attention_stages):
                out, attn = ClassicalMultiHeadAttention(
                    n_head=self.n_head, d_hidden=self.d_k, dtype=self.dtype,
                    name=f"attention_{i}")(
                        out, pad_mask=pad_mask, train=train)
            # reductions (reference tae.py:284-327)
            nct = self.num_cls_tokens
            if self.embedding_reduction == "mean":
                out = jnp.mean(out, axis=3)
            elif self.embedding_reduction == "cls":
                tokens = out[:, :, :, :nct, :]          # (B, H, W, nct, C)
                if nct > 1:
                    # learned 1x1 merge of the cls tokens (reference
                    # cls_emb_conv, Conv1d(nct, 1, 1) — tae.py:187-189,311)
                    out = nn.Dense(1, dtype=self.dtype,
                                   name="cls_emb_conv")(
                        jnp.swapaxes(tokens, -1, -2))[..., 0]
                else:
                    out = tokens[..., 0, :]
            elif self.embedding_reduction == "linear":
                # AdaptiveAvgPool1d(45) over time + Linear(45, 1) —
                # reference linear_embedding_reduction (tae.py:173,284-287).
                # Exact adaptive-pool windows (floor/ceil boundaries), NOT a
                # linear resize.
                pool = jnp.asarray(
                    _adaptive_pool_matrix(out.shape[3]), out.dtype)
                pooled = jnp.einsum("bhwtc,tp->bhwpc", out, pool)
                out = nn.Dense(1, dtype=self.dtype, name="emb_reduce")(
                    jnp.swapaxes(pooled, -1, -2))[..., 0]
            if self.attention_mask_reduction == "mean":
                attn = jnp.mean(attn, axis=-2)          # avg over queries
            elif self.attention_mask_reduction == "cls":
                sel = attn[..., :nct, nct:]   # cls queries x real-time keys
                if nct > 1:
                    sel = nn.Dense(1, dtype=self.dtype,
                                   name="cls_attn_conv")(
                        jnp.swapaxes(sel, -1, -2))[..., 0]
                else:
                    sel = sel[..., 0, :]
                attn = sel
            elif self.attention_mask_reduction == "linear":
                # pool the QUERY axis to 45 + Linear(45, 1), keys kept —
                # reference linear_attention_mask_reduction (tae.py:175,
                # 303-307).
                pool = jnp.asarray(
                    _adaptive_pool_matrix(attn.shape[-2]), attn.dtype)
                pooled = jnp.einsum("...qk,qp->...pk", attn, pool)
                attn = nn.Dense(1, dtype=self.dtype, name="attn_reduce")(
                    jnp.swapaxes(pooled, -1, -2))[..., 0]
            if use_cls and self.attention_mask_reduction != "cls" \
                    and attn.shape[-1] == seq_len:
                # drop cls keys so attn covers the t real dates (the
                # reference's final view assumes t and CRASHES otherwise)
                attn = attn[..., nct:]

        # MLP + out GroupNorm (applied per remaining token)
        out = nn.Dense(self.mlp[1], dtype=self.dtype, name="mlp_dense")(out)
        out = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                           name="mlp_bn")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out_scale = self.param("out_norm_scale", nn.initializers.ones,
                               (self.mlp[-1],), jnp.float32)
        out_bias = self.param("out_norm_bias", nn.initializers.zeros,
                              (self.mlp[-1],), jnp.float32)
        if out.ndim == 4:  # reduced: (B, H, W, C)
            o = out.reshape(b * hh * ww, 1, self.mlp[-1])
            o = _group_norm_over_time(o, self.n_head, out_scale, out_bias)
            out = o.reshape(b, hh, ww, self.mlp[-1])
            return out, attn
        # sequence: (B, H, W, T', C) -> (B, T', H, W, C)
        o = out.reshape(b * hh * ww, out.shape[3], self.mlp[-1])
        o = _group_norm_over_time(o, self.n_head, out_scale, out_bias)
        out = o.reshape(b, hh, ww, out.shape[3], self.mlp[-1])
        if seq_len != t:  # drop cls tokens from the returned sequence
            out = out[:, :, :, seq_len - t:, :]
        return jnp.transpose(out, (0, 3, 1, 2, 4)), attn
