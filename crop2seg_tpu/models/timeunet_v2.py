"""TimeUNet_v2: two-stage temporal attention U-Net (experimental).

Re-design of /root/reference/src/backbones/timeunet.py:214-429
(@experimental): classical full TxT TAE2d at full resolution returning a new
embedded SEQUENCE, shared conv encoder over the sequence, lightweight TAE2d
at the lowest resolution collapsing T, attention-aggregated skips, UpConv
decoder. (The reference's no-reduction MLP path is shape-inconsistent; see
crop2seg_tpu.nn.tae2d for the corrected sequence handling.)
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.aggregator import temporal_aggregate
from crop2seg_tpu.nn.layers import ConvBlock, DownConvBlock, UpConvBlock
from crop2seg_tpu.nn.tae2d import TAE2d
from crop2seg_tpu.nn.temporal import pad_mask_from_input, temporally_shared


class TimeUNetV2(nn.Module):
    input_dim: int = 10
    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (32, 20)
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    agg_mode: str = "att_group"
    encoder_norm: str = "group"
    n_head: int = 16
    d_model: int = 256
    d_k: int = 4
    pad_value: float = 0.0
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze_excit: bool = False
    use_abs_rel_enc: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions: jax.Array | None = None,
                 pad_mask: jax.Array | None = None, train: bool = False,
                 return_att: bool = False):
        n_stages = len(self.encoder_widths)
        enc_w, dec_w = self.encoder_widths, self.decoder_widths
        if pad_mask is None:
            pad_mask = pad_mask_from_input(x, self.pad_value)

        in_conv = ConvBlock(
            nkernels=(self.input_dim, enc_w[0], enc_w[0]),
            norm=self.encoder_norm, padding_mode=self.padding_mode,
            conv_type=self.conv_type, add_squeeze=self.add_squeeze_excit,
            dtype=self.dtype, name="in_conv")
        out = temporally_shared(lambda f: in_conv(f, train=train), x,
                                pad_mask, self.pad_value)

        # classical TAE at full resolution -> new embedded sequence
        out, _ = TAE2d(
            attention_type="classical", embedding_reduction=None,
            attention_mask_reduction=None, in_channels=enc_w[0],
            d_model=self.d_model, n_head=self.n_head, d_k=self.d_k,
            mlp=(self.d_model, enc_w[0]),
            use_abs_rel_enc=self.use_abs_rel_enc, dtype=self.dtype,
            name="temporal_encoder_full_resolution",
        )(out, batch_positions=batch_positions, pad_mask=pad_mask,
          train=train)

        feature_maps = [out]
        for i in range(n_stages - 1):
            blk = DownConvBlock(
                d_out=enc_w[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm=self.encoder_norm,
                padding_mode=self.padding_mode, conv_type=self.conv_type,
                add_squeeze=self.add_squeeze_excit, dtype=self.dtype,
                name=f"down_{i}")
            out = temporally_shared(lambda f, blk=blk: blk(f, train=train),
                                    feature_maps[-1], pad_mask, self.pad_value)
            feature_maps.append(out)

        # lightweight TAE at the lowest resolution -> collapse T
        out, attn = TAE2d(
            attention_type="lightweight", in_channels=enc_w[-1],
            d_model=self.d_model, n_head=self.n_head, d_k=self.d_k,
            mlp=(self.d_model, enc_w[-1]),
            use_abs_rel_enc=self.use_abs_rel_enc, dtype=self.dtype,
            name="temporal_encoder_low_resolution",
        )(out, batch_positions=batch_positions, pad_mask=pad_mask,
          train=train)

        for i in range(n_stages - 1):
            skip = temporal_aggregate(feature_maps[-(i + 2)], attn=attn,
                                      pad_mask=pad_mask, mode=self.agg_mode)
            out = UpConvBlock(
                d_out=dec_w[-(i + 2)], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm="batch",
                padding_mode=self.padding_mode, dtype=self.dtype,
                name=f"up_{i}")(out, skip, train=train)

        logits = ConvBlock(nkernels=(dec_w[0],) + tuple(self.out_conv),
                           padding_mode=self.padding_mode, dtype=self.dtype,
                           name="out_conv")(out, train=train)
        if return_att:
            return logits, attn
        return logits
