"""RecUNet: U-Net with a recurrent temporal bottleneck.

Re-design of /root/reference/src/backbones/recunet.py:10-171: shared conv
encoder, ConvLSTM / BConvLSTM / masked-mean / mono temporal encoder at the
lowest resolution, masked temporal MEAN on skips, UpConvBlock decoder.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.models.convlstm import BConvLSTM, ConvLSTM
from crop2seg_tpu.nn.aggregator import temporal_aggregate
from crop2seg_tpu.nn.layers import Conv2d, ConvBlock, DownConvBlock, UpConvBlock
from crop2seg_tpu.nn.temporal import pad_mask_from_input, temporally_shared


class RecUNet(nn.Module):
    input_dim: int = 10
    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (32, 20)
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    temporal: str = "lstm"          # mean | lstm | blstm | mono
    encoder_norm: str = "group"
    hidden_dim: int = 128
    encoder: bool = False
    padding_mode: str = "reflect"
    pad_value: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions=None, pad_mask=None,
                 train: bool = False):
        n_stages = len(self.encoder_widths)
        enc_w, dec_w = self.encoder_widths, self.decoder_widths
        if pad_mask is None:
            pad_mask = pad_mask_from_input(x, self.pad_value)

        in_conv = ConvBlock(nkernels=(self.input_dim, enc_w[0], enc_w[0]),
                            norm=self.encoder_norm, dtype=self.dtype,
                            name="in_conv")
        out = temporally_shared(lambda f: in_conv(f, train=train), x,
                                pad_mask, self.pad_value)
        feature_maps = [out]
        for i in range(n_stages - 1):
            blk = DownConvBlock(
                d_out=enc_w[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm=self.encoder_norm,
                padding_mode=self.padding_mode, dtype=self.dtype,
                name=f"down_{i}")
            out = temporally_shared(lambda f, blk=blk: blk(f, train=train),
                                    feature_maps[-1], pad_mask, self.pad_value)
            feature_maps.append(out)

        if self.temporal == "mean":
            out = temporal_aggregate(feature_maps[-1], pad_mask=pad_mask,
                                     mode="mean")
        elif self.temporal == "lstm":
            _, (_, c_t) = ConvLSTM(self.hidden_dim, 3, self.dtype,
                                   name="temporal_encoder")(feature_maps[-1])
            out = Conv2d(features=enc_w[-1], kernel_size=3, stride=1,
                         padding=1, padding_mode="zeros", dtype=self.dtype,
                         name="out_convlstm")(c_t)
        elif self.temporal == "blstm":
            emb = BConvLSTM(self.hidden_dim, 3, self.dtype,
                            name="temporal_encoder")(feature_maps[-1], pad_mask)
            out = Conv2d(features=enc_w[-1], kernel_size=3, stride=1,
                         padding=1, padding_mode="zeros", dtype=self.dtype,
                         name="out_convlstm")(emb)
        elif self.temporal == "mono":
            out = feature_maps[-1]
        else:
            raise ValueError(f"unknown temporal mode {self.temporal!r}")

        maps = [out]
        for i in range(n_stages - 1):
            if self.temporal != "mono":
                skip = temporal_aggregate(feature_maps[-(i + 2)],
                                          pad_mask=pad_mask, mode="mean")
            else:
                skip = feature_maps[-(i + 2)]
            out = UpConvBlock(
                d_out=dec_w[-(i + 2)], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm=self.encoder_norm,
                padding_mode=self.padding_mode, dtype=self.dtype,
                name=f"up_{i}")(out, skip, train=train)
            maps.append(out)

        if self.encoder:
            return out, maps
        return ConvBlock(nkernels=(dec_w[0],) + tuple(self.out_conv),
                         padding_mode=self.padding_mode, dtype=self.dtype,
                         name="out_conv")(out, train=train)
