"""Plain U-Net ablation baselines.

- ``Unet``: time-agnostic 2-D U-Net applied per frame or to a 4-D input
  (reference /root/reference/src/backbones/unet.py:14-169).
- ``UnetNaive``: folds the (fixed-length) temporal axis into channels —
  ``b t c h w -> b (t c) h w`` — with widths scaled by temporal_length//2
  (reference unet.py:172-349). Requires a fixed ``temporal_length``; batches
  must be padded to exactly that length (the reference has the same
  restriction, train.py:57-59).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.layers import ConvBlock, DownConvBlock, UpConvBlock


class Unet(nn.Module):
    """Time-agnostic plain U-Net (reference unet.py:14-169). Faithful to the
    reference as shipped: there is NO in_conv — the input must already carry
    ``encoder_widths[0]`` channels (the module is an unwired ablation
    building block; reference get_model never constructs it either,
    learning/utils.py:50-195)."""

    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (32, 20)
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    encoder_norm: str = "group"
    encoder: bool = False
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze_excit: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions=None, pad_mask=None,
                 train: bool = False):
        enc_w, dec_w = self.encoder_widths, self.decoder_widths
        n_stages = len(enc_w)
        out = x
        feature_maps = [out]
        for i in range(n_stages - 1):
            out = DownConvBlock(
                d_out=enc_w[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm=self.encoder_norm,
                padding_mode=self.padding_mode, conv_type=self.conv_type,
                add_squeeze=self.add_squeeze_excit, dtype=self.dtype,
                name=f"down_{i}")(feature_maps[-1], train=train)
            feature_maps.append(out)
        maps = [out]
        for i in range(n_stages - 1):
            out = UpConvBlock(
                d_out=dec_w[-(i + 2)], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm="batch",
                padding_mode=self.padding_mode, dtype=self.dtype,
                name=f"up_{i}")(out, feature_maps[-(i + 2)], train=train)
            maps.append(out)
        if self.encoder:
            return out, maps
        return ConvBlock(nkernels=(dec_w[0],) + tuple(self.out_conv),
                         padding_mode=self.padding_mode, dtype=self.dtype,
                         name="out_conv")(out, train=train)


class UnetNaive(nn.Module):
    input_dim: int = 10
    temporal_length: int = 61
    encoder_widths: Sequence[int] = (8, 8, 8, 16)
    decoder_widths: Sequence[int] = (4, 4, 8, 16)
    out_conv: Sequence[int] = (4, 20)
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    pad_value: float = 0.0
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze_excit: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions=None, pad_mask=None,
                 train: bool = False):
        tl = self.temporal_length
        enc_w = tuple(w * tl // 2 for w in self.encoder_widths)
        dec_w = tuple(w * tl // 2 for w in self.decoder_widths)
        n_stages = len(enc_w)
        b, t, h, w_, c = x.shape
        assert t == tl, (f"unet_naive requires batches padded to exactly "
                         f"temporal_length={tl}, got T={t}")
        folded = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w_, t * c)

        out = ConvBlock(nkernels=(self.input_dim * tl, enc_w[0], enc_w[0]),
                        norm="batch", padding_mode=self.padding_mode,
                        conv_type=self.conv_type,
                        add_squeeze=self.add_squeeze_excit, dtype=self.dtype,
                        name="in_conv")(folded, train=train)
        feature_maps = [out]
        for i in range(n_stages - 1):
            out = DownConvBlock(
                d_out=enc_w[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm="batch",
                padding_mode=self.padding_mode, conv_type=self.conv_type,
                add_squeeze=self.add_squeeze_excit, dtype=self.dtype,
                name=f"down_{i}")(feature_maps[-1], train=train)
            feature_maps.append(out)
        for i in range(n_stages - 1):
            out = UpConvBlock(
                d_out=dec_w[-(i + 2)], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm="batch",
                padding_mode=self.padding_mode, dtype=self.dtype,
                name=f"up_{i}")(out, feature_maps[-(i + 2)], train=train)
        return ConvBlock(
            nkernels=(dec_w[0], self.out_conv[0] * tl, self.out_conv[1]),
            padding_mode=self.padding_mode, dtype=self.dtype,
            name="out_conv")(out, train=train)
