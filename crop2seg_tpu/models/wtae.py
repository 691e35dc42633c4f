"""W-TAE: attention-mask-first U-Net variant.

Re-design of /root/reference/src/backbones/wtae.py:15-279. Data flow:

    x --shared in_conv--> f (B,T,H,W,64)
    f --depthwise-separable reduction pyramid--> (B,T,16,16,128)
    --LTAE4WTAE--> attention masks only (B,16,16,head,T)
    f collapsed by temporal_aggregate(att upsampled to full res)
    --> plain UNet on the collapsed (B,H,W,64) map --> logits [+ boundary]
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.aggregator import temporal_aggregate
from crop2seg_tpu.nn.layers import (
    ConvBlock, DownConvBlock, UpConvBlock,
    MBConvBlock, MBDownConvBlock, MBUpConvBlock,
)
from crop2seg_tpu.nn.ltae import LTAE4WTAE
from crop2seg_tpu.nn.temporal import pad_mask_from_input, temporally_shared


class WTAE(nn.Module):
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
    encoder: bool = False
    return_maps: bool = False
    pad_value: float = 0.0
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    use_mbconv: bool = False
    add_squeeze_excit: bool = False
    use_abs_rel_enc: bool = False
    num_queries: int = 1
    use_doy: bool = False
    add_linear: bool = False
    add_boundary_loss: bool = False
    # Activation checkpointing on the temporally-shared blocks (in_conv +
    # the depthwise reduction pyramid run over B*T frames — the memory
    # cost; the post-collapse UNet stays stored). remat_policy='conv_out'
    # stores conv outputs and recomputes only the GN/ReLU tails (see
    # models/utae.py).
    remat: bool = False
    remat_policy: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions: jax.Array | None = None,
                 pad_mask: jax.Array | None = None, train: bool = False,
                 return_att: bool = False):
        n_stages = len(self.encoder_widths)
        enc_w, dec_w = self.encoder_widths, self.decoder_widths
        use_doy = False if self.use_abs_rel_enc else self.use_doy
        if pad_mask is None:
            pad_mask = pad_mask_from_input(x, self.pad_value)

        if self.use_mbconv:
            in_block, down_block, up_block, out_block = (
                MBConvBlock, MBDownConvBlock, MBUpConvBlock, MBConvBlock)
        else:
            in_block, down_block, up_block, out_block = (
                ConvBlock, DownConvBlock, UpConvBlock, ConvBlock)
        if self.remat:
            # 'gn_stats' rides along with 'conv_out' (see models/utae.py).
            policy = (jax.checkpoint_policies.save_only_these_names(
                "conv_out", "gn_stats")
                if self.remat_policy == "conv_out" else None)
            # only the temporally-shared stages (B*T frames) are worth
            # rematerializing; the post-collapse UNet blocks reuse
            # down_block, whose recompute is tiny at (B, H, W, C).
            in_block = nn.remat(in_block, static_argnums=(2,), policy=policy)
            down_block = nn.remat(down_block, static_argnums=(2,),
                                  policy=policy)

        in_conv = in_block(
            nkernels=(self.input_dim, enc_w[0], enc_w[0]), norm=self.encoder_norm,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            add_squeeze=self.add_squeeze_excit, dtype=self.dtype, name="in_conv")
        full = temporally_shared(lambda f: in_conv(f, train), x,
                                 pad_mask, self.pad_value)

        # Depthwise-separable spatial reduction pyramid (reference :148-162,
        # 227-231) feeding the attention-mask extractor.
        reduced = full
        for i in range(n_stages - 1):
            blk = down_block(
                d_out=enc_w[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm=self.encoder_norm,
                padding_mode=self.padding_mode, conv_type="depthwise_separable",
                add_squeeze=self.add_squeeze_excit, dtype=self.dtype,
                name=f"spatial_reduction_{i}")
            reduced = temporally_shared(lambda f, blk=blk: blk(f, train),
                                        reduced, pad_mask, self.pad_value)

        att = LTAE4WTAE(
            in_channels=enc_w[-1], d_model=self.d_model, n_head=self.n_head,
            d_k=self.d_k, use_abs_rel_enc=self.use_abs_rel_enc,
            num_queries=self.num_queries, use_doy=use_doy,
            add_linear=self.add_linear, dtype=self.dtype,
            name="temporal_encoder",
        )(reduced, batch_positions=batch_positions, pad_mask=pad_mask,
          train=train)

        # Collapse the FULL-resolution features with the upsampled masks
        # (reference :240-242), then run a plain UNet.
        out = temporal_aggregate(full, attn=att, pad_mask=pad_mask,
                                 mode=self.agg_mode)

        feature_maps = [out]
        for i in range(n_stages - 1):
            out = down_block(
                d_out=enc_w[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm=self.encoder_norm,
                padding_mode=self.padding_mode, conv_type=self.conv_type,
                add_squeeze=self.add_squeeze_excit, dtype=self.dtype,
                name=f"down_{i}")(feature_maps[-1], train)
            feature_maps.append(out)

        maps = [out]
        for i in range(n_stages - 1):
            out = up_block(
                d_out=dec_w[-(i + 2)], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm="batch", padding_mode=self.padding_mode,
                conv_type="2d", dtype=self.dtype, name=f"up_{i}",
            )(out, feature_maps[-(i + 2)], train=train)
            maps.append(out)

        if self.encoder:
            return out, maps
        logits = out_block(
            nkernels=(dec_w[0],) + tuple(self.out_conv),
            padding_mode=self.padding_mode, conv_type="2d", dtype=self.dtype,
            name="out_conv")(out, train=train)
        if self.add_boundary_loss:
            boundary = out_block(
                nkernels=(dec_w[0], 32, 2), padding_mode=self.padding_mode,
                conv_type="2d", dtype=self.dtype, name="boundary_conv",
            )(out, train=train)
            if return_att:
                return logits, boundary, att
            if self.return_maps:
                return logits, boundary, maps
            return logits, boundary
        if return_att:
            return logits, att
        if self.return_maps:
            return logits, maps
        return logits
