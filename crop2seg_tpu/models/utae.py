"""U-TAE: U-Net with temporal attention encoder (TPU-native).

Re-design of /root/reference/src/backbones/utae.py:14-252. Data flow:

    x (B,T,H,W,C) --shared in_conv--> f0 --shared down x3--> f3 (T kept)
    f3 --L-TAE--> bottleneck (B,h,w,128) + attention masks
    skips: temporal_aggregate(f_i, attn) ; decoder: UpConvBlock chain
    head: out_conv -> (B,H,W,K) logits [+ boundary head (B,H,W,2)]

All tensors are channels-last; ragged T is handled by an explicit pad mask
(no data-dependent shapes), see crop2seg_tpu.nn.temporal.
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
from crop2seg_tpu.nn.ltae import LTAE
from crop2seg_tpu.nn.temporal import pad_mask_from_input, temporally_shared


class UTAE(nn.Module):
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
    use_pallas: bool = False
    # Activation checkpointing: recompute each conv block in the backward
    # pass instead of storing its activations (trades ~1 extra forward of
    # FLOPs for O(stages) less HBM -> enables B=16-32 bf16 training).
    remat: bool = False
    # With remat on, also rematerialize the post-collapse decoder (up/out
    # blocks). Their activations are T-free and tiny ((B, H, W, C) vs the
    # encoder's (B*T, H, W, C)), so recomputing them saves almost no memory
    # while re-running every decoder conv in the backward pass — False keeps
    # the 976-frame encoder remat'd but stores the decoder.
    remat_decoder: bool = True
    # With remat on, also rematerialize the down blocks. Their interiors
    # are 4-64x smaller than in_conv's ((B*T, H/2^i, W/2^i, C)); storing
    # them costs ~2.7 GB at the flagship B=16 bf16 scale and skips their
    # ~53 ms backward recompute (measured segment fwd: down0 33 + down1 14
    # + down2 6 ms) — in_conv, whose interiors dominate memory, stays
    # remat'd either way.
    remat_down: bool = True
    # Remat policy for the checkpointed blocks: None recomputes everything
    # (XLA default); 'conv_out' stores each conv's raw output (tagged with
    # jax.ad_checkpoint.checkpoint_name in nn/layers.py) and recomputes only
    # the GroupNorm/ReLU tails — the convs are the FLOP cost of the
    # recompute, the norms only bandwidth.
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
            # static_argnums count ``self`` as 0; ``train`` is a Python bool.
            # 'gn_stats' rides along with 'conv_out': the (N, groups) GN
            # statistics are ~KB-scale, and storing them lets the backward
            # recompute skip the stats re-reduction over each stored conv
            # output (one full HBM read per norm unit; see TaggedGroupNorm).
            policy = (jax.checkpoint_policies.save_only_these_names(
                "conv_out", "gn_stats")
                if self.remat_policy == "conv_out" else None)
            in_block = nn.remat(in_block, static_argnums=(2,), policy=policy)
            if self.remat_down:
                down_block = nn.remat(down_block, static_argnums=(2,),
                                      policy=policy)
            if self.remat_decoder:
                out_block = nn.remat(out_block, static_argnums=(2,),
                                     policy=policy)
                up_block = nn.remat(up_block, static_argnums=(3,),
                                    policy=policy)

        # --- shared spatial encoder over every frame -----------------------
        in_conv = in_block(
            nkernels=(self.input_dim, enc_w[0], enc_w[0]), norm=self.encoder_norm,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            add_squeeze=self.add_squeeze_excit, dtype=self.dtype, name="in_conv")
        out = temporally_shared(lambda f: in_conv(f, train), x,
                                pad_mask, self.pad_value)
        feature_maps = [out]
        for i in range(n_stages - 1):
            blk = down_block(
                d_out=enc_w[i + 1], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm=self.encoder_norm,
                padding_mode=self.padding_mode, conv_type=self.conv_type,
                add_squeeze=self.add_squeeze_excit, dtype=self.dtype,
                name=f"down_{i}")
            out = temporally_shared(lambda f, blk=blk: blk(f, train),
                                    feature_maps[-1], pad_mask, self.pad_value)
            feature_maps.append(out)

        # --- temporal encoder at the lowest resolution ---------------------
        out, att = LTAE(
            in_channels=enc_w[-1], d_model=self.d_model, n_head=self.n_head,
            d_k=self.d_k, mlp=(self.d_model, dec_w[-1]),
            use_abs_rel_enc=self.use_abs_rel_enc, num_queries=self.num_queries,
            use_doy=use_doy, add_linear=self.add_linear,
            use_pallas=self.use_pallas, dtype=self.dtype,
            name="temporal_encoder",
        )(feature_maps[-1], batch_positions=batch_positions,
          pad_mask=pad_mask, train=train)

        # --- decoder with attention-aggregated skips -----------------------
        maps = [out]
        for i in range(n_stages - 1):
            skip = temporal_aggregate(
                feature_maps[-(i + 2)], attn=att, pad_mask=pad_mask,
                mode=self.agg_mode)
            out = up_block(
                d_out=dec_w[-(i + 2)], k=self.str_conv_k, s=self.str_conv_s,
                p=self.str_conv_p, norm="batch", padding_mode=self.padding_mode,
                conv_type="2d", dtype=self.dtype, name=f"up_{i}",
            )(out, skip, train)
            maps.append(out)

        if self.encoder:
            return out, maps

        logits = out_block(
            nkernels=(dec_w[0],) + tuple(self.out_conv),
            padding_mode=self.padding_mode, conv_type="2d", dtype=self.dtype,
            name="out_conv")(out, train)

        if self.add_boundary_loss:
            boundary = out_block(
                nkernels=(dec_w[0], 32, 2), padding_mode=self.padding_mode,
                conv_type="2d", dtype=self.dtype, name="boundary_conv",
            )(out, train)
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
