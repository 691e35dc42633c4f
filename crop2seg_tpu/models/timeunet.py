"""TimeUNet_v1: temporal-first U-Net (the reference's shipped inference model).

Re-design of /root/reference/src/backbones/timeunet.py:10-210. Data flow:

    x (B,T,H,W,C) --shared in_conv--> (B,T,H,W,64)
    --L-TAE at FULL resolution--> (B,H,W,64)      # collapses T before the UNet
    --plain UNet encoder/decoder (no temporal skips)--> logits (B,H,W,K)

The full-resolution L-TAE runs attention over B*H*W = B*16384 pixel rows —
this is the dominant cost and the primary target of the fused Pallas kernel
(crop2seg_tpu.ops.ltae_pallas).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.layers import ConvBlock, DownConvBlock, UpConvBlock
from crop2seg_tpu.nn.ltae import LTAE
from crop2seg_tpu.nn.temporal import pad_mask_from_input, temporally_shared


class TimeUNet(nn.Module):
    input_dim: int = 10
    encoder_widths: Sequence[int] = (64, 64, 64, 128)
    decoder_widths: Sequence[int] = (32, 32, 64, 128)
    out_conv: Sequence[int] = (32, 20)
    str_conv_k: int = 4
    str_conv_s: int = 2
    str_conv_p: int = 1
    encoder_norm: str = "group"
    n_head: int = 16
    d_model: int = 256
    d_k: int = 4
    encoder: bool = False
    return_maps: bool = False
    pad_value: float = 0.0
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze_excit: bool = False
    use_abs_rel_enc: bool = False
    num_queries: int = 1
    use_doy: bool = False
    add_linear: bool = False
    use_pallas: bool = False
    # Fused custom-VJP Pallas kernel pair on the TRAINING path
    # (nn.ltae.LTAE.use_pallas_train): the (B*16384, T, 256) embed lives only
    # in VMEM in both directions — faster than seq_chunk, TPU only.
    use_pallas_train: bool = False
    # Stream the full-resolution L-TAE over T in chunks of this many steps
    # (nn.ltae.LTAE.seq_chunk): makes the model TRAINABLE at B>=8 bf16 on one
    # chip by never materializing the (B*16384, T, 256) embed. The reference
    # trains this exact model (timeunet.py:169-210).
    seq_chunk: int | None = None
    # Activation checkpointing of the conv blocks (see UTAE.remat).
    remat: bool = False
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

        conv_block, down_block, up_block = ConvBlock, DownConvBlock, UpConvBlock
        if self.remat:
            # static_argnums count ``self`` as 0; ``train``, ``packed_tail``
            # and ``defer_tail_norm`` are Python bools (jax.checkpoint
            # statics are positional-only, so conv_block calls pass all four
            # args positionally).
            conv_block = nn.remat(ConvBlock, static_argnums=(2, 3, 4))
            down_block = nn.remat(DownConvBlock, static_argnums=(2,))
            up_block = nn.remat(UpConvBlock, static_argnums=(3,))

        # Lane-packed handoff to the fused L-TAE kernels: when a fused path
        # will run (mirror of LTAE.__call__'s gates, in its routing order),
        # the in_conv tail emits (B, T, H, W/2, 2C) natively via the pair
        # conv — full-width lanes for the kernel's DMA, no relayout
        # (nn/layers.py packed_tail) — and defers its GroupNorm+ReLU into
        # the kernel. Covers BOTH the eval kernel (use_pallas) and the
        # custom-VJP train pair (use_pallas_train; ltae_pool_tail).
        fused_eval = (self.use_pallas and not train
                      and self.num_queries == 1
                      and not self.is_initializing())
        fused_train = (not fused_eval and self.use_pallas_train
                       and not return_att and self.num_queries == 1
                       and not self.is_initializing())
        use_packed = ((fused_eval or fused_train)
                      and self.encoder_norm == "group"
                      and self.padding_mode == "reflect"
                      and self.conv_type == "2d"
                      and not self.add_squeeze_excit
                      and x.shape[3] % 2 == 0 and x.shape[2] >= 2
                      and x.shape[3] >= 2)
        in_conv = conv_block(
            nkernels=(self.input_dim, enc_w[0], enc_w[0]), norm=self.encoder_norm,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            add_squeeze=self.add_squeeze_excit, dtype=self.dtype, name="in_conv")
        tail_affine = None
        if use_packed:
            # Deferred tail norm: in_conv returns the RAW pair-conv output
            # plus its per-frame GroupNorm affine; the fused L-TAE kernel
            # applies max(z*sc+sh, 0) in VMEM (no materialized normalized
            # copy — saves the ~2 GB normalize round-trip). The pad mask is
            # folded into the affine as zeroed rows, which reproduces
            # temporally_shared's pad_value overwrite exactly (pads are 0).
            b_, t_ = x.shape[:2]
            z, sc, sh = in_conv(x.reshape((b_ * t_,) + x.shape[2:]),
                                train, True, True)
            out = z.reshape((b_, t_) + z.shape[1:])
            valid = (~pad_mask).astype(jnp.float32)[:, :, None]
            tail_affine = (sc.reshape(b_, t_, -1) * valid,
                           sh.reshape(b_, t_, -1) * valid)
        else:
            out = temporally_shared(
                lambda f: in_conv(f, train, False, False), x,
                pad_mask, self.pad_value)

        # Temporal collapse at full 128^2 resolution (reference :169-184).
        out, att = LTAE(
            in_channels=enc_w[0], d_model=self.d_model, n_head=self.n_head,
            d_k=self.d_k, mlp=(self.d_model, enc_w[0]),
            use_abs_rel_enc=self.use_abs_rel_enc, num_queries=self.num_queries,
            use_doy=use_doy, add_linear=self.add_linear,
            use_pallas=self.use_pallas, seq_chunk=self.seq_chunk,
            use_pallas_train=self.use_pallas_train,
            dtype=self.dtype, name="temporal_encoder",
        )(out, batch_positions=batch_positions, pad_mask=pad_mask, train=train,
          need_attn=return_att, input_packed=use_packed,
          tail_affine=tail_affine)

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
            )(out, feature_maps[-(i + 2)], train)
            maps.append(out)

        if self.encoder:
            return out, maps
        logits = conv_block(
            nkernels=(dec_w[0],) + tuple(self.out_conv),
            padding_mode=self.padding_mode, conv_type="2d", dtype=self.dtype,
            name="out_conv")(out, train, False, False)
        if return_att:
            return logits, att
        if self.return_maps:
            return logits, maps
        return logits
