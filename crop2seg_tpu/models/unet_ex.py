"""mmseg-style U-Net blocks ("Exchanger" variants).

Re-design of the mmsegmentation-derived blocks the reference vendored from
Exchanger4SITS (/root/reference/src/backbones/unet.py:357-690:
ConvModule_ex, BasicConvBlock_ex, DeconvModule_ex, InterpConv_ex,
UpConvBlock_ex, UNet_ex). They are not reachable from the reference's model
factory but are part of its component inventory; kept here as a standalone
2-D segmentation backbone with reference-exact semantics: bias-free convs,
exact-erf GELU default, MaxPool entries on stride-1 downsampled stages, and
the decoder returning every resolution (``dec_outs``).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.layers import ConvTranspose2d, make_norm


def _act(name: str, x: jax.Array) -> jax.Array:
    if name == "gelu":  # torch nn.GELU = exact erf
        return nn.gelu(x, approximate=False)
    return nn.relu(x)


class ConvModuleEx(nn.Module):
    """bias-free conv -> norm -> act (mmseg ConvModule; reference
    unet.py:357-386, ``bias=False`` default)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    norm: str = "batch"
    act: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=self.padding, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        norm_fn = make_norm(self.norm, dtype=self.dtype)
        if norm_fn is not None:
            m = norm_fn(name="norm")
            x = m(x, use_running_average=not train) if self.norm == "batch" \
                else m(x)
        return _act(self.act, x)


class BasicConvBlockEx(nn.Module):
    """num_convs stacked ConvModules; first may stride, rest dilate
    (reference unet.py:389-428)."""

    features: int
    num_convs: int = 2
    stride: int = 1
    dilation: int = 1
    norm: str = "batch"
    act: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_convs):
            x = ConvModuleEx(
                features=self.features,
                stride=self.stride if i == 0 else 1,
                dilation=1 if i == 0 else self.dilation,
                padding=1 if i == 0 else self.dilation,
                norm=self.norm, act=self.act, dtype=self.dtype,
                name=f"conv{i}",
            )(x, train=train)
        return x


class DeconvModuleEx(nn.Module):
    """Transposed-conv x2 upsample + norm + act (reference unet.py:431-468;
    the deconv keeps its bias)."""

    features: int
    kernel_size: int = 4
    norm: str = "batch"
    act: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvTranspose2d(features=self.features,
                            kernel_size=self.kernel_size, stride=2,
                            padding=(self.kernel_size - 2) // 2,
                            dtype=self.dtype, name="deconv")(x)
        norm_fn = make_norm(self.norm, dtype=self.dtype)
        if norm_fn is not None:
            m = norm_fn(name="norm")
            x = m(x, use_running_average=not train) if self.norm == "batch" \
                else m(x)
        return _act(self.act, x)


class InterpConvEx(nn.Module):
    """Bilinear x2 (align_corners=False) upsample + 1x1 ConvModule
    (reference unet.py:471-529, default conv_first=False)."""

    features: int
    norm: str = "batch"
    act: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
        return ConvModuleEx(features=self.features, kernel_size=1,
                            norm=self.norm, act=self.act, dtype=self.dtype,
                            name="conv")(x, train=train)


class UpConvBlockEx(nn.Module):
    """Upsample the deep map to skip width, concat [skip, up], conv block
    on 2*skip channels (reference unet.py:597-656)."""

    features: int
    num_convs: int = 2
    dilation: int = 1
    use_deconv: bool = False
    norm: str = "batch"
    act: str = "relu"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array,
                 train: bool = False) -> jax.Array:
        up_cls = DeconvModuleEx if self.use_deconv else InterpConvEx
        x = up_cls(features=skip.shape[-1], norm=self.norm, act=self.act,
                   dtype=self.dtype, name="upsample")(x, train=train)
        x = jnp.concatenate([skip, x], axis=-1)
        return BasicConvBlockEx(features=self.features,
                                num_convs=self.num_convs,
                                dilation=self.dilation, norm=self.norm,
                                act=self.act, dtype=self.dtype,
                                name="conv_block")(x, train=train)


class UNetEx(nn.Module):
    """mmseg-style encoder/decoder U-Net (reference UNet_ex,
    unet.py:553-690). Reference defaults: 4 stages, stride-1 encoder convs
    with MaxPool(2) stage entries, GELU activations, bilinear InterpConv
    upsampling; ``__call__`` returns the full-resolution decoder output,
    plus every decoder resolution (the reference's ``dec_outs``) when
    ``return_maps``. ``num_classes`` adds an optional 1x1 head on top (not
    in the reference, which is a bare backbone)."""

    base_channels: int = 64
    num_stages: int = 4
    strides: Sequence[int] = (1, 1, 1, 1)
    enc_num_convs: Sequence[int] = (2, 2, 2, 2)
    dec_num_convs: Sequence[int] = (2, 2, 2)
    downsamples: Sequence[bool] = (True, True, True)
    enc_dilations: Sequence[int] = (1, 1, 1, 1)
    dec_dilations: Sequence[int] = (1, 1, 1)
    act: str = "gelu"
    norm: str = "batch"
    use_deconv: bool = False
    num_classes: int | None = None
    return_maps: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        enc_outs = []
        h = x
        for i in range(self.num_stages):
            if i != 0 and self.strides[i] == 1 and self.downsamples[i - 1]:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = BasicConvBlockEx(
                features=self.base_channels * 2 ** i,
                num_convs=self.enc_num_convs[i], stride=self.strides[i],
                dilation=self.enc_dilations[i], norm=self.norm,
                act=self.act, dtype=self.dtype, name=f"encoder_{i}",
            )(h, train=train)
            enc_outs.append(h)
        dec_outs = [h]
        for i in range(self.num_stages - 2, -1, -1):
            h = UpConvBlockEx(
                features=self.base_channels * 2 ** i,
                num_convs=self.dec_num_convs[i],
                dilation=self.dec_dilations[i], norm=self.norm,
                act=self.act, use_deconv=self.use_deconv, dtype=self.dtype,
                name=f"decoder_{i}")(h, enc_outs[i], train=train)
            dec_outs.append(h)
        out = h
        if self.num_classes is not None:
            out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          name="head")(out)
        if self.return_maps:
            return out, dec_outs
        return out
