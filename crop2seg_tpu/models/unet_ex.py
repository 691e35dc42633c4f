"""mmseg-style U-Net blocks ("Exchanger" variants).

Re-design of the mmsegmentation-derived blocks the reference vendored from
Exchanger4SITS (/root/reference/src/backbones/unet.py:357-690:
ConvModule_ex, BasicConvBlock_ex, DeconvModule_ex, InterpConv_ex,
UpConvBlock_ex, UNet_ex). They are not reachable from the reference's model
factory but are part of its component inventory; kept here as a standalone
2-D segmentation backbone.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.layers import Conv2d, ConvTranspose2d, make_norm


class ConvModuleEx(nn.Module):
    """conv -> norm -> relu (mmseg ConvModule; reference unet.py:357-400)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    norm: str = "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = self.dilation * (self.kernel_size // 2)
        x = nn.Conv(self.features,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=pad, dtype=self.dtype, name="conv")(x)
        norm_fn = make_norm(self.norm, dtype=self.dtype)
        if norm_fn is not None:
            m = norm_fn(name="norm")
            x = m(x, use_running_average=not train) if self.norm == "batch" \
                else m(x)
        return nn.relu(x)


class BasicConvBlockEx(nn.Module):
    """num_convs stacked ConvModules; first may stride, rest dilate
    (reference unet.py:403-470)."""

    features: int
    num_convs: int = 2
    stride: int = 1
    dilation: int = 1
    norm: str = "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_convs):
            x = ConvModuleEx(
                features=self.features,
                stride=self.stride if i == 0 else 1,
                dilation=1 if i == 0 else self.dilation,
                norm=self.norm, dtype=self.dtype, name=f"conv{i}",
            )(x, train=train)
        return x


class DeconvModuleEx(nn.Module):
    """Transposed-conv x2 upsample + norm + relu (reference unet.py:473-529)."""

    features: int
    kernel_size: int = 4
    norm: str = "batch"
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
        return nn.relu(x)


class InterpConvEx(nn.Module):
    """Bilinear x2 upsample + 1x1 conv (reference unet.py:532-594)."""

    features: int
    norm: str = "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")
        return ConvModuleEx(features=self.features, kernel_size=1,
                            norm=self.norm, dtype=self.dtype,
                            name="conv")(x, train=train)


class UpConvBlockEx(nn.Module):
    """Upsample + concat skip + BasicConvBlock (reference unet.py:597-656)."""

    features: int
    num_convs: int = 2
    use_deconv: bool = False
    norm: str = "batch"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array,
                 train: bool = False) -> jax.Array:
        up_cls = DeconvModuleEx if self.use_deconv else InterpConvEx
        x = up_cls(features=self.features, norm=self.norm, dtype=self.dtype,
                   name="upsample")(x, train=train)
        x = jnp.concatenate([skip, x], axis=-1)
        return BasicConvBlockEx(features=self.features,
                                num_convs=self.num_convs, norm=self.norm,
                                dtype=self.dtype, name="conv_block",
                                )(x, train=train)


class UNetEx(nn.Module):
    """mmseg-style encoder/decoder U-Net (reference UNet_ex, unet.py:659-690)."""

    base_channels: int = 64
    num_stages: int = 5
    num_classes: int | None = None
    strides: Sequence[int] = (1, 2, 2, 2, 2)
    norm: str = "batch"
    use_deconv: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        enc = []
        h = x
        for i in range(self.num_stages):
            h = BasicConvBlockEx(
                features=self.base_channels * 2 ** i, stride=self.strides[i],
                norm=self.norm, dtype=self.dtype, name=f"encoder_{i}",
            )(h, train=train)
            enc.append(h)
        out = enc[-1]
        for i in range(self.num_stages - 2, -1, -1):
            out = UpConvBlockEx(
                features=self.base_channels * 2 ** i, norm=self.norm,
                use_deconv=self.use_deconv, dtype=self.dtype,
                name=f"decoder_{i}")(out, enc[i], train=train)
        if self.num_classes is not None:
            out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          name="head")(out)
        return out
