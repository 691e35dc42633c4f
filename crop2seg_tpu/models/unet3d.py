"""3-D conv U-Net over (T, H, W) — Rustowicz et al. baseline.

Re-design of /root/reference/src/backbones/unet3d.py:14-112 in NDHWC layout:
two 3-D conv+pool stages, center block with transposed-conv upsampling,
skip concats truncated on T to match (reference :86,89), masked temporal mean
head over the surviving T (reference :96-107, including its quirk of
truncating the pad mask to the post-pooling length).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from crop2seg_tpu.nn.temporal import pad_mask_from_input


def _conv3d(x, features, name_prefix, self_, train, k=3):
    x = nn.Conv(features, kernel_size=(k, k, k), padding=1,
                dtype=self_.dtype, name=f"{name_prefix}_conv")(x)
    x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self_.dtype,
                     name=f"{name_prefix}_bn")(x, use_running_average=not train)
    return nn.leaky_relu(x, negative_slope=0.01)


def _deconv3d(x, features, self_, name):
    """torch ConvTranspose3d(k=3, s=2, p=1, output_padding=1): doubles dims.
    conv_general_dilated with lhs_dilation=2, pad (low=1, high=2)."""
    in_ch = x.shape[-1]
    kernel = self_.param(f"{name}_kernel", nn.initializers.lecun_normal(),
                         (3, 3, 3, in_ch, features), jnp.float32)
    bias = self_.param(f"{name}_bias", nn.initializers.zeros, (features,),
                       jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((1, 2), (1, 2), (1, 2)), lhs_dilation=(2, 2, 2),
        dimension_numbers=dn)
    return y + bias.astype(y.dtype)


class UNet3D(nn.Module):
    n_classes: int = 15
    in_channel: int = 10
    feats: int = 8
    pad_value: float | None = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, batch_positions=None, pad_mask=None,
                 train: bool = False):
        # x: (B, T, H, W, C) = NDHWC with depth = time
        f = self.feats
        if pad_mask is None and self.pad_value is not None:
            pad_mask = pad_mask_from_input(x, self.pad_value)

        def block(h, mid, out, tag):
            h = _conv3d(h, mid, f"{tag}a", self, train)
            return _conv3d(h, out, f"{tag}b", self, train)

        en3 = block(x, f * 4, f * 4, "en3")
        p3 = nn.max_pool(en3, (2, 2, 2), strides=(2, 2, 2))
        en4 = block(p3, f * 8, f * 8, "en4")
        p4 = nn.max_pool(en4, (2, 2, 2), strides=(2, 2, 2))
        center = _conv3d(p4, f * 16, "center_in", self, train)
        center = _conv3d(center, f * 16, "center_mid", self, train)
        center = _deconv3d(center, f * 8, self, "center_out")
        cat4 = jnp.concatenate([center, en4[:, :center.shape[1]]], axis=-1)
        dc4 = block(cat4, f * 8, f * 8, "dc4")
        tr3 = _deconv3d(dc4, f * 4, self, "trans3")
        tr3 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                           name="trans3_bn")(tr3, use_running_average=not train)
        tr3 = nn.leaky_relu(tr3, negative_slope=0.01)
        cat3 = jnp.concatenate([tr3, en3[:, :tr3.shape[1]]], axis=-1)
        dc3 = block(cat3, f * 4, f * 2, "dc3")
        final = nn.Conv(self.n_classes, kernel_size=(3, 3, 3), padding=1,
                        dtype=self.dtype, name="final")(dc3)
        # masked temporal mean over the surviving T (reference :96-107)
        t_out = final.shape[1]
        if pad_mask is not None:
            valid = (~pad_mask[:, :t_out]).astype(final.dtype)
            num = jnp.einsum("bt,bthwc->bhwc", valid, final)
            den = jnp.maximum(jnp.sum(valid, axis=1), 1.0)[:, None, None, None]
            return num / den
        return jnp.mean(final, axis=1)
