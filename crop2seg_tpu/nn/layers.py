"""Core spatial conv layers (NHWC, TPU-first).

Functional re-design of the conv blocks in the reference implementation
(/root/reference/src/backbones/conv.py): same math, channels-last layout so
XLA tiles convs straight onto the MXU, reflect padding done explicitly so all
convs are VALID/SAME primitives, and torch-exact transposed convolution
expressed as an input-dilated convolution.

Parity notes (verified against torch CPU in tests/test_layers.py):
- torch Conv2d(k, s, p, padding_mode='reflect')  == reflect-pad + VALID conv
- torch ConvTranspose2d(k, s, p)                 == conv_general_dilated with
  lhs_dilation=s, padding=k-1-p, spatially-flipped kernel
  (reference use: /root/reference/src/backbones/conv.py:384-390)
- torch BatchNorm2d(momentum=0.1, eps=1e-5)      == nn.BatchNorm(momentum=0.9)
- torch GroupNorm / InstanceNorm2d(affine=False) == nn.GroupNorm variants
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


def spatial_pad(x: jax.Array, pad: int, mode: str = "reflect") -> jax.Array:
    """Pad the two spatial dims of an NHWC tensor."""
    if pad == 0:
        return x
    cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    if mode == "zeros":
        return jnp.pad(x, cfg)
    return jnp.pad(x, cfg, mode=mode)


class _SharedKernelConv3x3(nn.Module):
    """3x3 stride-1 conv whose padding is a *call* argument, so the main pass
    and the edge-strip passes of the decomposed reflect conv share one kernel.
    Parameter layout/init is identical to flax nn.Conv (kernel HWIO
    lecun_normal, bias zeros) — checkpoint paths are unchanged.

    ``pair_packed=True`` emits the LANE-PACKED layout natively: a stride-
    (1, 2) conv with a (3, 4) kernel whose output-channel halves hold the
    taps for w=2k (positions 0-2) and w=2k+1 (positions 1-3), producing
    (N, H, W/2, 2F) — i.e. space-to-depth along W fused into the conv
    custom call. Why: 64-lane bf16 arrays are stored lane-padded in HBM, so
    a Pallas consumer reads them at half bandwidth, and reshaping to
    (…, 2F) in XLA is a full relayout copy; the pair conv is the only spot
    where the packed layout is born for free (+0.5 ms on the flagship conv,
    -3 ms at the fused L-TAE kernel's DMA, measured v5e)."""

    features: int
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, padding,
                 pair_packed: bool = False) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1] // self.feature_group_count, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if pair_packed:
            assert self.feature_group_count == 1
            ka = jnp.pad(kernel, ((0, 0), (0, 1), (0, 0), (0, 0)))
            kb = jnp.pad(kernel, ((0, 0), (1, 0), (0, 0), (0, 0)))
            k2 = jnp.concatenate([ka, kb], axis=-1)       # (3, 4, C, 2F)
            dn = jax.lax.conv_dimension_numbers(x.shape, k2.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(x, k2, (1, 2), padding,
                                             dimension_numbers=dn)
            return y if bias is None else y + jnp.concatenate([bias] * 2)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), padding, dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        return y if bias is None else y + bias


class _SharedKernelConv4x4(nn.Module):
    """4x4 conv whose padding AND strides are call arguments — the bulk pass
    and the edge-strip passes of the decomposed k4/s2/p1 reflect conv share
    one kernel. Parameter layout/init matches flax nn.Conv (kernel HWIO
    lecun_normal, bias zeros) so checkpoint paths are unchanged."""

    features: int
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, padding, strides) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (4, 4, x.shape[-1] // self.feature_group_count, self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, strides, padding, dimension_numbers=dn,
            feature_group_count=self.feature_group_count)
        return y if bias is None else y + bias


def _reflect_conv4x4_s2(conv: _SharedKernelConv4x4, x: jax.Array) -> jax.Array:
    """Exact reflect-pad 4x4/s2/p1 conv WITHOUT materializing the padded copy
    (the strided 'down' conv of every DownConvBlock, reference
    /root/reference/src/backbones/conv.py:238-296 — on U-TAE it runs
    temporally shared over B*T frames at 128^2, where the (N, H+2, W+2, C)
    reflect copy is a full-tensor HBM round-trip like the k3 case above).

    Output row j covers input rows 2j-1..2j+2, which stay interior for
    1 <= j <= H/2-2: only the FIRST output row (touches reflected row -1 ==
    row 1) and the LAST (touches reflected row H == row H-2) differ from the
    implicit-zero bulk. Those two rows/cols are recomputed exactly from
    4-row/col strips and selected in with iota masks, corners composed in
    the same strip order as _reflect_conv3x3."""
    h, w = x.shape[1], x.shape[2]

    def strip_h(rows):
        s = jnp.concatenate([x[:, r:r + 1] for r in rows], axis=1)
        s = jnp.pad(s, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        return conv(s, "VALID", (1, 2))                   # (N, 1, W/2, F)

    def strip_w(cols):
        s = jnp.concatenate([x[:, :, c:c + 1] for c in cols], axis=2)
        s = jnp.pad(s, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
        return conv(s, "VALID", (2, 1))                   # (N, H/2, 1, F)

    bulk = conv(x, ((1, 1), (1, 1)), (2, 2))
    top = strip_h((1, 0, 1, 2))
    bot = strip_h((h - 3, h - 2, h - 1, h - 2))
    left = strip_w((1, 0, 1, 2))
    right = strip_w((w - 3, w - 2, w - 1, w - 2))
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, h // 2, 1, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w // 2, 1), 2)
    out = jnp.where(ix == 0, left, bulk)
    out = jnp.where(ix == w // 2 - 1, right, out)
    out = jnp.where(iy == 0, top, out)
    out = jnp.where(iy == h // 2 - 1, bot, out)
    return out


def _reflect_strips(conv: _SharedKernelConv3x3, x: jax.Array):
    """The four 1-pixel edge strips of the decomposed reflect 3x3 conv:
    (top, bot) of shape (N, 1, W, F) and (left, right) of (N, H, 1, F)."""
    h, w = x.shape[1], x.shape[2]

    def strip_h(i0, i1, i2):
        # output row whose 3-row window is (reflected) rows [i0, i1, i2]
        s = jnp.concatenate([x[:, i0:i0 + 1], x[:, i1:i1 + 1],
                             x[:, i2:i2 + 1]], axis=1)
        s = jnp.pad(s, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
        return conv(s, "VALID")

    def strip_w(i0, i1, i2):
        s = jnp.concatenate([x[:, :, i0:i0 + 1], x[:, :, i1:i1 + 1],
                             x[:, :, i2:i2 + 1]], axis=2)
        s = jnp.pad(s, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
        return conv(s, "VALID")

    return (strip_h(1, 0, 1), strip_h(h - 2, h - 1, h - 2),
            strip_w(1, 0, 1), strip_w(w - 2, w - 1, w - 2))


def _reflect_conv3x3_packed(conv: _SharedKernelConv3x3,
                            x: jax.Array) -> jax.Array:
    """Exact reflect-pad 3x3/s1 conv emitting the lane-packed
    (N, H, W/2, 2F) layout natively (see _SharedKernelConv3x3.pair_packed).

    The bulk is the implicit-zero pair conv; the four edge strips are
    recomputed exactly (same strip passes as _reflect_conv3x3), packed —
    tiny tensors, so their relayout is free — and selected in with
    broadcasted iota masks on the (k, lane) axes: w=0 lives in the low
    lane-half of pair k=0, w=W-1 in the high half of pair k=W/2-1.
    Top/bot row selects come last so corners take the H-strip values,
    matching the unpacked composition order.
    """
    h, w = x.shape[1], x.shape[2]
    bulk = conv(x, ((1, 1), (1, 1)), pair_packed=True)     # (N, H, W/2, 2F)
    f = bulk.shape[-1] // 2
    top, bot, left, right = _reflect_strips(conv, x)
    top_p = top.reshape(top.shape[0], 1, w // 2, 2 * f)
    bot_p = bot.reshape(bot.shape[0], 1, w // 2, 2 * f)
    left_p = jnp.concatenate([left, jnp.zeros_like(left)], axis=-1)
    right_p = jnp.concatenate([jnp.zeros_like(right), right], axis=-1)
    ik = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w // 2, 1), 2)
    il = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 2 * f), 3)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    out = jnp.where((ik == 0) & (il < f), left_p, bulk)
    out = jnp.where((ik == w // 2 - 1) & (il >= f), right_p, out)
    out = jnp.where(iy == 0, top_p, out)
    out = jnp.where(iy == h - 1, bot_p, out)
    return out


class PackedPairGroupNorm(nn.Module):
    """GroupNorm over a lane-packed (N, H, W/2, 2C) tensor (two pixels per
    lane row). Parameter names and shapes match flax nn.GroupNorm (scale/
    bias of (C,)), so checkpoints are interchangeable with the unpacked
    module; statistics span the whole frame exactly like the unpacked form
    because the two lane-halves belong to the same frame. Two-pass variance
    (stats reduced per lane then folded across the halves with a tiny 0/1
    matmul) — no E[x^2]-E[x]^2 cancellation."""

    features: int
    num_groups: int = 4
    epsilon: float = 1e-5
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, z: jax.Array, defer: bool = False):
        """defer=False: return the normalized tensor. defer=True: return the
        per-frame affine ``(sc, sh)`` of shape (N, 2C) fp32 such that
        ``z * sc + sh`` IS the normalized tensor — the stats reads still
        happen here, but the full-size normalize read+write is handed to the
        consumer (the fused L-TAE kernel applies it in VMEM right after the
        block DMA, saving the ~2 GB HBM round-trip of the materialized
        normalized copy on the flagship in_conv tail)."""
        c, g = self.features, self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        n, h, w2, c2 = z.shape
        assert c2 == 2 * c, (z.shape, c)
        lane_groups = (np.arange(2 * c) % c) // (c // g)
        m = jnp.asarray(lane_groups[:, None] == np.arange(g)[None, :],
                        jnp.float32)                       # (2C, G)
        cnt = float(h * w2 * 2 * (c // g))
        zf = z.astype(jnp.float32)
        mean_g = (jnp.sum(zf, axis=(1, 2)) @ m) / cnt      # (N, G)
        mean = (mean_g @ m.T)[:, None, None, :]            # (N, 1, 1, 2C)
        var_g = (jnp.sum(jnp.square(zf - mean), axis=(1, 2)) @ m) / cnt
        inv = (jax.lax.rsqrt(var_g + self.epsilon) @ m.T)[:, None, None, :]
        sc = jnp.concatenate([scale] * 2) * inv
        sh = jnp.concatenate([bias] * 2) - mean * sc
        if defer:
            return sc[:, 0, 0, :], sh[:, 0, 0, :]
        return (zf * sc + sh).astype(z.dtype)


def _reflect_conv3x3(conv: _SharedKernelConv3x3, x: jax.Array) -> jax.Array:
    """Exact reflect-pad 3x3/s1 conv WITHOUT materializing the padded copy.

    The materialized (N, H+2, W+2, C) reflect pad is a full-tensor HBM copy
    that also blocks XLA's producer/epilogue fusion around the conv — on the
    488-frame flagship in_conv chain it costs ~10.6 of 23.4 ms (measured
    v5e; a dynamic_update_slice border fix was tried earlier and is slower
    still). Here the bulk runs as an implicit-zero-pad conv (fusion intact)
    and only the four 1-pixel edge rows/cols — whose windows touch reflected
    pixels — are recomputed exactly from 3-row/col strips and selected in
    with broadcasted iota masks. Identical math, no full-size copy:
    23.4 -> 17.4 ms on the flagship chain.
    """
    h, w = x.shape[1], x.shape[2]
    out = conv(x, ((1, 1), (1, 1)))
    top, bot, left, right = _reflect_strips(conv, x)
    iy = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    # order matters: top/bot last so the corners come from the H strips,
    # whose W axis was reflect-padded (both-axis reflection composes)
    out = jnp.where(ix == 0, left, out)
    out = jnp.where(ix == w - 1, right, out)
    out = jnp.where(iy == 0, top, out)
    out = jnp.where(iy == h - 1, bot, out)
    return out


class Conv2d(nn.Module):
    """2-D convolution with torch-style explicit padding (NHWC).

    Mirrors torch.nn.Conv2d(in, out, k, stride=s, padding=p, padding_mode=...)
    as used throughout /root/reference/src/backbones/conv.py:70-80.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    padding_mode: str = "reflect"
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, pair_packed: bool = False) -> jax.Array:
        p = self.padding
        # zeros padding stays implicit in the conv (no materialized padded
        # copy in HBM). Reflect MUST materialize: a border-fix variant using
        # dynamic_update_slice was tried and is slower on v5e (XLA lowers
        # the ring updates as full-tensor copies: 20.4 -> 32.3 ms for the
        # flagship in_conv block); the materialized pad sits at its copy
        # floor (~4.5 ms/GB-layer).
        implicit = p == 0 or self.padding_mode == "zeros"
        # The decomposed paths cover grouped convs too (feature_group_count
        # passed through): the materialized reflect pad costs a grouped
        # depthwise conv 2-3.4x on v5e (k4/s2 @976x128^2x64: 25.5 -> 8.9 ms
        # fwd, 70.9 -> 20.6 ms fwd+bwd measured; k3/s1 @64^2: 8.9 -> 4.5 /
        # 23.7 -> 8.6) — the implicit-zero bulk runs at fused-chain
        # bandwidth (~290 GB/s) while the padded-copy form sits at ~120.
        if (self.padding_mode == "reflect" and p == 1 and self.kernel_size == 3
                and self.stride == 1 and x.shape[1] >= 2 and x.shape[2] >= 2):
            conv = _SharedKernelConv3x3(
                features=self.features, use_bias=self.use_bias,
                feature_group_count=self.feature_group_count,
                dtype=self.dtype, name="conv")
            if pair_packed:
                assert x.shape[2] % 2 == 0, x.shape
                return _reflect_conv3x3_packed(conv, x)
            return _reflect_conv3x3(conv, x)
        assert not pair_packed, "pair_packed needs the k3/s1/p1 reflect form"
        if (self.padding_mode == "reflect" and p == 1 and self.kernel_size == 4
                and self.stride == 2
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and x.shape[1] >= 4 and x.shape[2] >= 4):
            conv = _SharedKernelConv4x4(
                features=self.features, use_bias=self.use_bias,
                feature_group_count=self.feature_group_count,
                dtype=self.dtype, name="conv")
            return _reflect_conv4x4_s2(conv, x)
        conv = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)) if implicit else "VALID",
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            name="conv",
        )
        if implicit:
            return conv(x)
        return conv(spatial_pad(x, p, self.padding_mode))


class ConvTranspose2d(nn.Module):
    """torch-exact ConvTranspose2d(k, s, p) as an input-dilated conv (NHWC).

    y = conv(dilate(x, s), flip(W), padding=k-1-p); reference decoder up-conv
    uses k=4, s=2, p=1 (/root/reference/src/backbones/conv.py:384-390), which
    exactly doubles spatial resolution.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        # Stored in forward-conv HWIO layout; spatially pre-flipped relative
        # to the torch (Cin, Cout, kh, kw) tensor at conversion time.
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, in_ch, self.features),
            jnp.float32,
        )
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        pad = k - 1 - p
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype or x.dtype),
            kernel.astype(self.dtype or x.dtype),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class TaggedGroupNorm(nn.GroupNorm):
    """``nn.GroupNorm`` with its (mean, var) statistics tagged as
    ``'gn_stats'`` for ``jax.checkpoint_policies.save_only_these_names``.

    Under the ``conv_out`` remat policy the conv outputs are stored but the
    GN/ReLU tails are recomputed in backward — including the full stats
    REDUCTION over each stored 0.5-2 GB conv output (one extra HBM read per
    norm unit, pure bandwidth). The stats are (N, groups) fp32 — ~32 KB per
    flagship level — so storing them is free and the backward recompute
    skips straight to the normalize/ReLU apply. Identical math: the body is
    flax's own ``GroupNorm.__call__`` flow with one identity tag inserted
    between ``_compute_stats`` and ``_normalize``.
    """

    @nn.compact
    def __call__(self, x, *, mask=None):
        # Private flax internals, written against flax 0.12's normalization
        # module; a flax upgrade that changes them is caught by the
        # bit-identity regression test (tests/test_reflect_conv.py asserts
        # TaggedGroupNorm == nn.GroupNorm to the last bit).
        from flax.linen.normalization import (
            _canonicalize_axes, _compute_stats, _normalize)

        reduction_axes = (self.reduction_axes if self.reduction_axes
                          is not None
                          else list(range(1, x.ndim - 1)) + [-1])
        feature_axis = -1
        reduction_axes = _canonicalize_axes(x.ndim, reduction_axes)
        channels = x.shape[-1]
        num_groups = self.num_groups
        if self.group_size is not None:
            num_groups = channels // self.group_size
        group_size = channels // num_groups
        group_shape = x.shape[:-1] + (num_groups, group_size)
        if mask is not None:
            mask = mask.reshape(mask.shape[:-1] + (num_groups, group_size))
        mean, var = _compute_stats(
            x.reshape(group_shape),
            list(reduction_axes[:-1]) + [-1],
            self.dtype, self.axis_name, self.axis_index_groups,
            use_fast_variance=self.use_fast_variance, mask=mask,
            force_float32_reductions=self.force_float32_reductions,
        )
        mean = jax.ad_checkpoint.checkpoint_name(mean, "gn_stats")
        var = jax.ad_checkpoint.checkpoint_name(var, "gn_stats")
        mean = jnp.repeat(mean, group_size, axis=-1)
        var = jnp.repeat(var, group_size, axis=-1)
        return _normalize(
            self, x, mean, var, reduction_axes[:-1], (feature_axis,),
            self.dtype, self.param_dtype, self.epsilon, self.use_bias,
            self.use_scale, self.bias_init, self.scale_init,
            self.force_float32_reductions,
        )


def make_norm(norm: str, n_groups: int = 4, dtype=None) -> Callable[..., nn.Module] | None:
    """Normalization factory matching the reference choices
    (/root/reference/src/backbones/conv.py:52-62)."""
    if norm == "batch":
        return lambda name=None: nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, use_running_average=None, dtype=dtype, name=name
        )
    if norm == "instance":
        # torch InstanceNorm2d default: affine=False, no running stats.
        return lambda name=None: nn.GroupNorm(
            num_groups=None, group_size=1, epsilon=1e-5,
            use_bias=False, use_scale=False, dtype=dtype, name=name,
        )
    if norm == "group":
        return lambda name=None: TaggedGroupNorm(
            num_groups=n_groups, epsilon=1e-5, dtype=dtype, name=name
        )
    return None


class DepthwiseSeparableConv2d(nn.Module):
    """Depthwise 3x3 + pointwise 1x1, both bias-free
    (/root/reference/src/backbones/conv.py:11-26)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    padding_mode: str = "zeros"
    stride: int = 1
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        x = Conv2d(
            features=in_ch, kernel_size=self.kernel_size, stride=self.stride,
            padding=self.padding, padding_mode=self.padding_mode,
            use_bias=False, feature_group_count=in_ch, dtype=self.dtype,
            name="depthwise",
        )(x)
        x = Conv2d(
            features=self.features, kernel_size=1, stride=1, padding=0,
            use_bias=False, dtype=self.dtype, name="pointwise",
        )(x)
        return x


class SqueezeAndExcitation(nn.Module):
    """Channel gating: GAP -> Linear(C, C/r) -> ReLU -> Linear -> sigmoid
    (/root/reference/src/backbones/squeeze_and_excitation.py:7-27)."""

    reduction_ratio: int = 16
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (N, C)
        y = nn.Dense(c // self.reduction_ratio, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class ConvLayer(nn.Module):
    """Stack of (conv -> norm -> ReLU) units, optional trailing SE gate
    (/root/reference/src/backbones/conv.py:29-96).

    ``nkernels`` lists successive channel widths *including* the input width,
    exactly like the reference. ``last_relu=False`` drops the ReLU after the
    final conv only.
    """

    nkernels: Sequence[int]
    norm: str = "batch"
    k: int = 3
    s: int = 1
    p: int = 1
    n_groups: int = 4
    last_relu: bool = True
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 packed_tail: bool = False, defer_tail_norm: bool = False):
        # packed_tail: emit the LAST unit in the lane-packed (N, H, W/2, 2C)
        # layout (pair conv + PackedPairGroupNorm + ReLU) so a fused-kernel
        # consumer reads full-width lanes with no relayout (see
        # _SharedKernelConv3x3.pair_packed). Same math as the unpacked tail.
        # defer_tail_norm (requires packed_tail): return the tail unit as
        # ``(z_raw, sc, sh)`` — the raw pair-conv output plus the per-frame
        # GroupNorm affine (N, 2C) — WITHOUT applying normalize/ReLU; the
        # fused L-TAE kernel applies ``max(z*sc+sh, 0)`` in VMEM, skipping
        # the materialized normalized copy (a ~2 GB HBM round-trip on the
        # flagship in_conv tail).
        if packed_tail:
            assert (self.conv_type == "2d" and self.norm == "group"
                    and self.k == 3 and self.s == 1 and self.p == 1
                    and self.padding_mode == "reflect" and self.last_relu
                    and not self.add_squeeze), "packed_tail unsupported here"
        assert not defer_tail_norm or packed_tail
        norm_fn = make_norm(self.norm, self.n_groups, self.dtype)
        n = len(self.nkernels) - 1
        for i in range(n):
            tail = packed_tail and i == n - 1
            if self.conv_type == "depthwise_separable":
                x = DepthwiseSeparableConv2d(
                    features=self.nkernels[i + 1], kernel_size=self.k,
                    padding=self.p, padding_mode=self.padding_mode,
                    stride=self.s, dtype=self.dtype, name=f"conv{i}",
                )(x)
            else:
                x = Conv2d(
                    features=self.nkernels[i + 1], kernel_size=self.k,
                    stride=self.s, padding=self.p, padding_mode=self.padding_mode,
                    dtype=self.dtype, name=f"conv{i}",
                )(x, pair_packed=tail)
            # Offloadable-rematerialization tag: under nn.remat with
            # policy=save_only_these_names('conv_out') the conv outputs are
            # STORED and only the cheap GroupNorm/ReLU tail is recomputed in
            # the backward pass (UTAE remat_policy='conv_out'). A no-op
            # identity everywhere else.
            x = jax.ad_checkpoint.checkpoint_name(x, "conv_out")
            if tail:
                gn = PackedPairGroupNorm(
                    features=self.nkernels[i + 1], num_groups=self.n_groups,
                    dtype=self.dtype, name=f"norm{i}")
                if defer_tail_norm:
                    sc, sh = gn(x, defer=True)
                    return x, sc, sh
                x = gn(x)
            elif norm_fn is not None:
                m = norm_fn(name=f"norm{i}")
                x = m(x, use_running_average=not train) if self.norm == "batch" else m(x)
            if self.last_relu or i < n - 1:
                x = nn.relu(x)
        if self.add_squeeze:
            x = SqueezeAndExcitation(dtype=self.dtype, name="se")(x)
        return x


class ConvBlock(nn.Module):
    """Resolution-preserving conv block (/root/reference/src/backbones/conv.py:168-200)."""

    nkernels: Sequence[int]
    norm: str = "batch"
    last_relu: bool = True
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 packed_tail: bool = False, defer_tail_norm: bool = False):
        return ConvLayer(
            nkernels=self.nkernels, norm=self.norm, last_relu=self.last_relu,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            add_squeeze=self.add_squeeze, dtype=self.dtype, name="conv",
        )(x, train=train, packed_tail=packed_tail,
          defer_tail_norm=defer_tail_norm)


class DownConvBlock(nn.Module):
    """Strided down conv + residual conv pair
    (/root/reference/src/backbones/conv.py:238-296): out = conv1(down(x));
    out = out + conv2(out)."""

    d_out: int
    k: int = 4
    s: int = 2
    p: int = 1
    norm: str = "batch"
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        x = ConvLayer(
            nkernels=(d_in, d_in), norm=self.norm, k=self.k, s=self.s, p=self.p,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            dtype=self.dtype, name="down",
        )(x, train=train)
        x = ConvLayer(
            nkernels=(d_in, self.d_out), norm=self.norm,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            dtype=self.dtype, name="conv1",
        )(x, train=train)
        x = x + ConvLayer(
            nkernels=(self.d_out, self.d_out), norm=self.norm,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            dtype=self.dtype, name="conv2",
        )(x, train=train)
        if self.add_squeeze:
            x = SqueezeAndExcitation(dtype=self.dtype, name="se")(x)
        return x


class UpConvBlock(nn.Module):
    """Decoder block (/root/reference/src/backbones/conv.py:362-413):
    deconv-up(x) ++ 1x1-conv(skip) -> conv1 -> +conv2 residual."""

    d_out: int
    k: int = 4
    s: int = 2
    p: int = 1
    norm: str = "batch"
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool = False) -> jax.Array:
        d_skip = skip.shape[-1]
        up = ConvTranspose2d(
            features=self.d_out, kernel_size=self.k, stride=self.s,
            padding=self.p, dtype=self.dtype, name="up_conv",
        )(x)
        up = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          name="up_norm")(up, use_running_average=not train)
        up = nn.relu(up)

        sk = Conv2d(features=d_skip, kernel_size=1, stride=1, padding=0,
                    dtype=self.dtype, name="skip_conv")(skip)
        sk = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          name="skip_norm")(sk, use_running_average=not train)
        sk = nn.relu(sk)

        out = jnp.concatenate([up, sk], axis=-1)
        out = ConvLayer(
            nkernels=(self.d_out + d_skip, self.d_out), norm=self.norm,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            dtype=self.dtype, name="conv1",
        )(out, train=train)
        out = out + ConvLayer(
            nkernels=(self.d_out, self.d_out), norm=self.norm,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            dtype=self.dtype, name="conv2",
        )(out, train=train)
        if self.add_squeeze:
            out = SqueezeAndExcitation(dtype=self.dtype, name="se")(out)
        return out


class MBConv(nn.Module):
    """Inverted-residual MBConv (expand 1x1 -> depthwise 3x3 -> SE -> project
    1x1), residual when shapes match (/root/reference/src/backbones/mbconv.py:25-96)."""

    d_out: int
    expansion: int = 4
    n_groups: int = 4
    add_squeeze: bool = True
    norm: str = "group"
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        wide = d_in * self.expansion
        norm_fn = make_norm(self.norm, self.n_groups, self.dtype)

        def apply_norm(h, name):
            if norm_fn is None:
                return h
            m = norm_fn(name=name)
            return m(h, use_running_average=not train) if self.norm == "batch" else m(h)

        h = Conv2d(features=wide, kernel_size=1, stride=1, padding=0,
                   dtype=self.dtype, name="expand")(x)
        h = nn.relu(apply_norm(h, "norm0"))
        h = Conv2d(features=wide, kernel_size=3, stride=1, padding=1,
                   padding_mode="reflect", feature_group_count=wide,
                   dtype=self.dtype, name="depthwise")(h)
        h = nn.relu(apply_norm(h, "norm1"))
        if self.add_squeeze:
            h = SqueezeAndExcitation(dtype=self.dtype, name="se")(h)
        h = Conv2d(features=self.d_out, kernel_size=1, stride=1, padding=0,
                   dtype=self.dtype, name="project")(h)
        h = apply_norm(h, "norm2")
        if d_in == self.d_out:
            h = h + x
        return h


class MBConvLayer(nn.Module):
    """Stack of MBConv units (/root/reference/src/backbones/mbconv.py:99-129)."""

    nkernels: Sequence[int]
    norm: str = "group"
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(len(self.nkernels) - 1):
            x = MBConv(d_out=self.nkernels[i + 1], norm=self.norm,
                       dtype=self.dtype, name=f"mbconv{i}")(x, train=train)
        return x


class MBConvBlock(nn.Module):
    """MBConv drop-in for ConvBlock (/root/reference/src/backbones/mbconv.py:132-152).

    ``padding_mode``/``conv_type``/``add_squeeze`` are accepted-and-ignored
    exactly like the reference's ``*args, **kwargs`` (mbconv.py:139-144):
    MBConv hard-codes reflect padding and always carries its own SE gate.
    """

    nkernels: Sequence[int]
    norm: str = "group"
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze: bool = False
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return MBConvLayer(nkernels=self.nkernels, norm=self.norm,
                           dtype=self.dtype, name="conv")(x, train=train)


class MBDownConvBlock(nn.Module):
    """MBConv drop-in for DownConvBlock (/root/reference/src/backbones/mbconv.py:155-198).
    Note: no residual add (reference uses plain conv2 after conv1)."""

    d_out: int
    k: int = 4
    s: int = 2
    p: int = 1
    norm: str = "batch"
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    add_squeeze: bool = False  # accepted-and-ignored (reference mbconv.py:169)
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        d_in = x.shape[-1]
        x = ConvLayer(
            nkernels=(d_in, d_in), norm=self.norm, k=self.k, s=self.s, p=self.p,
            padding_mode=self.padding_mode, conv_type=self.conv_type,
            dtype=self.dtype, name="down",
        )(x, train=train)
        x = MBConvLayer(nkernels=(d_in, self.d_out), norm=self.norm,
                        dtype=self.dtype, name="conv1")(x, train=train)
        x = MBConvLayer(nkernels=(self.d_out, self.d_out), norm=self.norm,
                        dtype=self.dtype, name="conv2")(x, train=train)
        return x


class MBUpConvBlock(nn.Module):
    """MBConv drop-in for UpConvBlock (/root/reference/src/backbones/mbconv.py:201-245).
    ``padding_mode``/``conv_type`` accepted-and-ignored like the reference."""

    d_out: int
    k: int = 4
    s: int = 2
    p: int = 1
    norm: str = "batch"
    padding_mode: str = "reflect"
    conv_type: str = "2d"
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, train: bool = False) -> jax.Array:
        d_skip = skip.shape[-1]
        up = ConvTranspose2d(features=self.d_out, kernel_size=self.k,
                             stride=self.s, padding=self.p, dtype=self.dtype,
                             name="up_conv")(x)
        up = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          name="up_norm")(up, use_running_average=not train)
        up = nn.relu(up)

        sk = Conv2d(features=d_skip, kernel_size=1, stride=1, padding=0,
                    dtype=self.dtype, name="skip_conv")(skip)
        sk = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          name="skip_norm")(sk, use_running_average=not train)
        sk = nn.relu(sk)

        out = jnp.concatenate([up, sk], axis=-1)
        out = MBConvLayer(nkernels=(self.d_out + d_skip, self.d_out),
                          norm=self.norm, dtype=self.dtype, name="conv1")(out, train=train)
        out = MBConvLayer(nkernels=(self.d_out, self.d_out), norm=self.norm,
                          dtype=self.dtype, name="conv2")(out, train=train)
        return out
