"""TAE2d / TimeUNet_v2 / 3-D blocks / Exchanger UNet smoke + shape tests."""
import jax
import jax.numpy as jnp
import numpy as np

from crop2seg_tpu.nn.tae2d import TAE2d
from crop2seg_tpu.nn.blocks3d import (
    ConvBlock3D, DownConvBlock3D, TemporalAggregator3D)
from crop2seg_tpu.models.timeunet_v2 import TimeUNetV2
from crop2seg_tpu.models.unet_ex import UNetEx
from crop2seg_tpu.nn.temporal import pad_mask_from_lengths
import pytest


pytestmark = pytest.mark.slow  # full-model/golden tests: minutes on 1 core

B, T, H, W, C = 2, 6, 16, 16, 16


def _x(c=C):
    return jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, c))


def test_tae2d_lightweight_matches_ltae_shape():
    m = TAE2d(attention_type="lightweight", in_channels=C, n_head=4,
              d_k=4, d_model=32, mlp=(32, 16))
    x = _x()
    dates = (jnp.arange(T) * 9.0)[None].repeat(B, 0)
    pad = pad_mask_from_lengths(jnp.asarray([T, T - 2]), T)
    v = m.init(jax.random.PRNGKey(1), x, dates, pad_mask=pad, train=False)
    out, attn = m.apply(v, x, dates, pad_mask=pad, train=False)
    assert out.shape == (B, H, W, 16)
    assert attn.shape == (B, H, W, 4, T)
    # padded steps get ~zero attention
    assert float(attn[1, ..., T - 1].max()) < 1e-5


def test_tae2d_classical_mean_reduction():
    m = TAE2d(attention_type="classical", embedding_reduction="mean",
              attention_mask_reduction="mean", in_channels=C, n_head=4,
              d_k=4, d_model=32, mlp=(32, 16))
    x = _x()
    dates = (jnp.arange(T) * 9.0)[None].repeat(B, 0)
    v = m.init(jax.random.PRNGKey(1), x, dates, train=False)
    out, attn = m.apply(v, x, dates, train=False)
    assert out.shape == (B, H, W, 16)
    assert attn.shape == (B, H, W, 4, T)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-4)


def test_tae2d_classical_sequence():
    m = TAE2d(attention_type="classical", embedding_reduction=None,
              attention_mask_reduction=None, in_channels=C, n_head=4,
              d_k=4, d_model=32, mlp=(32, 16))
    x = _x()
    dates = (jnp.arange(T) * 9.0)[None].repeat(B, 0)
    v = m.init(jax.random.PRNGKey(1), x, dates, train=False)
    out, attn = m.apply(v, x, dates, train=False)
    assert out.shape == (B, T, H, W, 16)
    assert attn.shape == (B, H, W, 4, T, T)


def test_tae2d_classical_cls_reduction():
    m = TAE2d(attention_type="classical", embedding_reduction="cls",
              attention_mask_reduction="cls", num_cls_tokens=2,
              in_channels=C, n_head=4, d_k=4, d_model=32, mlp=(32, 16))
    x = _x()
    dates = (jnp.arange(T) * 9.0)[None].repeat(B, 0)
    v = m.init(jax.random.PRNGKey(1), x, dates, train=False)
    out, attn = m.apply(v, x, dates, train=False)
    assert out.shape == (B, H, W, 16)
    assert attn.shape[-1] == T  # cls columns stripped


def test_timeunet_v2_forward():
    m = TimeUNetV2(input_dim=10, encoder_widths=(8, 8, 16),
                   decoder_widths=(4, 8, 16), out_conv=(8, 15), n_head=4,
                   d_model=32, d_k=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, 10))
    dates = (jnp.arange(T) * 9.0)[None].repeat(B, 0)
    pad = pad_mask_from_lengths(jnp.asarray([T, T - 1]), T)
    v = m.init(jax.random.PRNGKey(1), x, dates, pad_mask=pad, train=False)
    out = m.apply(v, x, dates, pad_mask=pad, train=False)
    assert out.shape == (B, H, W, 15)
    assert bool(jnp.isfinite(out).all())


def test_blocks3d():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, 8))
    blk = ConvBlock3D(nkernels=(8, 12))
    v = blk.init(jax.random.PRNGKey(1), x, train=False)
    assert blk.apply(v, x, train=False).shape == (B, T, H, W, 12)
    down = DownConvBlock3D(d_out=12)
    v = down.init(jax.random.PRNGKey(1), x, train=False)
    assert down.apply(v, x, train=False).shape == (B, T, H // 2, W // 2, 12)


def test_temporal_aggregator3d():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, W, 8))
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(1), (B, H // 2, W // 2, 4, T)), -1)
    pad = pad_mask_from_lengths(jnp.asarray([T, T - 2]), T)
    agg = TemporalAggregator3D(mode="att_group")
    v = agg.init(jax.random.PRNGKey(2), x, attn, pad)
    out, up = agg.apply(v, x, attn, pad)
    assert out.shape == (B, H, W, 8)
    m = TemporalAggregator3D(mode="mean")
    out2, _ = m.apply({}, x, None, pad)
    assert out2.shape == (B, H, W, 8)


def test_unet_ex():
    m = UNetEx(base_channels=8, num_stages=3, strides=(1, 1, 1),
               enc_num_convs=(2, 2, 2), dec_num_convs=(2, 2),
               downsamples=(True, True), enc_dilations=(1, 1, 1),
               dec_dilations=(1, 1), num_classes=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 10))
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 32, 32, 5)


def test_timeunet_v2_patched_golden():
    """Numerical parity vs the PATCHED reference TimeUNet_v2 fixture
    (reference timeunet.py:214-429 is unconstructable as shipped; the
    fixture applies the three documented patches in
    scripts/make_golden.py::timeunet_v2_patched and keeps every reference
    parameter — see the module docstring there)."""
    from crop2seg_tpu.utils import torch_convert as tc
    from tests.parity_utils import (assert_close, from_nhwc, load_fixture,
                                    to_nhwc_seq)

    arrays, sd = load_fixture("timeunet_v2_patched")
    m = TimeUNetV2(input_dim=10, encoder_widths=(4, 4, 8),
                   decoder_widths=(2, 4, 8), out_conv=(2, 5),
                   n_head=4, d_model=16, d_k=4)
    variables = tc.convert_timeunet_v2(sd, n_stages=3)
    y = m.apply(variables, jnp.asarray(to_nhwc_seq(arrays["x"])),
                jnp.asarray(arrays["dates"]), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="timeunet_v2_patched")


def test_temporal_aggregator3d_downsample_and_head_mean_order():
    """attn finer than the skip avg-pools down (reference
    temporal_aggregator.py:111-115 — previously a reshape crash), and
    att_mean averages the HEAD MASKS first (reference :125-129), so at
    equal resolution the returned mask IS the head mean."""
    import jax

    from crop2seg_tpu.nn.blocks3d import TemporalAggregator3D

    b, t, hd = 1, 3, 2
    x = jnp.ones((b, t, 4, 4, 4), jnp.float32)
    attn = jax.random.uniform(jax.random.PRNGKey(0), (b, 8, 8, hd, t))
    agg = TemporalAggregator3D(mode="att_group")
    v = agg.init(jax.random.PRNGKey(1), x, attn)
    out, _ = agg.apply(v, x, attn)
    assert out.shape == (b, 4, 4, 4)

    attn2 = jax.random.uniform(jax.random.PRNGKey(2), (b, 4, 4, hd, t))
    aggm = TemporalAggregator3D(mode="att_mean")
    vm = aggm.init(jax.random.PRNGKey(3), x, attn2)
    outm, am = aggm.apply(vm, x, attn2)
    ref_mask = jnp.moveaxis(
        jnp.mean(jnp.transpose(attn2, (0, 3, 4, 1, 2)), axis=1), 1, 3)
    np.testing.assert_allclose(np.asarray(am), np.asarray(ref_mask),
                               rtol=1e-6)
    assert outm.shape == (b, 4, 4, 4)
