"""Golden-parity tests: positional encoders, L-TAE, aggregator, full models.

Oracles generated from the reference torch modules in eval mode
(/root/reference/src/backbones/{tae,positional_encoding,temporal_aggregator,
utae,timeunet,wtae}.py) by scripts/make_golden.py.
"""
import jax.numpy as jnp
import numpy as np

from crop2seg_tpu.models import UTAE, TimeUNet, WTAE
from crop2seg_tpu.nn.aggregator import temporal_aggregate
from crop2seg_tpu.nn.ltae import LTAE, LTAE4WTAE
from crop2seg_tpu.nn.positional import AbsolutePositionalEncoder, PositionalEncoder
from crop2seg_tpu.utils import torch_convert as tc
import pytest
from tests.parity_utils import (
    assert_close, attn_from_torch, from_nhwc, load_fixture, to_nhwc_seq)

pytestmark = pytest.mark.slow  # full-model/golden tests: minutes on 1 core


def test_positional_encoder():
    arrays, sd = load_fixture("positional_encoder")
    m = PositionalEncoder(d_model=16, T=1000, repeat=4, add_linear=True)
    params = tc.convert_positional_encoder(sd, "", absolute=False)
    y = m.apply({"params": params}, jnp.asarray(arrays["dates"]))
    assert_close(np.asarray(y), arrays["y"], name="positional_encoder")


def test_abs_positional_encoder():
    arrays, sd = load_fixture("abs_positional_encoder")
    m = AbsolutePositionalEncoder(d_model=16, repeat=4)
    params = tc.convert_positional_encoder(sd, "", absolute=True)
    y = m.apply({"params": params}, jnp.asarray(arrays["doy"]))
    assert_close(np.asarray(y), arrays["y"], name="abs_positional_encoder")


def test_ltae():
    arrays, sd = load_fixture("ltae")
    m = LTAE(in_channels=32, n_head=8, d_k=4, mlp=(64, 16), d_model=64)
    variables = tc.convert_ltae(sd, "")
    y, attn = m.apply(
        variables, jnp.asarray(to_nhwc_seq(arrays["x"])),
        batch_positions=jnp.asarray(arrays["dates"]),
        pad_mask=jnp.asarray(arrays["pad_mask"]), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], name="ltae.out")
    assert_close(np.asarray(attn), attn_from_torch(arrays["attn"]),
                 name="ltae.attn")


def test_ltae4wtae():
    arrays, sd = load_fixture("ltae4wtae")
    m = LTAE4WTAE(in_channels=32, n_head=8, d_k=4, d_model=64)
    variables = tc.convert_ltae(sd, "", with_mlp=False)
    attn = m.apply(
        variables, jnp.asarray(to_nhwc_seq(arrays["x"])),
        batch_positions=jnp.asarray(arrays["dates"]),
        pad_mask=jnp.asarray(arrays["pad_mask"]), train=False)
    assert_close(np.asarray(attn), attn_from_torch(arrays["attn"]),
                 name="ltae4wtae.attn")


def _agg_case(name, mode):
    arrays, _ = load_fixture(name)
    y = temporal_aggregate(
        jnp.asarray(to_nhwc_seq(arrays["x"])),
        attn=jnp.asarray(attn_from_torch(arrays["attn"])),
        pad_mask=jnp.asarray(arrays["pad_mask"]), mode=mode)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], name=name)


def test_aggregator_att_group():
    _agg_case("aggregator_att_group", "att_group")


def test_aggregator_att_group_downsample():
    _agg_case("aggregator_att_group_down", "att_group")


def test_aggregator_att_mean():
    _agg_case("aggregator_att_mean", "att_mean")


def test_aggregator_mean():
    _agg_case("aggregator_mean", "mean")


UTAE_CFG = dict(input_dim=10, encoder_widths=(16, 16, 128),
                decoder_widths=(8, 16, 128), out_conv=(8, 5),
                n_head=4, d_model=256, d_k=4, pad_value=0.0)
SMALL_CFG = dict(input_dim=10, encoder_widths=(16, 16, 32),
                 decoder_widths=(8, 16, 32), out_conv=(8, 5),
                 n_head=4, d_model=32, d_k=4, pad_value=0.0)


def test_utae_full():
    arrays, sd = load_fixture("utae_small")
    m = UTAE(**UTAE_CFG)
    variables = tc.convert_utae(sd, n_stages=3)
    y = m.apply(variables, jnp.asarray(to_nhwc_seq(arrays["x"])),
                jnp.asarray(arrays["dates"]), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="utae")


def test_timeunet_full():
    arrays, sd = load_fixture("timeunet_small")
    m = TimeUNet(**SMALL_CFG)
    variables = tc.convert_timeunet(sd, n_stages=3)
    y = m.apply(variables, jnp.asarray(to_nhwc_seq(arrays["x"])),
                jnp.asarray(arrays["dates"]), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="timeunet")


def test_wtae_full():
    arrays, sd = load_fixture("wtae_small")
    m = WTAE(**SMALL_CFG, add_boundary_loss=True)
    variables = tc.convert_wtae(sd, n_stages=3, add_boundary=True)
    y, y_b = m.apply(variables, jnp.asarray(to_nhwc_seq(arrays["x"])),
                     jnp.asarray(arrays["dates"]), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="wtae")
    assert_close(from_nhwc(np.asarray(y_b)), arrays["y_b"], rtol=5e-4,
                 atol=5e-4, name="wtae.boundary")


def test_utae_boundary_absrel():
    arrays, sd = load_fixture("utae_boundary_absrel")
    m = UTAE(**UTAE_CFG, add_boundary_loss=True, use_abs_rel_enc=True)
    variables = tc.convert_utae(sd, n_stages=3, use_abs_rel_enc=True,
                                add_boundary=True)
    y, y_b = m.apply(variables, jnp.asarray(to_nhwc_seq(arrays["x"])),
                     jnp.asarray(arrays["dates"]), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="utae_absrel")
    assert_close(from_nhwc(np.asarray(y_b)), arrays["y_b"], rtol=5e-4,
                 atol=5e-4, name="utae_absrel.boundary")


def test_ltae_num_queries_shapes():
    """num_queries > 1 returns the rank-extended outputs
    (reference tae.py:490-499)."""
    m = LTAE(in_channels=16, n_head=4, d_k=4, mlp=(16, 8), d_model=16,
             num_queries=3)
    import jax
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4, 4, 16))
    dates = (jnp.arange(5) * 3.0)[None].repeat(2, 0)
    v = m.init(jax.random.PRNGKey(1), x, dates, train=False)
    out, attn = m.apply(v, x, dates, train=False)
    assert out.shape == (2, 3, 4, 4, 8)       # (B, nq, H, W, C)
    assert attn.shape == (2, 4, 4, 4, 3, 5)   # (B, H, W, head, nq, T)
