"""Golden parity for the recurrent + 3-D families vs reference torch."""
import jax.numpy as jnp
import numpy as np

from crop2seg_tpu.models.convgru import ConvGRUSeg
from crop2seg_tpu.models.convlstm import BConvLSTMSeg, ConvLSTMSeg
from crop2seg_tpu.models.recunet import RecUNet
from crop2seg_tpu.models.unet3d import UNet3D
from crop2seg_tpu.utils import torch_convert as tc
from tests.parity_utils import assert_close, from_nhwc, load_fixture, to_nhwc_seq
import pytest


pytestmark = pytest.mark.slow  # full-model/golden tests: minutes on 1 core


def test_convlstm_seg_golden():
    arrays, sd = load_fixture("convlstm_seg")
    m = ConvLSTMSeg(num_classes=5, input_dim=10, hidden_dim=12, kernel_size=3)
    v = tc.convert_convlstm_seg(sd)
    y = m.apply(v, jnp.asarray(to_nhwc_seq(arrays["x"])), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="convlstm_seg")


def test_convgru_seg_golden():
    arrays, sd = load_fixture("convgru_seg")
    m = ConvGRUSeg(num_classes=5, input_dim=10, hidden_dim=12, kernel_size=3)
    v = tc.convert_convgru_seg(sd)
    y = m.apply(v, jnp.asarray(to_nhwc_seq(arrays["x"])), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="convgru_seg")


def test_bconvlstm_seg_golden():
    arrays, sd = load_fixture("bconvlstm_seg")
    m = BConvLSTMSeg(num_classes=5, input_dim=10, hidden_dim=12, kernel_size=3)
    v = tc.convert_bconvlstm_seg(sd)
    y = m.apply(v, jnp.asarray(to_nhwc_seq(arrays["x"])), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="bconvlstm_seg")


def test_unet3d_golden():
    arrays, sd = load_fixture("unet3d")
    m = UNet3D(in_channel=10, n_classes=5, feats=4, pad_value=0.0)
    v = tc.convert_unet3d(sd)
    y = m.apply(v, jnp.asarray(to_nhwc_seq(arrays["x"])), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=1e-3, atol=1e-3,
                 name="unet3d")


def test_recunet_golden():
    arrays, sd = load_fixture("recunet_lstm")
    m = RecUNet(input_dim=10, encoder_widths=(8, 8, 16),
                decoder_widths=(4, 8, 16), out_conv=(8, 5), temporal="lstm",
                encoder_norm="group", hidden_dim=12, padding_mode="reflect")
    v = tc.convert_recunet(sd, n_stages=3)
    y = m.apply(v, jnp.asarray(to_nhwc_seq(arrays["x"])), train=False)
    assert_close(from_nhwc(np.asarray(y)), arrays["y"], rtol=5e-4, atol=5e-4,
                 name="recunet")
