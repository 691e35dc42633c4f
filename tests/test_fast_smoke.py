"""Fast model smoke tests — tiny shapes, seconds on one core.

Keeps model/forward/train-step coverage inside the `-m "not slow"` CI
subset (the golden-parity suites are minutes each and marked slow).
"""
import jax
import jax.numpy as jnp
import numpy as np

B, T, H, W, C = 2, 5, 8, 8, 10
K = 6

_rng = np.random.default_rng(0)
_x = jnp.asarray(_rng.standard_normal((B, T, H, W, C)), jnp.float32)
_dates = jnp.asarray(
    np.tile(np.arange(T, dtype=np.float32)[None] * 7 + 3, (B, 1)))
_pad = jnp.asarray(np.array([[False] * T, [False] * (T - 2) + [True] * 2]))
_x = jnp.where(_pad[:, :, None, None, None], 0.0, _x)

_TINY = dict(input_dim=C, encoder_widths=(8, 8, 16), decoder_widths=(4, 8, 16),
             out_conv=(8, K), n_head=4, d_model=32, d_k=4)


def _run(model):
    v = model.init(jax.random.PRNGKey(1), _x, _dates, pad_mask=_pad,
                   train=False)
    y = model.apply(v, _x, _dates, pad_mask=_pad, train=False)
    return v, y


def test_utae_forward_smoke():
    from crop2seg_tpu.models import UTAE
    _, y = _run(UTAE(**_TINY))
    assert y.shape == (B, H, W, K) and bool(jnp.isfinite(y).all())


def test_timeunet_forward_smoke():
    from crop2seg_tpu.models import TimeUNet
    _, y = _run(TimeUNet(**_TINY))
    assert y.shape == (B, H, W, K) and bool(jnp.isfinite(y).all())


def test_wtae_forward_smoke():
    from crop2seg_tpu.models import WTAE
    _, y = _run(WTAE(**_TINY))
    assert y.shape == (B, H, W, K) and bool(jnp.isfinite(y).all())


def test_train_step_smoke():
    """One jitted train step stays in the fast gate; the remat-vs-plain
    loss-parity comparison lives in tests/test_remat_variants.py (slow) —
    it costs a second full backward compile (~75 s on one core)."""
    from crop2seg_tpu.learning import (
        StepConfig, create_train_state, make_train_step)
    from crop2seg_tpu.models import UTAE

    batch = {"x": _x, "dates": _dates, "pad_mask": _pad,
             "y": jnp.asarray(_rng.integers(0, K, (B, H, W)), jnp.int32)}
    cfg = StepConfig(num_classes=K)
    m = UTAE(**_TINY)
    v = m.init(jax.random.PRNGKey(1), _x, _dates, pad_mask=_pad,
               train=False)
    state = create_train_state(m, v, 1e-3)
    step = jax.jit(make_train_step(m, cfg))
    state, aux = step(state, batch, jax.random.PRNGKey(3))
    assert bool(jnp.isfinite(aux["loss"]))


def test_aggregator_bf16_matches_f32():
    """The aggregator resamples attention in the COMPUTE dtype (bf16 runs
    halve the upsampled-mask HBM traffic); the result must stay within bf16
    tolerance of the f32 path, and the f32 path itself is byte-stable."""
    from crop2seg_tpu.nn.aggregator import temporal_aggregate

    rng = np.random.default_rng(1)
    b, t, h, w, c, heads, ha = 2, 5, 16, 16, 8, 4, 4
    x = rng.standard_normal((b, t, h, w, c)).astype(np.float32)
    logits = rng.standard_normal((b, ha, ha, heads, t)).astype(np.float32)
    attn = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    pad = jnp.asarray(np.array([[False] * t, [False] * (t - 2) + [True] * 2]))

    for mode in ("att_group", "att_mean"):
        ref = temporal_aggregate(jnp.asarray(x), attn=attn, pad_mask=pad,
                                 mode=mode)
        got = temporal_aggregate(jnp.asarray(x, jnp.bfloat16), attn=attn,
                                 pad_mask=pad, mode=mode)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref), rtol=0.05,
            atol=0.05, err_msg=mode)
