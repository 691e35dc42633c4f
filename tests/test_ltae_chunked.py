"""Chunked-T (online-softmax) L-TAE training path vs the unchunked XLA path.

The seq_chunk path exists so TimeUNet — the reference's shipped, *trained*
model (timeunet.py:169-210) — fits one chip at B>=8: the (B*H*W, T, d_model)
embed is streamed through a rematerialized scan. These tests pin exactness:
forward AND gradients must match the unchunked path on CPU fp32.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crop2seg_tpu.nn.ltae import LTAE
from crop2seg_tpu.nn.temporal import pad_mask_from_lengths

B, T, H, W, C = 2, 13, 8, 8, 32
DM = 64


def _inputs(seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, H, W, C)).astype(dtype))
    dates = jnp.asarray(np.sort(rng.integers(0, 300, (B, T))).astype(dtype))
    mask = pad_mask_from_lengths(jnp.asarray([T, T - 4]), T)
    return x, dates, mask


def _ltae(seq_chunk=None, **kw):
    return LTAE(in_channels=C, d_model=DM, mlp=(DM, 16), n_head=8, d_k=4,
                dropout=0.0, attn_dropout=0.0, seq_chunk=seq_chunk, **kw)


@pytest.mark.parametrize("seq_chunk", [4, 5, 13])
def test_chunked_forward_matches(seq_chunk):
    """fp32 forward: tolerance sized for this deliberately tiny config —
    the final GroupNorm normalizes groups of TWO channels (mlp[-1]=16 over
    8 heads), which amplifies ~1e-6 attention fp noise ~100x. The strict
    exactness proof is the float64 test below (noise floor ~1e-11)."""
    x, dates, mask = _inputs()
    ref = _ltae()
    variables = ref.init(jax.random.PRNGKey(0), x, dates, pad_mask=mask,
                         train=False)
    out_ref, _ = ref.apply(variables, x, dates, pad_mask=mask, train=False,
                           need_attn=True)
    fast = _ltae(seq_chunk=seq_chunk)
    out_fast, attn = fast.apply(variables, x, dates, pad_mask=mask,
                                train=False, need_attn=False)
    assert attn is None
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=1e-3, atol=2e-4)


@pytest.mark.slow  # ~40 s: the f64 exactness proof; fp32 forward-match stays fast
def test_chunked_forward_and_grad_match_f64():
    """Exactness proof in float64 (fp-noise floor): forward AND parameter
    gradients of the scan+checkpoint path must equal the monolithic path."""
    jax.config.update("jax_enable_x64", True)
    try:
        x, dates, mask = _inputs(1, np.float64)
        ref = _ltae()
        fast = _ltae(seq_chunk=4)
        variables = ref.init(jax.random.PRNGKey(0), x, dates, pad_mask=mask,
                             train=False)
        params, bstats = variables["params"], variables["batch_stats"]

        out_ref, _ = ref.apply(variables, x, dates, pad_mask=mask,
                               train=False, need_attn=True)
        out_fast, _ = fast.apply(variables, x, dates, pad_mask=mask,
                                 train=False, need_attn=False)
        np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                                   rtol=1e-9, atol=1e-10)

        def loss(mod, p, need_attn):
            out, _ = mod.apply(
                {"params": p, "batch_stats": bstats}, x, dates, pad_mask=mask,
                train=True, need_attn=need_attn, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(9)})[0]
            return jnp.sum(jnp.sin(out))  # non-trivial cotangent

        g_ref = jax.grad(lambda p: loss(ref, p, True))(params)
        g_fast = jax.grad(lambda p: loss(fast, p, False))(params)
        flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
        flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fast)
        assert len(flat_r) == len(flat_f)
        for (path_r, vr), (_, vf) in zip(flat_r, flat_f):
            np.testing.assert_allclose(
                np.asarray(vf), np.asarray(vr), rtol=1e-7, atol=1e-10,
                err_msg=str(path_r))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_chunked_batchnorm_stats_match():
    """BatchNorm sees every pixel row in the chunked path too: the running
    statistics after one train-mode call must match the unchunked path."""
    x, dates, mask = _inputs(2)
    ref = _ltae()
    fast = _ltae(seq_chunk=5)
    variables = ref.init(jax.random.PRNGKey(0), x, dates, pad_mask=mask,
                         train=False)
    _, upd_ref = ref.apply(variables, x, dates, pad_mask=mask, train=True,
                           need_attn=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
    _, upd_fast = fast.apply(variables, x, dates, pad_mask=mask, train=True,
                             need_attn=False, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    for (pr, vr), (_, vf) in zip(
            jax.tree_util.tree_flatten_with_path(upd_ref["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(upd_fast["batch_stats"])[0]):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                                   rtol=1e-5, atol=1e-6, err_msg=str(pr))


@pytest.mark.slow  # ~115 s: full TimeUNet seq_chunk train compile
def test_chunked_timeunet_trains():
    """One jitted TimeUNet train step with seq_chunk: finite loss + grads."""
    from crop2seg_tpu.learning import (StepConfig, create_train_state,
                                       make_train_step)
    from crop2seg_tpu.models import TimeUNet

    model = TimeUNet(input_dim=10, encoder_widths=(8, 8, 16),
                     decoder_widths=(4, 8, 16), out_conv=(8, 15), n_head=4,
                     d_model=32, d_k=4, seq_chunk=4, remat=True)
    b, t, hw = 2, 9, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, hw, hw, 10))
    dates = (jnp.arange(t) * 5.0)[None, :].repeat(b, 0)
    mask = pad_mask_from_lengths(jnp.asarray([t, t - 2]), t)
    y = jax.random.randint(jax.random.PRNGKey(1), (b, hw, hw), 0, 15)
    variables = model.init(jax.random.PRNGKey(2), x, dates, pad_mask=mask,
                           train=False)
    cfg = StepConfig(num_classes=15)
    state = create_train_state(model, variables, 1e-3)
    step = jax.jit(make_train_step(model, cfg))
    batch = {"x": x, "dates": dates, "pad_mask": mask, "y": y}
    state, aux = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(aux["loss"]))
