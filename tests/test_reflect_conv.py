"""Decomposed reflect-pad conv == materialized reflect-pad conv, exactly.

Conv2d's k3/s1/p1 reflect path avoids the full-tensor padded copy (a ~10.6 ms
HBM pass on the 488-frame flagship in_conv chain, measured v5e) by running an
implicit-zero conv and recomputing only the 1-pixel edge rows/cols from
reflect-padded strips. The math must be identical to
torch.nn.Conv2d(padding_mode='reflect') == reflect-pad + VALID conv
(/root/reference/src/backbones/conv.py:70-80). Fast CPU test.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crop2seg_tpu.nn.layers import Conv2d, spatial_pad


def _reference_apply(params, x, features, use_bias=True):
    """Materialized reflect pad + VALID conv with the same kernel."""
    k = params["conv"]["kernel"]
    xp = spatial_pad(x, 1, "reflect")
    dn = jax.lax.conv_dimension_numbers(xp.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xp, k, (1, 1), "VALID",
                                     dimension_numbers=dn)
    if use_bias:
        y = y + params["conv"]["bias"]
    return y


@pytest.mark.parametrize("hw", [(2, 2), (2, 5), (5, 2), (7, 7), (16, 24)])
def test_exact_vs_materialized_pad(hw):
    h, w = hw
    m = Conv2d(features=6, kernel_size=3, stride=1, padding=1,
               padding_mode="reflect")
    x = jax.random.normal(jax.random.PRNGKey(0), (3, h, w, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x)
    got = m.apply(v, x)
    want = _reference_apply(v["params"], x, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_param_path_unchanged():
    """Checkpoint compatibility: the decomposed path keeps conv/kernel+bias
    with nn.Conv's HWIO layout (torch_convert + goldens depend on it)."""
    m = Conv2d(features=6, padding_mode="reflect")
    x = jnp.zeros((1, 8, 8, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    assert set(v["params"]["conv"]) == {"kernel", "bias"}
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 4, 6)
    # the decomposed k4/s2 path keeps the same naming too
    m2 = Conv2d(features=6, kernel_size=4, stride=2, padding=1,
                padding_mode="reflect")
    v2 = m2.init(jax.random.PRNGKey(0), x)
    assert set(v2["params"]["conv"]) == {"kernel", "bias"}
    assert v2["params"]["conv"]["kernel"].shape == (4, 4, 4, 6)


def _reference_apply_k4s2(params, x, use_bias=True):
    """Materialized reflect pad + VALID k4/s2 conv with the same kernel."""
    k = params["conv"]["kernel"]
    xp = spatial_pad(x, 1, "reflect")
    dn = jax.lax.conv_dimension_numbers(xp.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(xp, k, (2, 2), "VALID",
                                     dimension_numbers=dn)
    if use_bias:
        y = y + params["conv"]["bias"]
    return y


@pytest.mark.parametrize("hw", [(4, 4), (4, 8), (6, 4), (8, 8), (16, 24),
                                (5, 8), (8, 7)])
def test_k4s2_exact_vs_materialized_pad(hw):
    """The strided DownConvBlock 'down' conv (k4/s2/p1 reflect, reference
    conv.py:238-296): decomposed on even >=4 shapes, materialized fallback
    otherwise — both must equal reflect-pad + VALID."""
    h, w = hw
    m = Conv2d(features=6, kernel_size=4, stride=2, padding=1,
               padding_mode="reflect")
    x = jax.random.normal(jax.random.PRNGKey(6), (3, h, w, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(7), x)
    got = m.apply(v, x)
    want = _reference_apply_k4s2(v["params"], x, 6)
    assert got.shape == want.shape == (3, h // 2, w // 2, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_k4s2_gradients_match():
    m = Conv2d(features=5, kernel_size=4, stride=2, padding=1,
               padding_mode="reflect")
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 12, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(9), x)

    def loss_fast(v, x):
        return (m.apply(v, x) ** 2).sum()

    def loss_ref(v, x):
        return (_reference_apply_k4s2(v["params"], x) ** 2).sum()

    gv_a, gx_a = jax.grad(loss_fast, argnums=(0, 1))(v, x)
    gv_b, gx_b = jax.grad(loss_ref, argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gv_a),
                    jax.tree_util.tree_leaves(gv_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_gradients_match():
    m = Conv2d(features=5, padding_mode="reflect")
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 9, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(3), x)

    def loss_fast(v, x):
        return (m.apply(v, x) ** 2).sum()

    def loss_ref(v, x):
        return (_reference_apply(v["params"], x, 5) ** 2).sum()

    gv_a, gx_a = jax.grad(loss_fast, argnums=(0, 1))(v, x)
    gv_b, gx_b = jax.grad(loss_ref, argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gv_a),
                    jax.tree_util.tree_leaves(gv_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_dtype():
    m = Conv2d(features=8, padding_mode="reflect", dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 8, 4), jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(5), x)
    y = m.apply(v, x)
    assert y.dtype == jnp.bfloat16 and np.isfinite(
        np.asarray(y, np.float32)).all()


@pytest.mark.parametrize("hw", [(2, 2), (4, 6), (7, 8), (16, 24)])
def test_pair_packed_matches_unpacked(hw):
    """pair_packed=True (lane-packed (N, H, W/2, 2F) output) must equal the
    unpacked reflect conv space-to-depth'd along W — exactly, in fp32."""
    h, w = hw
    m = Conv2d(features=6, kernel_size=3, stride=1, padding=1,
               padding_mode="reflect")
    x = jax.random.normal(jax.random.PRNGKey(2), (3, h, w, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(3), x)
    want = np.asarray(m.apply(v, x)).reshape(3, h, w // 2, 12)
    got = np.asarray(m.apply(v, x, pair_packed=True))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_packed_tail_conv_layer_matches():
    """ConvLayer(packed_tail=True): last unit emits (N, H, W/2, 2C) with the
    pair conv + PackedPairGroupNorm + ReLU; must equal the unpacked layer."""
    from crop2seg_tpu.nn.layers import ConvLayer

    m = ConvLayer(nkernels=(4, 8, 8), norm="group",
                  padding_mode="reflect", conv_type="2d")
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 8, 10, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(5), x, False)
    want = np.asarray(m.apply(v, x, False))
    got = np.asarray(m.apply(v, x, False, packed_tail=True))
    assert got.shape == (3, 8, 5, 16)
    np.testing.assert_allclose(got.reshape(want.shape), want,
                               rtol=2e-5, atol=2e-5)


def test_defer_tail_norm_matches_applied():
    """ConvLayer(packed_tail=True, defer_tail_norm=True) returns
    (z_raw, sc, sh) whose deferred apply max(z*sc+sh, 0) equals the
    non-deferred packed tail output."""
    from crop2seg_tpu.nn.layers import ConvLayer

    m = ConvLayer(nkernels=(4, 8, 8), norm="group",
                  padding_mode="reflect", conv_type="2d")
    x = jax.random.normal(jax.random.PRNGKey(4), (3, 8, 10, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(5), x, False)
    want = np.asarray(m.apply(v, x, False, packed_tail=True))
    z, sc, sh = m.apply(v, x, False, True, True)
    assert z.shape == (3, 8, 5, 16) and sc.shape == (3, 16)
    got = np.maximum(np.asarray(z) * np.asarray(sc)[:, None, None, :]
                     + np.asarray(sh)[:, None, None, :], 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,s,hw", [(3, 1, (6, 8)), (3, 1, (2, 2)),
                                    (4, 2, (8, 12)), (4, 2, (4, 4))])
def test_grouped_depthwise_decomposed(k, s, hw):
    """Depthwise (feature_group_count=C) convs route through the decomposed
    reflect paths too (the materialized pad cost a grouped k4/s2 conv 2.9x
    fwd / 3.4x bwd on v5e) — must equal pad+VALID grouped conv exactly."""
    h, w = hw
    c = 8
    m = Conv2d(features=c, kernel_size=k, stride=s, padding=1,
               padding_mode="reflect", use_bias=False, feature_group_count=c)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, h, w, c), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x)
    got = m.apply(v, x)
    kn = v["params"]["conv"]["kernel"]
    assert kn.shape == (k, k, 1, c)  # checkpoint layout unchanged
    xp = spatial_pad(x, 1, "reflect")
    dn = jax.lax.conv_dimension_numbers(xp.shape, kn.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(xp, kn, (s, s), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_tagged_group_norm_matches_flax():
    """TaggedGroupNorm (gn_stats checkpoint tag for the conv_out remat
    policy) must be bit-identical to flax nn.GroupNorm."""
    from flax import linen as nn

    from crop2seg_tpu.nn.layers import TaggedGroupNorm

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 16), jnp.float32)
    a = nn.GroupNorm(num_groups=4, epsilon=1e-5)
    b = TaggedGroupNorm(num_groups=4, epsilon=1e-5)
    va = a.init(jax.random.PRNGKey(1), x)
    vb = b.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(va)
            == jax.tree_util.tree_structure(vb))
    assert bool((a.apply(va, x) == b.apply(va, x)).all())
    xb = x.astype(jnp.bfloat16)
    a16 = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.bfloat16)
    b16 = TaggedGroupNorm(num_groups=4, epsilon=1e-5, dtype=jnp.bfloat16)
    assert bool((a16.apply(va, xb) == b16.apply(va, xb)).all())
