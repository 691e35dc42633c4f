"""On-device preprocessing ops vs the host dataset transforms."""
import jax
import jax.numpy as jnp
import numpy as np

from crop2seg_tpu.ops.preprocess import (
    add_ndvi, augment_geometric, preprocess_batch, reorder_channels,
    standardize, temporal_dropout_mask)

B, T, H, W, C = 2, 5, 8, 8, 10


def test_reorder_matches_host():
    from crop2seg_tpu.data.s2tsczcrop import PASTIS_CHANNEL_ORDER
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (B, T, H, W, C)))
    got = np.asarray(reorder_channels(x))
    want = np.asarray(x)[..., list(PASTIS_CHANNEL_ORDER)]
    np.testing.assert_array_equal(got, want)


def test_ndvi_matches_host_formula():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 4000, (B, T, H, W, C)).astype(np.float32)
    x[0, 0, 0, 0, 6] = 0.0
    x[0, 0, 0, 0, 2] = 0.0   # undefined -> 0
    out = np.asarray(add_ndvi(jnp.asarray(x)))
    nir, red = x[..., 6], x[..., 2]
    denom = nir + red
    want = np.where(denom == 0, 0.0, (nir - red) / np.where(denom == 0, 1, denom))
    want = np.where((want < -1) | (want > 1), 0.0, want)
    np.testing.assert_allclose(out[..., -1], want, rtol=1e-6)
    assert out.shape[-1] == C + 1


def test_standardize_skip_last():
    x = jnp.ones((B, T, H, W, 3))
    mean = jnp.asarray([1.0, 1.0, 99.0])
    std = jnp.asarray([2.0, 2.0, 99.0])
    out = standardize(x, mean, std, skip_last=1)
    np.testing.assert_allclose(np.asarray(out[..., :2]), 0.0)
    np.testing.assert_allclose(np.asarray(out[..., 2]), 1.0)  # untouched


def test_augment_joint():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, T, H, W, 2)).astype(np.float32))
    # marker: y equals the argmax location pattern of channel 0 at t=0
    y = jnp.asarray((np.asarray(x)[:, 0, :, :, 0] > 0).astype(np.int32))
    x2, y2 = augment_geometric(x, y, jax.random.PRNGKey(3))
    # geometry stays joint: recompute the marker from the transformed image
    y2_expect = (np.asarray(x2)[:, 0, :, :, 0] > 0).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(y2), y2_expect)
    # at least one sample actually transformed
    assert not np.array_equal(np.asarray(x2), np.asarray(x))


def test_temporal_dropout_mask_never_empties():
    pad = jnp.zeros((8, T), bool).at[:, T - 1:].set(True)
    new = temporal_dropout_mask(pad, jax.random.PRNGKey(0), rate=0.95)
    assert bool((~np.asarray(new)).any(axis=1).all())  # every sample has a step
    assert np.asarray(new)[:, T - 1].all()             # pads stay padded


def test_preprocess_batch_end_to_end():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 4000, (B, T, H, W, C)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 15, (B, H, W)).astype(np.int32))
    pad = jnp.zeros((B, T), bool).at[1, 3:].set(True)
    mean = jnp.asarray(rng.uniform(100, 2000, C).astype(np.float32))
    std = jnp.asarray(rng.uniform(10, 500, C).astype(np.float32))
    fn = jax.jit(lambda x, y, m: preprocess_batch(
        x, mean, std, y=y, pad_mask=m, rng=jax.random.PRNGKey(0),
        reorder=True, ndvi=True, augment=True, temporal_dropout=0.2))
    out = fn(x, y, pad)
    assert out["x"].shape == (B, T, H, W, C + 1)
    # pads zeroed exactly
    np.testing.assert_array_equal(np.asarray(out["x"][1, 3:]), 0.0)
    assert out["pad_mask"].shape == (B, T)
    assert bool(np.asarray(out["pad_mask"])[1, 3:].all())


def test_temporal_dropout_never_unmasks_pads():
    """A length-1 sample whose only valid frame gets dropped must keep its
    PAD frames masked: cumsum(~pad)==1 alone also marks every trailing pad
    position, and un-dropping those would feed zero frames to attention as
    valid data. Only the first VALID position may be un-dropped."""
    import jax

    from crop2seg_tpu.ops.preprocess import temporal_dropout_mask

    pad = np.zeros((1, 8), bool)
    pad[0, 1:] = True  # length-1 sample
    # rate=1.0 guarantees the single valid step is dropped
    out = np.asarray(temporal_dropout_mask(jnp.asarray(pad),
                                           jax.random.PRNGKey(0), 1.0))
    assert not out[0, 0]          # the real frame is restored
    assert out[0, 1:].all()       # pads STAY pads
