"""Patchify/stitch round-trip identities + whole-tile predictor."""
import jax
import jax.numpy as jnp
import numpy as np

from crop2seg_tpu.ops.patchify import (
    patchify_grid, unpatchify_grid, patchify_inference_tile,
    stitch_inference_tile)


def test_grid_roundtrip():
    x = jnp.arange(2 * 256 * 256 * 3).reshape(2, 256, 256, 3).astype(jnp.float32)
    p = patchify_grid(x, 128)
    assert p.shape == (4, 2, 128, 128, 3)
    back = unpatchify_grid(p, 2, 2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_patch_order_row_major():
    """Patch (i, j) of the grid must be tile[i*128:(i+1)*128, j*128:...]."""
    x = jnp.zeros((256, 256, 1)).at[128:, :128, :].set(7.0)  # grid cell (1,0)
    p = patchify_grid(x, 128)
    assert float(p[2].sum()) == 7.0 * 128 * 128  # row-major: idx = 1*2+0 = 2
    assert float(p[0].sum()) == 0.0


def test_inference_tile_shapes():
    t, c = 3, 2
    tile = jnp.ones((t, 1098, 1098, c))
    p = patchify_inference_tile(tile)
    assert p.shape == (100, t, 128, 128, c)
    # padding region is zero
    assert float(p[-1, :, -1, -1, :].sum()) == 0.0
    # stitch of per-patch constants recovers position
    vals = jnp.arange(100.0)[:, None, None, None] * jnp.ones((100, 128, 128, 1))
    full = stitch_inference_tile(vals)
    assert full.shape == (1098, 1098, 1)
    assert float(full[0, 0, 0]) == 0.0
    assert float(full[0, 1097, 0]) == 8.0   # row 0, col 8 (1097 // 128 = 8)
    assert float(full[1097, 0, 0]) == 80.0  # row 8, col 0


def test_whole_tile_predictor_tiny():
    """End-to-end predictor on a small fake 'tile' using a tiny UTAE."""
    from crop2seg_tpu.inference import make_tile_predictor
    from crop2seg_tpu.models import UTAE

    # minimal 2-stage UTAE: this test pins the 1098^2 <-> 100x128^2 patch
    # GEOMETRY and the predictor wiring, not model math (golden suites do
    # that) — the smaller graph keeps it in the fast gate (~66 s before)
    model = UTAE(input_dim=4, encoder_widths=(4, 8),
                 decoder_widths=(4, 8), out_conv=(4, 5), n_head=2,
                 d_model=8, d_k=2)
    t = 5
    tile = jax.random.normal(jax.random.PRNGKey(0), (t, 1098, 1098, 4)) \
        .astype(jnp.float32)
    dates = jnp.arange(t, dtype=jnp.float32) * 10
    x0 = jnp.zeros((2, t, 128, 128, 4))
    variables = model.init(jax.random.PRNGKey(1), x0,
                           jnp.tile(dates[None], (2, 1)), train=False)
    predict = make_tile_predictor(model, batch_size=50)
    out = predict(variables, tile, dates, length=t)
    assert out["proba"].shape == (1098, 1098, 5)
    assert out["classes"].shape == (1098, 1098)
    np.testing.assert_allclose(out["proba"].sum(-1), 1.0, atol=1e-4)
