"""Selective-remat knobs keep UTAE's math identical.

remat_down / remat_decoder / remat_policy='conv_out' (models/utae.py) only
change WHAT is stored vs recomputed in the backward pass — losses and every
parameter gradient must match the no-remat model exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crop2seg_tpu.models import UTAE

pytestmark = pytest.mark.slow  # 5 full-model compiles: ~4 min on 1 core
from crop2seg_tpu.nn.temporal import pad_mask_from_lengths

KW = dict(input_dim=4, encoder_widths=(4, 4, 8), decoder_widths=(4, 4, 8),
          out_conv=(4, 5), n_head=2, d_model=8, d_k=2)


def _setup():
    B, T, H = 2, 5, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H, H, 4)), jnp.float32)
    dates = jnp.asarray(
        np.tile(np.arange(T, dtype=np.float32)[None] * 5, (B, 1)))
    mask = pad_mask_from_lengths(jnp.asarray([T, T - 1]), T)
    x = x * (~mask).astype(jnp.float32)[:, :, None, None, None]
    ref = UTAE(**KW)
    v = ref.init(jax.random.PRNGKey(0), x, dates, pad_mask=mask, train=False)
    return ref, v, x, dates, mask


def _val_and_grad(model, v, x, dates, mask):
    def f(p):
        out = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                          x, dates, pad_mask=mask, train=False)
        return jnp.mean(out.astype(jnp.float32) ** 2)
    return jax.jit(jax.value_and_grad(f))(v["params"])


def test_remat_variants_grads_match():
    ref, v, x, dates, mask = _setup()
    l0, g0 = _val_and_grad(ref, v, x, dates, mask)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    for variant in (
            UTAE(remat=True, **KW),
            UTAE(remat=True, remat_down=False, **KW),
            UTAE(remat=True, remat_down=False, remat_decoder=False, **KW),
            UTAE(remat=True, remat_policy="conv_out", **KW)):
        l1, g1 = _val_and_grad(variant, v, x, dates, mask)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
        for path, a in flat0:
            np.testing.assert_allclose(
                np.asarray(flat1[path]), np.asarray(a), rtol=2e-4, atol=1e-6,
                err_msg=f"{variant.remat_policy} {jax.tree_util.keystr(path)}")
