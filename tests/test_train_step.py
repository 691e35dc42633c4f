"""End-to-end jitted training on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np

from crop2seg_tpu.learning.trainer import (
    StepConfig, create_train_state, make_eval_step, make_train_step, run_epoch)
from crop2seg_tpu.learning.weight_init import apply_reference_init
from crop2seg_tpu.models import UTAE
from crop2seg_tpu.nn.temporal import pad_mask_from_lengths
from crop2seg_tpu.parallel import make_mesh, replicate, data_parallel_step
from crop2seg_tpu.parallel.mesh import data_parallel_eval
import pytest


pytestmark = pytest.mark.slow  # full-model/golden tests: minutes on 1 core

B, T, H, W, C, K = 8, 7, 16, 16, 10, 15


def _model_and_batch(boundary=False):
    model = UTAE(input_dim=C, encoder_widths=(8, 8, 16), decoder_widths=(4, 8, 16),
                 out_conv=(8, K), n_head=4, d_model=32, d_k=4,
                 add_boundary_loss=boundary)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, H, W, C))
    dates = (jnp.arange(T) * 5.0)[None, :].repeat(B, 0)
    lengths = jnp.asarray([T, T - 1, T - 2, T, T, T - 3, T, T])
    mask = pad_mask_from_lengths(lengths, T)
    y = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, K)
    batch = {"x": x, "dates": dates, "pad_mask": mask, "y": y}
    variables = model.init(jax.random.PRNGKey(2), x, dates, pad_mask=mask,
                           train=False)
    variables = apply_reference_init(variables, jax.random.PRNGKey(3))
    return model, variables, batch


def test_train_step_loss_decreases():
    model, variables, batch = _model_and_batch()
    cfg = StepConfig(num_classes=K, ignore_index=-1,
                     class_weights=tuple([0.0] + [1.0] * (K - 2) + [0.0]),
                     label_smoothing=0.1)
    state = create_train_state(model, variables, 1e-3)
    step = jax.jit(make_train_step(model, cfg))
    rng = jax.random.PRNGKey(4)
    losses = []
    for i in range(6):
        rng, sub = jax.random.split(rng)
        state, aux = step(state, batch, sub)
        losses.append(float(aux["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert np.asarray(aux["cm"]).sum() == B * H * W


def test_train_step_boundary_loss():
    model, variables, batch = _model_and_batch(boundary=True)
    cfg = StepConfig(num_classes=K, add_boundary_loss=True)
    state = create_train_state(model, variables, 1e-3)
    step = jax.jit(make_train_step(model, cfg))
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert np.isfinite(float(aux["loss_b"]))
    assert np.asarray(aux["cm_b"]).shape == (2, 2)


def test_data_parallel_mesh_8dev():
    """Same math under an 8-device data-parallel mesh; CM counts global."""
    model, variables, batch = _model_and_batch()
    cfg = StepConfig(num_classes=K)
    mesh = make_mesh(jax.devices("cpu")[:8])
    state = create_train_state(model, variables, 1e-3)
    state = replicate(state, mesh)
    step = data_parallel_step(make_train_step(model, cfg), mesh,
                              donate_state=False)
    state, aux = step(state, batch, jax.random.PRNGKey(0))
    assert np.asarray(aux["cm"]).sum() == B * H * W  # summed across devices
    # parity vs single-device step on the same inputs
    state1 = create_train_state(model, variables, 1e-3)
    step1 = jax.jit(make_train_step(model, cfg))
    state1, aux1 = step1(state1, batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(aux["cm"]), np.asarray(aux1["cm"]))
    np.testing.assert_allclose(float(aux["loss"]), float(aux1["loss"]),
                               rtol=2e-5)


def test_eval_epoch_loop():
    model, variables, batch = _model_and_batch()
    cfg = StepConfig(num_classes=K)
    state = create_train_state(model, variables, 1e-3)
    estep = jax.jit(make_eval_step(model, cfg))
    _, metrics, cms = run_epoch(estep, state, [batch, batch], cfg, mode="val")
    assert 0 <= metrics["val_accuracy"] <= 100
    assert cms["top1"].sum() == 2 * B * H * W
    assert metrics["val_IoU_top2"] >= metrics["val_IoU"] - 1e-9


def test_eval_with_homogenizer():
    """get_affine-style eval: host homogenizer rewrites predictions before
    the confusion matrix (reference learning/utils.py:341-361)."""
    model, variables, batch = _model_and_batch()
    cfg = StepConfig(num_classes=K)
    state = create_train_state(model, variables, 1e-3)
    estep = jax.jit(make_eval_step(model, cfg, return_pred=True))

    target_np = np.asarray(batch["y"])

    def perfect_homogenizer(pred, b):
        return target_np  # oracle: replaces predictions with ground truth

    _, metrics, _ = run_epoch(estep, state, [batch], cfg, mode="test",
                              homogenizer=perfect_homogenizer)
    assert metrics["test_accuracy"] == 100.0


def test_ragged_eval_batch_padding_on_mesh():
    """A final eval batch smaller than the mesh batch is padded with
    ignore-labeled duplicate rows (train.py to_host_batch): loss and the
    confusion matrix must be invariant vs the unpadded batch on one device
    (the weighted CE divides by sum(w[y]) and w[ignore]=0; the CM's ignore
    row is zeroed by the meter)."""
    import importlib.util
    import os
    path = os.path.join(os.path.dirname(__file__), "..", "train.py")
    spec = importlib.util.spec_from_file_location("c2s_train_cli_rg", path)
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)

    model, variables, batch = _model_and_batch()
    weights = [1.0] * K
    ignore_label = (-1) % K
    weights[ignore_label] = 0.0
    cfg = StepConfig(num_classes=K, ignore_index=-1,
                     class_weights=tuple(weights))
    state = create_train_state(model, variables, 1e-3)

    ragged = {k: np.asarray(v)[:5] for k, v in batch.items()}
    padded = cli.to_host_batch(dict(ragged), pad_to=8,
                               ignore_label=ignore_label)
    assert padded["y"].shape[0] == 8
    np.testing.assert_array_equal(padded["y"][5:], ignore_label)

    mesh = make_mesh(jax.devices("cpu")[:8])
    estep = data_parallel_eval(make_eval_step(model, cfg), mesh)
    aux_pad = estep(replicate(state, mesh), padded)

    estep1 = jax.jit(make_eval_step(model, cfg))
    aux_ref = estep1(state, ragged)

    np.testing.assert_allclose(float(aux_pad["loss"]), float(aux_ref["loss"]),
                               rtol=2e-5)
    cm_pad = np.array(aux_pad["cm"])
    cm_ref = np.array(aux_ref["cm"])
    # pad rows land only in the ignore row of the CM, which metrics zero out
    cm_pad[ignore_label, :] = 0
    cm_ref[ignore_label, :] = 0
    np.testing.assert_array_equal(cm_pad, cm_ref)


def test_checkpoint_restores_opt_state(tmp_path):
    """save_state stores the Adam moments; load_state(state=...) restores
    them with matching optax structure (the reference drops optimizer state
    on resume — train.py:459-460 commented out; we keep it)."""
    from crop2seg_tpu.learning import checkpoint as ckpt
    model, variables, batch = _model_and_batch()
    cfg = StepConfig(num_classes=K)
    state = create_train_state(model, variables, 1e-3)
    step = jax.jit(make_train_step(model, cfg))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    ckpt.save_state(str(tmp_path), state, epoch=1, best_miou=0.25)

    fresh = create_train_state(model, variables, 1e-3)
    payload = ckpt.load_state(str(tmp_path), state=fresh)
    restored = fresh.replace(params=payload["params"],
                             opt_state=payload["opt_state"])
    want = jax.tree_util.tree_leaves(state.opt_state)
    got = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(want) == len(got) and len(got) > 2
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(w), np.asarray(g), rtol=1e-6)
    # the moments are non-trivial (a step ran), not a fresh zero state
    mom = jax.tree_util.tree_leaves(restored.opt_state)
    assert any(np.abs(np.asarray(m)).max() > 0 for m in mom)
    # continuing from the restored state is numerically identical
    s_a, aux_a = step(state, batch, jax.random.PRNGKey(1))
    s_b, aux_b = step(restored, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(aux_a["loss"]), float(aux_b["loss"]),
                               rtol=1e-6)


def test_freeze_layers_zero_update():
    """create_train_state(frozen_prefixes=...): frozen leaves keep their
    exact values across steps while the rest train (the reference's
    fine-tune freezing intent, /root/reference/train.py:400-405, shipped
    commented out there)."""
    from flax import traverse_util

    model, variables, batch = _model_and_batch()
    cfg = StepConfig(num_classes=K)
    state = create_train_state(model, variables, 1e-3,
                               frozen_prefixes=("in_conv", "down"))
    step = jax.jit(make_train_step(model, cfg))
    p0 = traverse_util.flatten_dict(jax.device_get(state.params))
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    p1 = traverse_util.flatten_dict(jax.device_get(state.params))
    changed = frozen = 0
    for k in p0:
        path = "/".join(map(str, k))
        same = np.array_equal(np.asarray(p0[k]), np.asarray(p1[k]))
        if path.startswith(("in_conv", "down")):
            assert same, f"frozen leaf {path} changed"
            frozen += 1
        elif not same:
            changed += 1
    assert frozen > 0 and changed > 0
    # checkpoint round-trip keeps the multi_transform opt_state structure
    import tempfile
    from crop2seg_tpu.learning import checkpoint as ckpt
    with tempfile.TemporaryDirectory() as d:
        ckpt.save_state(d, state, epoch=1, best_miou=0.1)
        fresh = create_train_state(model, variables, 1e-3,
                                   frozen_prefixes=("in_conv", "down"))
        payload = ckpt.load_state(d, state=fresh)
        want = jax.tree_util.tree_leaves(state.opt_state)
        got = jax.tree_util.tree_leaves(payload["opt_state"])
        assert len(want) == len(got)


def test_bf16_train_step():
    """bf16 compute path: one step runs finite with fp32 params."""
    import jax.numpy as jnp
    from crop2seg_tpu.models import UTAE
    model = UTAE(input_dim=C, encoder_widths=(8, 8, 16),
                 decoder_widths=(4, 8, 16), out_conv=(8, K), n_head=4,
                 d_model=32, d_k=4, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, H, W, C))
    dates = (jnp.arange(T) * 5.0)[None, :].repeat(B, 0)
    mask = pad_mask_from_lengths(jnp.full((B,), T - 1), T)
    y = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, K)
    batch = {"x": x, "dates": dates, "pad_mask": mask, "y": y}
    variables = model.init(jax.random.PRNGKey(2), x, dates, pad_mask=mask,
                           train=False)
    # params stay fp32
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(variables["params"]))
    cfg = StepConfig(num_classes=K)
    state = create_train_state(model, variables, 1e-3)
    step = jax.jit(make_train_step(model, cfg))
    state, aux = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(aux["loss"]))


def test_patch_parallel_infer_matches_single_device():
    """Whole-tile patch-axis sharding (parallel.patch_parallel_infer): 16
    patches over the 8-device mesh must reproduce the single-device forward
    and stitch (SURVEY §5 multi-chip whole-tile inference)."""
    from crop2seg_tpu.ops.patchify import np_stitch_inference_tile
    from crop2seg_tpu.parallel.mesh import patch_parallel_infer

    model, variables, batch = _model_and_batch()
    n_patches = 16
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((n_patches, T, H, W, C)),
                     jnp.float32)
    pdates = jnp.tile(batch["dates"][:1], (n_patches, 1))
    pmask = jnp.tile(batch["pad_mask"][:1], (n_patches, 1))

    def tile_fwd(v, xb):
        return model.apply(v, xb, pdates, pad_mask=pmask, train=False)

    mesh = make_mesh(jax.devices("cpu")[:8])
    out_sh = np.asarray(patch_parallel_infer(tile_fwd, mesh)(variables, px))
    out_1d = np.asarray(jax.jit(tile_fwd)(variables, px))
    np.testing.assert_allclose(out_sh, out_1d, rtol=1e-4, atol=1e-5)
    side = 4 * H
    np.testing.assert_array_equal(
        np_stitch_inference_tile(out_sh.argmax(-1), out_hw=side),
        np_stitch_inference_tile(out_1d.argmax(-1), out_hw=side))

    # indivisible batch is rejected loudly
    with pytest.raises(ValueError):
        patch_parallel_infer(tile_fwd, mesh)(variables, px[:6])


def test_mesh_timeunet_pallas_train_step():
    """TimeUNet(use_pallas_train=True) under the data-parallel GSPMD mesh:
    the custom-VJP Pallas pool (packed producer + deferred tail norm +
    attention dropout via the interpret-mode RNG fallback) must execute and
    produce a finite loss on the 8-device CPU mesh — the combination
    `train.py --num_devices N --use_pallas_train` exercises."""
    import jax.numpy as jnp
    from crop2seg_tpu.models import TimeUNet
    from crop2seg_tpu.parallel import (
        data_parallel_step, make_mesh, replicate)

    mesh = make_mesh(jax.devices("cpu")[:8])
    model = TimeUNet(input_dim=10, encoder_widths=(8, 8, 16),
                     decoder_widths=(4, 8, 16), out_conv=(8, 15), n_head=4,
                     d_model=32, d_k=4, use_pallas_train=True)
    B, T, H, W, C = 8, 7, 16, 16, 10
    rng = np.random.default_rng(0)
    pad = np.zeros((B, T), bool)
    pad[:, T - 1] = True
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)), jnp.float32)
    x = x * (~jnp.asarray(pad)).astype(jnp.float32)[:, :, None, None, None]
    batch = {
        "x": x,
        "dates": jnp.asarray(
            np.tile(np.arange(T, dtype=np.float32)[None] * 5, (B, 1))),
        "pad_mask": jnp.asarray(pad),
        "y": jnp.asarray(rng.integers(0, 15, (B, H, W)), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(2), x[:1], batch["dates"][:1],
                           pad_mask=batch["pad_mask"][:1], train=False)
    cfg = StepConfig(num_classes=15,
                     class_weights=tuple([0.0] + [1.0] * 13 + [0.0]))
    state = replicate(create_train_state(model, variables, 1e-3), mesh)
    step = data_parallel_step(make_train_step(model, cfg), mesh,
                              donate_state=False)
    state, aux = step(state, batch, jax.random.PRNGKey(4))
    loss = float(aux["loss"])
    assert np.isfinite(loss)
    assert int(np.asarray(aux["cm"]).sum()) == B * H * W

    # GSPMD partitioning of the custom-VJP pallas_call must preserve the
    # math: the eval-mode loss (dropout off; use_pallas_train still routes
    # through the packed producer + ltae_pool_tail) has to match the plain
    # XLA model's loss on the same 8-device mesh (VERDICT r2 item 6).
    from crop2seg_tpu.learning import make_eval_step
    from crop2seg_tpu.parallel import data_parallel_eval

    xla_model = TimeUNet(input_dim=10, encoder_widths=(8, 8, 16),
                         decoder_widths=(4, 8, 16), out_conv=(8, 15),
                         n_head=4, d_model=32, d_k=4,
                         use_pallas_train=False)
    state0 = replicate(create_train_state(model, variables, 1e-3), mesh)
    eval_ker = data_parallel_eval(make_eval_step(model, cfg), mesh)
    eval_xla = data_parallel_eval(make_eval_step(xla_model, cfg), mesh)
    loss_ker = float(eval_ker(state0, batch)["loss"])
    loss_xla = float(eval_xla(state0, batch)["loss"])
    np.testing.assert_allclose(loss_ker, loss_xla, rtol=1e-5)
    # and the mesh result matches the single-device kernel path bit-for-bit
    loss_1d = float(jax.jit(make_eval_step(model, cfg))(
        create_train_state(model, variables, 1e-3), batch)["loss"])
    np.testing.assert_allclose(loss_ker, loss_1d, rtol=1e-5)
