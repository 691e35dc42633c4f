#!/usr/bin/env python
"""Training / evaluation CLI for crop2seg_tpu.

Preserves the reference CLI surface (/root/reference/train.py:23-190 — same
flag names, defaults, list-string parsing, conf.json/resume/test contract)
while running a TPU-native stack: jitted train step over a jax.sharding data
mesh, fixed-T bucket batching, orbax checkpoints.

TPU-specific additions: --t_buckets, --bf16, --synthetic (run on a generated
miniature dataset), --platform.
"""
import argparse
import ast
import json
import logging
import os
import random
import time

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

parser = argparse.ArgumentParser()
# Model parameters (reference train.py:25-59)
parser.add_argument("--model", default="utae", type=str,
                    help="utae/wtae/timeunet/unet3d/convlstm/convgru/uconvlstm/unet_naive")
parser.add_argument("--encoder_widths", default="[64,64,64,128]", type=str)
parser.add_argument("--decoder_widths", default="[32,32,64,128]", type=str)
parser.add_argument("--out_conv", default="[32, 15]")
parser.add_argument("--str_conv_k", default=4, type=int)
parser.add_argument("--str_conv_s", default=2, type=int)
parser.add_argument("--str_conv_p", default=1, type=int)
parser.add_argument("--agg_mode", default="att_group", type=str)
parser.add_argument("--encoder_norm", default="group", type=str)
parser.add_argument("--n_head", default=16, type=int)
parser.add_argument("--d_model", default=256, type=int)
parser.add_argument("--d_k", default=4, type=int)
parser.add_argument("--input_dim", default=10, type=int)
parser.add_argument("--num_queries", default=1, type=int)
parser.add_argument("--temporal_dropout", default=0., type=float)
parser.add_argument("--augment", action="store_true")
parser.add_argument("--add_linear", action="store_true")
parser.add_argument("--add_boundary_loss", action="store_true")
parser.add_argument("--get_affine", action="store_true")
parser.add_argument("--max_temp", default=None, type=int)
parser.add_argument("--dataset", default="s2tsczcrops", type=str,
                    help="s2tsczcrops/pastis/synthetic")
# Set-up parameters (reference train.py:69-131)
parser.add_argument("--test", action="store_true")
parser.add_argument("--test_region", default="all")
parser.add_argument("--finetune", action="store_true")
parser.add_argument("--dataset_folder", default="", type=str)
parser.add_argument("--norm_values_folder", default="", type=str)
parser.add_argument("--weight_folder", default=None, type=str)
parser.add_argument("--res_dir", default="./results", type=str)
parser.add_argument("--rdm_seed", default=1, type=int)
parser.add_argument("--device", default="tpu", type=str,
                    help="kept for CLI compatibility; device choice is JAX's")
parser.add_argument("--display_step", default=50, type=int)
parser.add_argument("--cache", dest="cache", action="store_true")
# Training parameters (reference train.py:133-190)
parser.add_argument("--epochs", default=25, type=int)
parser.add_argument("--batch_size", default=4, type=int)
parser.add_argument("--lr", default=0.001, type=float)
parser.add_argument("--mono_date", default=None, type=str)
parser.add_argument("--ref_date", default="2018-09-01", type=str)
parser.add_argument("--fold", default=None, type=int)
parser.add_argument("--num_classes", default=15, type=int)
parser.add_argument("--ignore_index", default=-1, type=int)
parser.add_argument("--pad_value", default=0, type=float)
parser.add_argument("--padding_mode", default="reflect", type=str)
parser.add_argument("--conv_type", default="2d", type=str)
parser.add_argument("--use_mbconv", action="store_true")
parser.add_argument("--add_squeeze", action="store_true")
parser.add_argument("--use_doy", action="store_true")
parser.add_argument("--add_ndvi", action="store_true")
parser.add_argument("--use_abs_rel_enc", action="store_true")
parser.add_argument("--label_smoothing", default=0.0, type=float)
parser.add_argument("--val_every", default=1, type=int)
parser.add_argument("--val_after", default=0, type=int)
# TPU-native additions
parser.add_argument("--keep_ckpts", default=3, type=int,
                    help="retain the k best val-mIoU checkpoints "
                         "(async orbax writes; model.ckpt tracks the best)")
parser.add_argument("--t_buckets", default="[32,48,61]", type=str,
                    help="fixed temporal pad buckets (one compile per bucket)")
parser.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute dtype (params stay fp32)")
parser.add_argument("--remat", action="store_true",
                    help="activation checkpointing on the conv blocks "
                         "(recompute in backward; enables batch 16-32 bf16 "
                         "on one chip). Needed for UTAE at B>=16; TimeUNet "
                         "with --use_pallas_train trains ~12%% faster "
                         "WITHOUT it (the fused kernels already keep the "
                         "big embed out of HBM)")
parser.add_argument("--remat_policy", default="conv_out",
                    choices=["conv_out", "full"],
                    help="with --remat on UTAE: 'conv_out' stores each conv "
                         "output and recomputes only the GroupNorm/ReLU "
                         "tails in backward (7%% faster at B=16 bf16, "
                         "identical grads); 'full' recomputes everything "
                         "(lowest memory)")
parser.add_argument("--num_devices", default=None, type=int,
                    help="train data-parallel over a mesh of the first N "
                         "devices (params replicated, batch sharded, GSPMD "
                         "gradient all-reduce over ICI)")
parser.add_argument("--platform", default=None, type=str,
                    help="pin the JAX default device / mesh devices to this "
                         "platform (e.g. 'cpu' for the virtual host mesh)")
parser.add_argument("--profile", default=None, type=str, metavar="DIR",
                    help="capture a jax.profiler trace of epoch 1 into DIR "
                         "(view with tensorboard or xprof)")
parser.add_argument("--use_pallas", default="auto", type=str,
                    choices=("auto", "true", "false"),
                    help="fused Pallas L-TAE kernel on the eval/inference "
                         "path (training always takes the XLA path; the "
                         "kernel is forward-only). 'auto' = on when the run "
                         "executes on a TPU backend")
parser.add_argument("--use_pallas_train", action="store_true",
                    help="fused custom-VJP Pallas L-TAE kernels on the "
                         "TRAINING path (TimeUNet only, TPU only): forward "
                         "and backward keep the (B*H*W, T, d_model) embed "
                         "in VMEM — faster and leaner than --seq_chunk")
parser.add_argument("--seq_chunk", default=None, type=int,
                    help="stream the full-resolution L-TAE over T in chunks "
                         "of this many steps (TimeUNet only): a "
                         "rematerialized online-softmax scan that makes "
                         "TimeUNet trainable at B>=8 bf16 on one chip "
                         "(nn/ltae.py seq_chunk)")
parser.add_argument("--synthetic_patches", default=12, type=int)
parser.add_argument("--freeze_layers", default=None, type=str,
                    help="comma-separated module-path prefixes to freeze "
                         "during (fine-)tuning, e.g. 'in_conv,down' freezes "
                         "the spatial encoder (the reference sketches this "
                         "at train.py:400-405 but ships it commented out; "
                         "here it is real via optax.multi_transform)")
parser.add_argument("--use_weighted_sampling", action="store_true",
                    help="weighted random sampling with replacement from the "
                         "metadata 'weight' column (the reference builds this "
                         "sampler at train.py:340-344)")
parser.add_argument("--device_cache", action="store_true",
                    help="keep the train/val sets resident in device HBM "
                         "after epoch 1: later epochs draw a fresh "
                         "per-sample shuffle and assemble batches by "
                         "on-device gather from per-bucket stacks "
                         "(single-device runs, dataset must fit in HBM, "
                         "augmentation frozen at its epoch-1 draw — see "
                         "data.DeviceCacheLoader). Removes the per-epoch "
                         "host->device transfer, which dominates when the "
                         "host link is slow")

LIST_ARGS = ("encoder_widths", "decoder_widths", "out_conv", "t_buckets")


def parse_config(argv=None):
    config = parser.parse_args(argv)
    for name in LIST_ARGS:
        v = getattr(config, name)
        if isinstance(v, str):
            setattr(config, name, list(ast.literal_eval(v)))
    return config


# PASTIS 5-fold cross-validation splits (reference train.py:208-214):
# fold k trains on 3 folds, validates on 1, tests on 1.
PASTIS_FOLD_SEQUENCE = (
    ((1, 2, 3), (4,), (5,)),
    ((2, 3, 4), (5,), (1,)),
    ((3, 4, 5), (1,), (2,)),
    ((4, 5, 1), (2,), (3,)),
    ((5, 1, 2), (3,), (4,)),
)


def build_datasets(config):
    from crop2seg_tpu.data import (
        S2TSCZCropDataset, Transform, load_norm_values, make_synthetic_dataset)

    folder = config.dataset_folder
    if config.dataset == "synthetic":
        folder = folder or os.path.join(config.res_dir, "synthetic_data")
        if not os.path.exists(os.path.join(folder, "metadata.json")):
            make_synthetic_dataset(folder, n_patches=config.synthetic_patches)
    norm_folder = config.norm_values_folder or folder
    norm_path = os.path.join(norm_folder, "NORM_S2_patch.json")

    common = dict(
        folder=folder,
        reference_date=config.ref_date, mono_date=config.mono_date,
        use_doy=config.use_doy, use_abs_rel_enc=config.use_abs_rel_enc,
        add_ndvi=config.add_ndvi, get_affine=config.get_affine,
        cache=config.cache, seed=config.rdm_seed,
    )
    train_tr = Transform() if config.augment else None
    if config.dataset == "pastis":
        from crop2seg_tpu.data.pastis import PASTISDataset
        train_f, val_f, test_f = PASTIS_FOLD_SEQUENCE[(config.fold or 1) - 1]
        # normalize with the training folds' statistics (ref train.py:283-286)
        norm_values = load_norm_values(norm_path, folds=train_f) \
            if os.path.exists(norm_path) else None
        common.update(norm=norm_values is not None, norm_values=norm_values)
        mk = lambda st, tr=None, td=0.0, fs=None: PASTISDataset(
            set_type=st, folds=fs, transform=tr, temporal_dropout=td, **common)
        return (mk("train", train_tr, config.temporal_dropout, train_f),
                mk("val", fs=val_f), mk("test", fs=test_f))
    norm_values = load_norm_values(norm_path) if os.path.exists(norm_path) \
        else None
    common.update(norm=norm_values is not None, norm_values=norm_values)
    mk = lambda st, tr=None, td=0.0: S2TSCZCropDataset(
        set_type=st, transform=tr, temporal_dropout=td, **common)
    return (mk("train", train_tr, config.temporal_dropout), mk("val"),
            mk("test"))


BATCH_KEYS = ("x", "dates", "pad_mask", "y")


def to_device_batch(batch):
    import jax.numpy as jnp
    return {k: jnp.asarray(v) for k, v in batch.items() if k in BATCH_KEYS}


def to_host_batch(batch, pad_to=None, ignore_label=None):
    """Numpy batch (for mesh sharding via device_put), optionally padded to a
    fixed leading dim so every eval batch shards evenly over the mesh.

    Pad rows duplicate sample 0 (numerically benign) with targets set to the
    ignore label: the weighted CE divides by sum(w[y]) and the IoU meter
    zeroes the ignore row/col, so padding changes neither loss nor metrics.
    """
    out = {k: np.asarray(v) for k, v in batch.items() if k in BATCH_KEYS}
    b = out["y"].shape[0]
    if pad_to is not None and b < pad_to:
        idx = np.concatenate([np.arange(b), np.zeros(pad_to - b, np.int64)])
        out = {k: v[idx] for k, v in out.items()}
        out["y"] = out["y"].copy()
        out["y"][b:] = ignore_label
    return out


def merge_pretrained(fresh, loaded):
    """Merge pretrained variables into a fresh init, keeping the fresh leaf
    wherever the pretrained shape mismatches (head-swap fine-tuning).
    Returns (variables, [skipped 'collection/path' strings])."""
    import jax

    skipped = []

    def walk(dst, src, prefix):
        out = {}
        for k, v in dst.items():
            if k not in src:
                out[k] = v
                skipped.append(f"{prefix}{k} (missing)")
            elif isinstance(v, dict):
                out[k] = walk(v, src[k], f"{prefix}{k}/")
            elif jax.numpy.shape(src[k]) == jax.numpy.shape(v):
                out[k] = src[k]
            else:
                out[k] = v
                skipped.append(f"{prefix}{k}")
        return out

    merged = {c: walk(fresh[c], loaded.get(c, {}), f"{c}/") for c in fresh}
    return merged, skipped


def resolve_use_pallas(config) -> bool:
    """'auto' -> fused Pallas L-TAE kernel on when the run executes on a TPU
    backend (the kernel is Mosaic/TPU-only and forward-only; the LTAE module
    gates it to eval internally, so enabling it never affects training math).
    This makes `train.py --test` — the mIoU-parity eval path — take the fast
    kernel by default on TPU (reference eval path: train.py:217-269)."""
    import jax

    val = str(getattr(config, "use_pallas", "auto")).lower()
    if val in ("true", "1"):
        return True
    if val in ("false", "0", "none"):
        return False
    backend = config.platform or jax.default_backend()
    return backend not in ("cpu",)


def main(config):
    import jax
    import jax.numpy as jnp

    from crop2seg_tpu.data import BatchLoader
    from crop2seg_tpu.learning import (
        StepConfig, apply_reference_init, create_train_state, make_eval_step,
        make_train_step, run_epoch)
    from crop2seg_tpu.learning import checkpoint as ckpt
    from crop2seg_tpu.models.factory import get_model

    # Persistent compilation cache (verified to work through the axon TPU
    # relay): a resumed/repeated run skips the 30-60 s per-graph compiles.
    cache_dir = os.environ.get("C2S_JAX_CACHE", "/tmp/c2s_jax_cache")
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    if config.platform:
        jax.config.update("jax_default_device",
                          jax.devices(config.platform)[0])

    random.seed(config.rdm_seed)
    np.random.seed(config.rdm_seed)
    rng = jax.random.PRNGKey(config.rdm_seed)

    is_test_run = config.test
    fold = config.fold or 1
    config.fold = fold

    # resume/test: conf.json from weight_folder wins (reference :246-254).
    # Fine-tuning keeps the NEW CLI config (reference :245,270: the conf
    # merge is skipped when finetuning) so the head/classes may change.
    if config.weight_folder and not config.finetune:
        conf_path = os.path.join(config.weight_folder, "conf.json")
        if os.path.exists(conf_path):
            stored = ckpt.load_conf(config.weight_folder)
            keep = {"dataset_folder", "norm_values_folder", "res_dir",
                    "weight_folder", "test", "test_region", "finetune",
                    "epochs", "batch_size", "num_devices"}
            for k, v in stored.items():
                if k not in keep and hasattr(config, k):
                    setattr(config, k, v)

    os.makedirs(config.res_dir, exist_ok=True)
    fold_dir = ckpt.prepare_output(config.res_dir, fold)
    ckpt.save_conf(config.res_dir, vars(config))

    dt_train, dt_val, dt_test = build_datasets(config)
    logging.info("train/val/test sizes: %d/%d/%d",
                 len(dt_train), len(dt_val), len(dt_test))

    loader_kw = dict(t_buckets=tuple(config.t_buckets),
                     pad_value=config.pad_value)
    sample_weights = None
    if config.use_weighted_sampling and "weight" in dt_train.meta_patch:
        sample_weights = dt_train.meta_patch["weight"].fillna(1.0).values
    from crop2seg_tpu.data import DeviceCacheLoader, PrefetchLoader
    train_loader = PrefetchLoader(BatchLoader(
        dt_train, config.batch_size, shuffle=True, drop_last=True,
        seed=config.rdm_seed, sample_weights=sample_weights, **loader_kw))
    val_loader = BatchLoader(dt_val, config.batch_size, shuffle=False,
                             drop_last=False, **loader_kw)
    test_loader = BatchLoader(dt_test, config.batch_size, shuffle=False,
                              drop_last=False, **loader_kw)
    if config.device_cache and (config.num_devices or 1) == 1:
        if config.augment:
            logging.warning("--device_cache freezes augmentation at its "
                            "epoch-1 draw; leave it off for augmented runs")
        if config.use_weighted_sampling:
            logging.warning("--device_cache freezes the weighted sampler at "
                            "its epoch-1 draw: epochs 2+ reshuffle that "
                            "fixed sample multiset instead of re-drawing "
                            "with replacement each epoch")
        cast = jnp.bfloat16 if config.bf16 else None
        train_loader = DeviceCacheLoader(train_loader, cast=cast,
                                         shuffle=True, seed=config.rdm_seed)
        val_loader = DeviceCacheLoader(val_loader, cast=cast, shuffle=False)
    elif config.device_cache:
        logging.warning("--device_cache is single-device only; ignoring it "
                        "for the %d-device mesh run", config.num_devices)

    if config.bf16:
        config_dtype = jnp.bfloat16
    else:
        config_dtype = None
    model_cfg = dict(vars(config))
    model_cfg["dtype"] = config_dtype
    model_cfg["use_pallas"] = resolve_use_pallas(config)
    model = get_model(model_cfg)

    # init from a B=1 slice of a sample batch, under jit: params are
    # batch-independent, an UNJITTED init dispatches the whole forward as
    # eager ops (minutes through a TPU relay; observed 357 s vs 18 s jitted)
    # and the eager/monolithic path would materialize TimeUNet's full-res
    # L-TAE embed at full batch (OOM at B=16). Same treatment as bench.py.
    sample = to_device_batch(next(iter(val_loader if is_test_run else train_loader)))
    rng, init_rng, winit_rng = jax.random.split(rng, 3)
    variables = jax.jit(
        lambda k, x, d, m: model.init(k, x, d, pad_mask=m, train=False)
    )(init_rng, sample["x"][:1], sample["dates"][:1], sample["pad_mask"][:1])

    start_epoch, best_miou, trainlog = 1, 0.0, {}
    resume_opt_dir = None
    if config.weight_folder:
        torch_path = os.path.join(config.weight_folder, f"Fold_{fold}",
                                  "model.pth.tar")
        if ckpt.has_state(os.path.join(config.weight_folder, f"Fold_{fold}")):
            payload = ckpt.load_state(os.path.join(config.weight_folder,
                                                   f"Fold_{fold}"))
            loaded = {"params": payload["params"],
                      "batch_stats": payload.get("batch_stats", {})}
            logging.info("restored orbax checkpoint (epoch %s, best %s)",
                         payload["meta"]["epoch"], payload["meta"]["best_mIoU"])
            if not is_test_run and not config.finetune:
                # resume: continue from the stored epoch + trainlog
                # (reference train.py:255-269)
                start_epoch = int(payload["meta"]["epoch"]) + 1
                best_miou = float(payload["meta"]["best_mIoU"])
                resume_opt_dir = os.path.join(config.weight_folder,
                                              f"Fold_{fold}")
                log_path = os.path.join(config.weight_folder, f"Fold_{fold}",
                                        "trainlog.json")
                if os.path.exists(log_path):
                    trainlog = {int(k): v for k, v in
                                json.load(open(log_path)).items()}
        elif os.path.exists(torch_path):
            loaded = ckpt.load_torch_checkpoint(
                torch_path, config.model,
                n_stages=len(config.encoder_widths),
                use_doy=config.use_doy, add_linear=config.add_linear,
                use_abs_rel_enc=config.use_abs_rel_enc,
                add_boundary=config.add_boundary_loss)
            logging.info("imported reference torch checkpoint %s", torch_path)
        else:
            raise FileNotFoundError(f"no checkpoint under {config.weight_folder}")
        if config.finetune:
            # Fine-tune: fresh init + merge every shape-compatible pretrained
            # leaf; mismatched leaves (e.g. the classifier head when
            # num_classes changes, PASTIS 20 -> S2TSCzCrop 15) stay fresh.
            # The reference intends this at train.py:394-425 (commented out);
            # we implement it for real.
            variables = apply_reference_init(variables, winit_rng)
            variables, skipped = merge_pretrained(variables, loaded)
            for path in skipped:
                logging.info("finetune: keeping fresh init for %s "
                             "(shape mismatch)", path)
        else:
            variables = loaded
    else:
        variables = apply_reference_init(variables, winit_rng)

    weights = [1.0] * config.num_classes
    weights[config.ignore_index] = 0.0
    step_cfg = StepConfig(
        num_classes=config.num_classes, ignore_index=config.ignore_index,
        class_weights=tuple(weights), label_smoothing=config.label_smoothing,
        add_boundary_loss=config.add_boundary_loss,
        test_region="all")
    frozen = tuple(p.strip() for p in (config.freeze_layers or "").split(",")
                   if p.strip())
    if frozen:
        from crop2seg_tpu.learning.trainer import freeze_labels
        from flax import traverse_util
        labels = traverse_util.flatten_dict(
            freeze_labels(variables["params"], frozen))
        n_frozen = sum(1 for v in labels.values() if v == "frozen")
        logging.info("freezing %d/%d param leaves (prefixes: %s)",
                     n_frozen, len(labels), ", ".join(frozen))
    state = create_train_state(model, variables, config.lr,
                               frozen_prefixes=frozen)
    if resume_opt_dir is not None:
        # Restore the Adam moments too (checkpoint.save_state stores them).
        # The reference drops optimizer state on resume (train.py:459-460
        # commented out) — a resume there silently restarts the moments; we
        # restore them with a structured template so Adam continues exactly.
        # Probe the saved tree first: a converted torch release carries no
        # opt_state on purpose (checkpoint.save_converted) and must start
        # Adam fresh, but a genuine restore failure (corrupt dir, orbax
        # mismatch) must be loud — not silently reset the moments.
        if ckpt.has_opt_state(resume_opt_dir):
            payload = ckpt.load_state(resume_opt_dir, state=state)
            state = state.replace(opt_state=payload["opt_state"])
            logging.info("restored optimizer state (Adam moments + step count)")
        else:
            logging.warning("checkpoint carries no optimizer state "
                            "(converted torch release); Adam starts fresh "
                            "like the reference resume")

    # Data-parallel mesh (SURVEY.md §2.7 item 1; replaces the reference's
    # single-device loop at /root/reference/train.py:447,480-544).
    n_dev = config.num_devices or 1
    mesh = None
    if n_dev > 1:
        from crop2seg_tpu.parallel import (
            data_parallel_eval, data_parallel_step, make_mesh, replicate)
        devices = jax.devices(config.platform) if config.platform \
            else jax.devices()
        if len(devices) < n_dev:
            raise SystemExit(
                f"--num_devices {n_dev} but only {len(devices)} "
                f"{config.platform or 'default'} devices are visible")
        if config.batch_size % n_dev:
            raise SystemExit("--batch_size must be divisible by --num_devices")
        mesh = make_mesh(devices[:n_dev])
        logging.info("data-parallel mesh over %d %s devices", n_dev,
                     mesh.devices.flat[0].platform)
        state = replicate(state, mesh)
        train_step = data_parallel_step(make_train_step(model, step_cfg), mesh,
                                        donate_state=False)
        eval_step = data_parallel_eval(make_eval_step(model, step_cfg), mesh)
        # eval batches pad to a fixed B so they shard evenly
        ignore_label = config.ignore_index % config.num_classes
        make_train_batch = to_host_batch
        make_eval_batch = lambda b: to_host_batch(
            b, pad_to=config.batch_size, ignore_label=ignore_label)
    else:
        train_step = jax.jit(make_train_step(model, step_cfg))
        eval_step = jax.jit(make_eval_step(model, step_cfg))
        make_train_batch = make_eval_batch = to_device_batch

    if not is_test_run:
        ckptr = ckpt.StateCheckpointer(fold_dir, keep=config.keep_ckpts)
        for epoch in range(start_epoch, config.epochs + 1):
            logging.info("EPOCH %d/%d", epoch, config.epochs)
            rng, erng = jax.random.split(rng)
            profiling = config.profile and epoch == start_epoch
            if profiling:
                jax.profiler.start_trace(config.profile)
            state, train_metrics, _ = run_epoch(
                train_step, state,
                map(make_train_batch, train_loader), step_cfg, mode="train",
                rng=erng, display_step=config.display_step,
                log_fn=logging.info)
            if profiling:
                jax.profiler.stop_trace()
                logging.info("profiler trace written to %s", config.profile)
            if epoch % config.val_every == 0 and epoch > config.val_after:
                _, val_metrics, _ = run_epoch(
                    eval_step, state, map(make_eval_batch, val_loader),
                    step_cfg, mode="val", log_fn=logging.info)
                logging.info("Loss %.4f, Acc %.2f, IoU %.4f",
                             val_metrics["val_loss"],
                             val_metrics["val_accuracy"],
                             val_metrics["val_IoU"])
                trainlog[epoch] = {**train_metrics, **val_metrics}
                ckpt.checkpoint_log(fold_dir, trainlog)
                if val_metrics["val_IoU"] >= best_miou:
                    best_miou = val_metrics["val_IoU"]
                    ckptr.save(state, epoch, best_miou)
            else:
                trainlog[epoch] = dict(train_metrics)
                ckpt.checkpoint_log(fold_dir, trainlog)
        ckptr.wait()  # drain async writes before reading the best back
        # reload best (if this run saved one; a resumed run that added no
        # val-improving epoch keeps the restored weights)
        if ckpt.has_state(fold_dir):
            payload = ckpt.load_state(fold_dir)
            state = state.replace(params=payload["params"],
                                  batch_stats=payload.get("batch_stats", {}))

    logging.info("TESTING BEST EPOCH (region=%s)...", config.test_region)
    test_cfg = StepConfig(
        num_classes=config.num_classes, ignore_index=config.ignore_index,
        class_weights=tuple(weights), label_smoothing=config.label_smoothing,
        add_boundary_loss=config.add_boundary_loss,
        test_region=config.test_region)
    if mesh is not None:
        from crop2seg_tpu.parallel import data_parallel_eval
        test_step = data_parallel_eval(make_eval_step(model, test_cfg), mesh)
    else:
        test_step = jax.jit(make_eval_step(model, test_cfg))
    _, test_metrics, cms = run_epoch(
        test_step, state, map(make_eval_batch, test_loader), test_cfg,
        mode="test", log_fn=logging.info)
    logging.info("test metrics: %s", test_metrics)
    ckpt.save_results(fold_dir, test_metrics, cms, region=config.test_region)
    # aggregate over every Fold_k finished so far (reference
    # learning/utils.py:492-532 sums the fold confusion-matrix pickles; after
    # the last PASTIS fold this merges all 5)
    cm = ckpt.aggregate_fold_cms(config.res_dir, region=config.test_region)
    ign = config.ignore_index % config.num_classes
    cm[:, ign] = 0
    cm[ign, :] = 0
    ckpt.overall_performance(config.res_dir, cm, region=config.test_region)
    return test_metrics


def fold_sequence(config):
    """Reference train.py:650-657: PASTIS trains all 5 folds unless --fold
    pins one; S2TSCzCrop/synthetic use classical splits (single fold)."""
    if config.test or config.dataset != "pastis":
        return [config.fold or 1]
    return list(range(1, 6)) if config.fold is None else [config.fold]


if __name__ == "__main__":
    cfg = parse_config()
    t0 = time.time()
    for _fold in fold_sequence(cfg):
        cfg.fold = _fold
        main(cfg)
    logging.info("total time: %.1fs", time.time() - t0)
