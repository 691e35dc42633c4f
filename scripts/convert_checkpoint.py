#!/usr/bin/env python
"""One-command import of a reference checkpoint release into a ready
``--weight_folder`` / webapp ``model_dir``.

    python scripts/convert_checkpoint.py \\
        --checkpoint path/to/model.pth.tar \\
        --conf path/to/conf.json \\
        --norm path/to/NORM_S2_patch.json \\
        --out  /path/to/weights [--fold 1]

Produces::

    out/conf.json            # train.py + webapp readable run config
    out/NORM_S2_patch.json   # flattened to {'mean','std'}
    out/Fold_<k>/model.ckpt  # orbax checkpoint (params + batch_stats + meta)

after which both entry points work directly::

    python train.py --test --weight_folder out --dataset_folder <data>
    webapp.pipeline.generate_prediction(model_dir=out, ...)

This closes the day-1 path for the reference's shipped inference release
(``data/inference/timeunet_v1_base/{model.pth.tar, conf.json}`` +
``data/inference/NORM_S2_patch.json`` — loaded by
/root/reference/src/webapp/prediction.py:214-250 and the --weight_folder
contract at /root/reference/train.py:228-269). The torch->flax weight
mapping itself is crop2seg_tpu.utils.torch_convert (golden-tested).

Norm handling matches the reference webapp loader exactly
(prediction.py:232-250): the inference-format ``{'train': {...}}`` blob is
reduced to flat mean/std WITH the PASTIS channel reorder applied once here
— our S2TSCZCropDataset serves PASTIS-ordered channels, so the stored norm
must be in that order too. Fold-keyed training-format blobs are averaged
(same as data.load_norm_values).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# reference prediction.py:241: S2 bands 10m/20m -> PASTIS channel order —
# the single source of truth is the dataset module so the converter's norm
# reorder can never diverge from what S2TSCZCropDataset serves.
from crop2seg_tpu.data.s2tsczcrop import PASTIS_CHANNEL_ORDER  # noqa: E402


def flatten_norm(blob: dict) -> dict:
    if "train" in blob and "mean" in blob.get("train", {}):
        order = list(PASTIS_CHANNEL_ORDER)  # tuple would multi-axis index
        return {"mean": np.asarray(blob["train"]["mean"],
                                   np.float64)[order].tolist(),
                "std": np.asarray(blob["train"]["std"],
                                  np.float64)[order].tolist()}
    if "mean" in blob:
        return {"mean": list(blob["mean"]), "std": list(blob["std"])}
    means = [np.asarray(v["mean"], np.float64) for v in blob.values()]
    stds = [np.asarray(v["std"], np.float64) for v in blob.values()]
    return {"mean": np.stack(means).mean(0).tolist(),
            "std": np.stack(stds).mean(0).tolist()}


def convert(checkpoint: str, conf_path: str, norm_path: str, out: str,
            fold: int = 1) -> str:
    import torch

    from crop2seg_tpu.learning import checkpoint as ckpt

    with open(conf_path) as f:
        conf = json.load(f)
    name = str(conf.get("model", "timeunet")).lower()

    blob = torch.load(checkpoint, map_location="cpu", weights_only=False)
    epoch = int(blob.get("epoch", 0)) if isinstance(blob, dict) else 0
    best = float(blob.get("best_mIoU", 0.0)) if isinstance(blob, dict) else 0.0

    variables = ckpt.load_torch_checkpoint(
        checkpoint, name,
        n_stages=len(conf.get("encoder_widths", (64, 64, 64, 128))),
        use_doy=conf.get("use_doy", False),
        add_linear=conf.get("add_linear", False),
        use_abs_rel_enc=conf.get("use_abs_rel_enc", False),
        add_boundary=conf.get("add_boundary_loss", False))

    os.makedirs(out, exist_ok=True)
    fold_dir = os.path.join(out, f"Fold_{fold}")
    path = ckpt.save_converted(fold_dir, variables, epoch=epoch,
                               best_miou=best)
    # round-trip sanity: the saved tree must restore non-empty
    restored = ckpt.load_state(fold_dir)
    assert restored["params"], "converted checkpoint restored empty"
    assert restored["meta"]["epoch"] == epoch

    conf.setdefault("num_classes", conf.get("out_conv", [32, 15])[-1])
    conf["model"] = name
    with open(os.path.join(out, "conf.json"), "w") as f:
        json.dump(conf, f, indent=4, default=str)
    if norm_path:
        with open(norm_path) as f:
            norm = json.load(f)
        with open(os.path.join(out, "NORM_S2_patch.json"), "w") as f:
            json.dump(flatten_norm(norm), f, indent=4)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", required=True,
                    help="reference model.pth.tar")
    ap.add_argument("--conf", required=True,
                    help="reference conf.json for the run that produced it")
    ap.add_argument("--norm", default=None,
                    help="NORM_S2_patch.json (inference or fold format)")
    ap.add_argument("--out", required=True, help="output weight folder")
    ap.add_argument("--fold", type=int, default=1)
    args = ap.parse_args(argv)
    path = convert(args.checkpoint, args.conf, args.norm, args.out, args.fold)
    print(f"converted -> {path}")
    print(f"ready: python train.py --test --weight_folder {args.out} "
          f"--dataset_folder <data>")


if __name__ == "__main__":
    main()
