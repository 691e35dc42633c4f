"""Checkpoint / resume / run artifacts.

TPU-native equivalent of the reference persistence layer
(/root/reference/train.py:432-434,529-541 and learning/utils.py:461-533):

- orbax checkpoints carrying {params, batch_stats, opt_state, epoch, best_mIoU}
- ``conf.json`` with the run configuration (reloaded on resume/test, the
  reference's conf.json contract at train.py:246-254)
- ``trainlog.json`` epoch metrics (learning/utils.py:470-474)
- ``<region>_test_metrics.json`` + confusion-matrix pickles
  (learning/utils.py:477-489) and overall/per_class JSONs (:492-532)
- import of reference torch ``model.pth.tar`` blobs via
  crop2seg_tpu.utils.torch_convert
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def prepare_output(res_dir: str, fold: int = 1) -> str:
    out = os.path.join(res_dir, f"Fold_{fold}")
    os.makedirs(out, exist_ok=True)
    return out


def save_conf(res_dir: str, config: Dict[str, Any]) -> None:
    with open(os.path.join(res_dir, "conf.json"), "w") as f:
        json.dump(config, f, indent=4, default=str)


def load_conf(res_dir: str) -> Dict[str, Any]:
    with open(os.path.join(res_dir, "conf.json")) as f:
        return json.load(f)


def checkpoint_log(fold_dir: str, trainlog: Dict) -> None:
    with open(os.path.join(fold_dir, "trainlog.json"), "w") as f:
        json.dump(trainlog, f, indent=4)


def save_results(fold_dir: str, metrics: Dict, cms: Dict[str, np.ndarray],
                 region: str = "all") -> None:
    with open(os.path.join(fold_dir, f"{region}_test_metrics.json"), "w") as f:
        json.dump({k: float(v) for k, v in metrics.items()}, f, indent=4)
    with open(os.path.join(fold_dir, f"{region}_conf_mat.pkl"), "wb") as f:
        pickle.dump({k: np.asarray(v) for k, v in cms.items()}, f)


def aggregate_fold_cms(res_dir: str, region: str = "all",
                       key: str = "top1") -> np.ndarray:
    """Sum the test confusion matrices across every finished Fold_k run dir
    (reference learning/utils.py:492-515 aggregates the fold pickles)."""
    import glob

    cm = None
    for p in sorted(glob.glob(os.path.join(res_dir, "Fold_*",
                                           f"{region}_conf_mat.pkl"))):
        with open(p, "rb") as f:
            cms = pickle.load(f)
        c = np.asarray(cms[key], np.float64)
        cm = c if cm is None else cm + c
    if cm is None:
        raise FileNotFoundError(
            f"no {region}_conf_mat.pkl under {res_dir}/Fold_*")
    return cm


def overall_performance(res_dir: str, cm: np.ndarray, region: str = "all",
                        prefix: str = "") -> None:
    """Aggregate metrics from a confusion matrix into overall/per_class JSONs
    (reference learning/utils.py:492-532)."""
    from crop2seg_tpu.learning.metrics import confusion_matrix_analysis

    per_class, overall = confusion_matrix_analysis(cm)
    with open(os.path.join(res_dir, f"{prefix}{region}_overall.json"), "w") as f:
        json.dump({k: float(v) for k, v in overall.items()}, f, indent=4)
    with open(os.path.join(res_dir, f"{prefix}{region}_per_class.json"), "w") as f:
        json.dump({k: {kk: float(vv) for kk, vv in d.items()}
                   for k, d in per_class.items()}, f, indent=4)


# --- orbax state checkpointing --------------------------------------------

def _payload(state, epoch: int, best_miou: float) -> Dict[str, Any]:
    return {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats) or {},
        "opt_state": jax.device_get(state.opt_state),
        "meta": {"epoch": epoch, "best_mIoU": float(best_miou)},
    }


def save_state(fold_dir: str, state, epoch: int, best_miou: float) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(fold_dir, "model.ckpt"))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, _payload(state, epoch, best_miou), force=True)


def save_converted(fold_dir: str, variables: Dict[str, Any], epoch: int = 0,
                   best_miou: float = 0.0) -> str:
    """Persist imported (e.g. torch-converted) variables as a ``model.ckpt``
    that :func:`load_state` / train.py --test / the webapp loader accept.
    Carries no optimizer state — a plain resume from such a folder restarts
    Adam fresh (the reference does the same for its torch releases,
    train.py:459-460 commented out)."""
    import orbax.checkpoint as ocp

    os.makedirs(fold_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(fold_dir, "model.ckpt"))
    payload = {
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})) or {},
        "meta": {"epoch": int(epoch), "best_mIoU": float(best_miou)},
    }
    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    return path


def _resolve_state_path(fold_dir: str) -> Optional[str]:
    """``model.ckpt`` (dir or symlink) wins; fall back to the best entry of
    ``best_ckpt.json`` written by StateCheckpointer on symlink-less FSes."""
    path = os.path.abspath(os.path.join(fold_dir, "model.ckpt"))
    if os.path.exists(path):
        return os.path.realpath(path)
    index = os.path.join(fold_dir, "best_ckpt.json")
    if os.path.exists(index):
        with open(index) as f:
            entries = json.load(f)
        if entries:
            return entries[0]["path"]
    return None


def has_state(fold_dir: str) -> bool:
    return _resolve_state_path(fold_dir) is not None


def has_opt_state(fold_dir: str) -> bool:
    """True when the saved tree carries an ``opt_state`` entry. A converted
    torch release (:func:`save_converted`) does not; callers use this to
    tell "intentionally no optimizer state" apart from a failing restore
    (which should be loud, not silently reset the Adam moments)."""
    import orbax.checkpoint as ocp

    path = _resolve_state_path(fold_dir)
    if path is None:
        return False
    meta = ocp.PyTreeCheckpointer().metadata(path)
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", None)
    if tree is None:  # older orbax: metadata() returns the tree directly
        tree = meta
    return "opt_state" in tree


def load_state(fold_dir: str, state=None):
    """Returns (payload dict). When ``state`` is given, opt_state is restored
    with matching structure."""
    import orbax.checkpoint as ocp

    path = _resolve_state_path(fold_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {fold_dir}")
    ckptr = ocp.PyTreeCheckpointer()
    if state is None:
        return ckptr.restore(path)
    template = _payload(state, 0, 0.0)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(template))


class StateCheckpointer:
    """Async best-k orbax checkpointing.

    The reference persists a single synchronous ``model.pth.tar`` on every
    val improvement (/root/reference/train.py:529-541), stalling the train
    loop for the serialization. Here each improving epoch is written by an
    ``ocp.AsyncCheckpointer`` (the host thread returns as soon as the arrays
    are snapshotted off-device), only the ``keep`` best epochs by val mIoU
    are retained on disk, and ``model.ckpt`` is kept pointing at the best
    one so :func:`load_state` / resume / the webapp loader are unchanged.
    """

    def __init__(self, fold_dir: str, keep: int = 3):
        import orbax.checkpoint as ocp

        if keep < 1:
            raise ValueError(f"keep must be >= 1, got {keep}")
        self.fold_dir = fold_dir
        self.keep = keep
        self._ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
        # (miou, epoch, path), best first; epoch breaks ties toward newest.
        # A resumed run re-adopts the previous run's retained checkpoints so
        # retention keeps spanning the whole training history.
        self._saved = []
        index = os.path.join(fold_dir, "best_ckpt.json")
        if os.path.exists(index):
            with open(index) as f:
                self._saved = [(e["mIoU"], e["epoch"], e["path"])
                               for e in json.load(f)
                               if os.path.exists(e["path"])]

    def save(self, state, epoch: int, miou: float) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.fold_dir, f"ckpt_e{epoch:04d}"))
        self._ckptr.save(path, args=ocp.args.PyTreeSave(
            _payload(state, epoch, miou)), force=True)
        self._saved.append((float(miou), epoch, path))
        self._saved.sort(key=lambda t: (t[0], t[1]), reverse=True)
        if len(self._saved) > self.keep:
            # deleting may race an in-flight write of the same run; drain
            # first (prunes are rare — only after keep+1 improvements)
            self._ckptr.wait_until_finished()
            for _, _, stale in self._saved[self.keep:]:
                import shutil

                shutil.rmtree(stale, ignore_errors=True)
            self._saved = self._saved[:self.keep]
        self._point_at_best()
        return path

    def _point_at_best(self) -> None:
        best = self._saved[0][2]
        link = os.path.join(self.fold_dir, "model.ckpt")
        try:
            if os.path.islink(link) or os.path.exists(link):
                if os.path.islink(link):
                    os.unlink(link)
                else:  # a real dir from a legacy save_state run
                    import shutil

                    shutil.rmtree(link)
            os.symlink(best, link)
        except OSError:
            pass  # FS without symlinks: best_ckpt.json below is the pointer
        with open(os.path.join(self.fold_dir, "best_ckpt.json"), "w") as f:
            json.dump([{"mIoU": m, "epoch": e, "path": p}
                       for m, e, p in self._saved], f, indent=2)

    def wait(self) -> None:
        """Block until every queued save is durable (call before reloading
        the best checkpoint or exiting the process)."""
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()


def load_torch_checkpoint(path: str, model_name: str, **kwargs):
    """Import a reference ``model.pth.tar`` into flax variables."""
    from crop2seg_tpu.utils import torch_convert as tc

    sd = tc.load_torch_state_dict(path)
    if model_name in ("utae",):
        return tc.convert_utae(sd, **kwargs)
    if model_name in ("timeunet", "timeunet_v1"):
        return tc.convert_timeunet(sd, **kwargs)
    if model_name in ("wtae",):
        return tc.convert_wtae(sd, **kwargs)
    raise ValueError(f"no torch converter for model {model_name!r}")
