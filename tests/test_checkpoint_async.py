"""Async best-k orbax checkpointing (StateCheckpointer).

The reference writes one synchronous model.pth.tar on each val improvement
(/root/reference/train.py:529-541); our StateCheckpointer writes async and
retains the k best epochs by val mIoU, keeping ``model.ckpt`` pointed at the
best so load_state/resume are unchanged. Fast test: a tiny fake train state
(the checkpointer only touches .params/.batch_stats/.opt_state).
"""
import glob
import os
from types import SimpleNamespace

import numpy as np

from crop2seg_tpu.learning import checkpoint as ckpt


def _state(seed):
    rng = np.random.default_rng(seed)
    return SimpleNamespace(
        params={"w": rng.standard_normal((3, 4)).astype(np.float32)},
        batch_stats={},
        opt_state={"mu": {"w": rng.standard_normal((3, 4)).astype(np.float32)}},
    )


def _ckpt_dirs(d):
    return sorted(os.path.basename(p) for p in glob.glob(f"{d}/ckpt_e*"))


def test_best_k_retention_and_best_pointer(tmp_path):
    d = str(tmp_path)
    cp = ckpt.StateCheckpointer(d, keep=2)
    states = {e: _state(e) for e in (1, 2, 3)}
    # non-monotone mIoU sequence: best is epoch 2, then 3, then prune 1
    cp.save(states[1], epoch=1, miou=0.5)
    cp.save(states[2], epoch=2, miou=0.7)
    cp.save(states[3], epoch=3, miou=0.6)
    cp.wait()
    assert _ckpt_dirs(d) == ["ckpt_e0002", "ckpt_e0003"]

    assert ckpt.has_state(d)
    payload = ckpt.load_state(d)  # resolves model.ckpt -> the 0.7 epoch
    assert payload["meta"]["epoch"] == 2
    assert abs(payload["meta"]["best_mIoU"] - 0.7) < 1e-9
    np.testing.assert_array_equal(payload["params"]["w"], states[2].params["w"])
    np.testing.assert_array_equal(payload["opt_state"]["mu"]["w"],
                                  states[2].opt_state["mu"]["w"])
    cp.close()


def test_index_file_and_missing_state(tmp_path):
    d = str(tmp_path)
    assert not ckpt.has_state(d)
    try:
        ckpt.load_state(d)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass
    cp = ckpt.StateCheckpointer(d, keep=1)
    cp.save(_state(0), epoch=7, miou=0.4)
    cp.wait()
    import json

    with open(os.path.join(d, "best_ckpt.json")) as f:
        entries = json.load(f)
    assert entries == [{"mIoU": 0.4, "epoch": 7,
                        "path": os.path.join(d, "ckpt_e0007")}]
    # fallback resolution works even without the symlink
    link = os.path.join(d, "model.ckpt")
    if os.path.islink(link):
        os.unlink(link)
    assert ckpt.has_state(d)
    assert ckpt.load_state(d)["meta"]["epoch"] == 7
    cp.close()


def test_tie_keeps_newest_first(tmp_path):
    """train.py saves on >=, so an equal-mIoU later epoch must win the
    model.ckpt pointer (the reference overwrites unconditionally)."""
    d = str(tmp_path)
    cp = ckpt.StateCheckpointer(d, keep=2)
    cp.save(_state(1), epoch=1, miou=0.5)
    cp.save(_state(2), epoch=2, miou=0.5)
    cp.wait()
    assert ckpt.load_state(d)["meta"]["epoch"] == 2
    cp.close()


def test_resume_readopts_existing_checkpoints(tmp_path):
    """A second StateCheckpointer over the same fold dir (a resumed run)
    prunes across BOTH runs' checkpoints."""
    d = str(tmp_path)
    cp = ckpt.StateCheckpointer(d, keep=2)
    cp.save(_state(1), epoch=1, miou=0.5)
    cp.save(_state(2), epoch=2, miou=0.6)
    cp.wait()
    cp.close()

    cp2 = ckpt.StateCheckpointer(d, keep=2)
    cp2.save(_state(3), epoch=3, miou=0.7)
    cp2.wait()
    assert _ckpt_dirs(d) == ["ckpt_e0002", "ckpt_e0003"]
    assert ckpt.load_state(d)["meta"]["epoch"] == 3
    cp2.close()


def test_has_opt_state_distinguishes_converted_release(tmp_path):
    """has_opt_state: True for a trained checkpoint (save_state payload
    carries the Adam moments), False for a converted torch release
    (save_converted intentionally stores none) — train.py uses this to
    tell 'no moments on purpose' apart from a failing restore."""
    trained = str(tmp_path / "trained")
    os.makedirs(trained)
    ckpt.save_state(trained, _state(1), epoch=1, best_miou=0.5)
    assert ckpt.has_opt_state(trained)

    converted = str(tmp_path / "converted")
    ckpt.save_converted(converted, {"params": _state(2).params})
    assert ckpt.has_state(converted)
    assert not ckpt.has_opt_state(converted)

    assert not ckpt.has_opt_state(str(tmp_path / "missing"))
