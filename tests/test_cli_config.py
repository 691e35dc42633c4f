"""Fast CLI-config tests for train.py (no model construction)."""
import importlib.util
import os


def _cli():
    path = os.path.join(os.path.dirname(__file__), "..", "train.py")
    spec = importlib.util.spec_from_file_location("crop2seg_train_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_use_pallas_flag_resolution():
    """--use_pallas: explicit true/false win; auto keys off the backend
    (on for TPU, off for the CPU mesh) — VERDICT r1 item #5."""
    cli = _cli()
    cfg = cli.parse_config(["--use_pallas", "true", "--platform", "cpu"])
    assert cli.resolve_use_pallas(cfg) is True
    cfg = cli.parse_config(["--use_pallas", "false"])
    assert cli.resolve_use_pallas(cfg) is False
    cfg = cli.parse_config(["--platform", "cpu"])      # auto + cpu -> off
    assert cli.resolve_use_pallas(cfg) is False
    cfg = cli.parse_config(["--platform", "tpu"])      # auto + tpu -> on
    assert cli.resolve_use_pallas(cfg) is True


def test_use_pallas_roundtrips_conf_json(tmp_path):
    """conf.json keeps the flag so --test restores the same kernel choice."""
    from crop2seg_tpu.learning import checkpoint as ckpt
    cli = _cli()
    cfg = cli.parse_config(["--use_pallas", "true"])
    ckpt.save_conf(str(tmp_path), vars(cfg))
    stored = ckpt.load_conf(str(tmp_path))
    assert stored["use_pallas"] == "true"


def test_factory_rejects_unknown_remat_policy():
    """A remat_policy typo must raise, not silently degrade to full
    recompute (ADVICE r3, models/factory.py)."""
    import pytest

    from crop2seg_tpu.models.factory import get_model

    for name in ("utae", "wtae"):
        with pytest.raises(ValueError, match="remat_policy"):
            get_model({"model": name, "remat_policy": "convout"})
        m = get_model({"model": name, "remat_policy": "full"})
        assert m.remat_policy is None
        m = get_model({"model": name})
        assert m.remat_policy == "conv_out"
