"""Shared helpers for golden-parity tests (fixtures from scripts/make_golden.py)."""
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def load_fixture(name):
    """Returns (arrays, state_dict) from tests/golden/{name}.npz."""
    blob = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    arrays, sd = {}, {}
    for k in blob.files:
        if k.startswith("sd::"):
            sd[k[4:]] = blob[k]
        else:
            arrays[k] = blob[k]
    return arrays, sd


def to_nhwc_seq(x):
    """torch (B, T, C, H, W) -> (B, T, H, W, C)."""
    return np.transpose(x, (0, 1, 3, 4, 2))


def to_nhwc(x):
    """torch (B, C, H, W) -> (B, H, W, C)."""
    return np.transpose(x, (0, 2, 3, 1))


def from_nhwc(x):
    """(B, H, W, C) -> torch (B, C, H, W)."""
    return np.transpose(x, (0, 3, 1, 2))


def attn_from_torch(a):
    """reference (head, B, T, H, W) -> ours (B, H, W, head, T)."""
    return np.transpose(a, (1, 3, 4, 0, 2))


def assert_close(got, want, rtol=1e-4, atol=1e-4, name=""):
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape, f"{name}: shape {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol, err_msg=name)
