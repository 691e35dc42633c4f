"""ctypes bindings for the native C++ batch loader (_loader.so).

``load_batch`` assembles a padded channels-last batch straight from npy
patch archives on a C++ thread pool (see loader.cpp). Falls back cleanly:
``available()`` is False when the extension is missing and g++ is not
present; callers keep the pure-Python path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_loader.so")
_LIB = None


def _build() -> bool:
    src = os.path.join(_HERE, "loader.cpp")
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", "-o", _SO, src, "-lpthread"],
                       check=True, capture_output=True)
        return True
    except OSError as e:
        log.warning("native loader build skipped (no g++?): %s", e)
        return False
    except subprocess.CalledProcessError as e:
        log.warning("native loader build failed:\n%s",
                    e.stderr.decode(errors="replace") if e.stderr else e)
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.c2s_load_batch.restype = ctypes.c_int
    lib.c2s_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.c2s_npy_shape.restype = ctypes.c_int
    lib.c2s_npy_shape.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def npy_shape(path: str):
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    shape = (ctypes.c_int64 * 4)()
    ndim = lib.c2s_npy_shape(path.encode(), shape)
    if ndim < 0:
        raise OSError(f"cannot parse npy header: {path} (rc={ndim})")
    return tuple(int(shape[i]) for i in range(ndim))


def load_batch(paths: Sequence[str], t_bucket: int, h: int, w: int,
               reorder: Optional[Sequence[int]] = None,
               mean: Optional[np.ndarray] = None,
               std: Optional[np.ndarray] = None,
               pad_value: float = 0.0,
               n_threads: int = 4):
    """Assemble (x, pad_mask, lengths) from npy patch files.

    x (B, t_bucket, h, w, C) fp32 channels-last, standardized; pad_mask
    (B, t_bucket) bool True at pads; lengths (B,) int32. ``reorder`` maps
    output channel -> source channel index (PASTIS order by default left to
    the caller); ``mean``/``std`` are per OUTPUT channel.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++?)")
    n = len(paths)
    if reorder is None:
        c_out = npy_shape(paths[0])[1]
        reorder = list(range(c_out))
    c_out = len(reorder)
    reorder_a = np.ascontiguousarray(reorder, np.int32)
    mean_p = std_p = None
    if (mean is None) != (std is None):
        raise ValueError("mean and std must be given together "
                         f"(got mean={'set' if mean is not None else None}, "
                         f"std={'set' if std is not None else None})")
    if mean is not None:
        mean_a = np.ascontiguousarray(mean, np.float32)
        std_a = np.ascontiguousarray(std, np.float32)
        if mean_a.shape != (c_out,) or std_a.shape != (c_out,):
            raise ValueError(
                f"mean/std must have shape ({c_out},) matching the reorder "
                f"list; got {mean_a.shape} / {std_a.shape}")
        mean_p = mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        std_p = std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    x = np.empty((n, t_bucket, h, w, c_out), np.float32)
    mask = np.empty((n, t_bucket), np.uint8)
    lengths = np.empty((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.c2s_load_batch(
        c_paths, n, t_bucket, pad_value, mean_p, std_p,
        reorder_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), c_out, h, w,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    if rc != 0:
        raise OSError(f"native batch load failed (rc={rc})")
    return x, mask.astype(bool), lengths
