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
    common_args = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.c2s_load_batch.restype = ctypes.c_int
    lib.c2s_load_batch.argtypes = common_args
    lib.c2s_load_batch_aug.restype = ctypes.c_int
    lib.c2s_load_batch_aug.argtypes = common_args + [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
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
               n_threads: int = 4,
               layout: str = "nhwc",
               out_dtype: str = "f4",
               out: Optional[np.ndarray] = None,
               frame_maps: Optional[np.ndarray] = None,
               gathers: Optional[np.ndarray] = None):
    """Assemble (x, pad_mask, lengths) from npy patch files.

    x (B, t_bucket, h, w, C) channels-last (``layout='nhwc'``) or
    (B, t_bucket, C, h, w) planar (``layout='nchw'``), standardized; pad_mask
    (B, t_bucket) bool True at pads; lengths (B,) int32. ``reorder`` maps
    output channel -> source channel index (PASTIS order by default left to
    the caller); ``mean``/``std`` are per OUTPUT channel.

    ``layout='nchw'`` skips the host-side transpose (the device transposes
    to channels-last for free inside the first jitted op) and
    ``out_dtype='bf16'`` halves write + host->device transfer bytes — both
    matter on this one-core host (see loader.cpp header).

    Train-time augmentation runs off the GIL too: ``frame_maps``
    (B, t_bucket) int32 per-sample source-frame gather (-1 = pad from there
    on) implements temporal dropout; ``gathers`` (B, h*w) int32 per-sample
    pixel permutations (-1 = fill 0, from transforms.Transform.index_map)
    implement flip+rotate. RNG draws stay in Python.
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
    if layout not in ("nhwc", "nchw"):
        raise ValueError(f"layout must be 'nhwc' or 'nchw', got {layout!r}")
    if out_dtype not in ("f4", "bf16"):
        raise ValueError(f"out_dtype must be 'f4' or 'bf16', got {out_dtype!r}")
    planar = layout == "nchw"
    if out_dtype == "bf16":
        import ml_dtypes
        dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        dtype = np.dtype(np.float32)
    shape = ((n, t_bucket, c_out, h, w) if planar
             else (n, t_bucket, h, w, c_out))
    if out is not None:
        # reuse a caller-held buffer: faulting in a fresh multi-GB np.empty
        # every call costs more than the decode itself on this host
        if out.shape != shape or out.dtype != dtype or \
                not out.flags["C_CONTIGUOUS"]:
            raise ValueError(f"out must be C-contiguous {shape} {dtype}, got "
                             f"{out.shape} {out.dtype}")
        x = out
    else:
        x = np.empty(shape, dtype)
    mask = np.empty((n, t_bucket), np.uint8)
    lengths = np.empty((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    fm_p = g_p = None
    if frame_maps is not None:
        fm_a = np.ascontiguousarray(frame_maps, np.int32)
        if fm_a.shape != (n, t_bucket):
            raise ValueError(
                f"frame_maps must be ({n}, {t_bucket}), got {fm_a.shape}")
        fm_p = fm_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    if gathers is not None:
        g_a = np.ascontiguousarray(gathers, np.int32)
        if g_a.shape != (n, h * w):
            raise ValueError(
                f"gathers must be ({n}, {h * w}), got {g_a.shape}")
        g_p = g_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    rc = lib.c2s_load_batch_aug(
        c_paths, n, t_bucket, pad_value, mean_p, std_p,
        reorder_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), c_out, h, w,
        x.ctypes.data_as(ctypes.c_void_p),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads,
        int(planar), int(out_dtype == "bf16"), fm_p, g_p)
    if rc != 0:
        raise OSError(f"native batch load failed (rc={rc})")
    return x, mask.astype(bool), lengths
