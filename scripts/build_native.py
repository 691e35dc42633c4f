#!/usr/bin/env python
"""Build the native C++ loader extension (no pybind11: plain C ABI + ctypes).

Produces crop2seg_tpu/native/_loader.so. Safe to re-run; skips the build
when the .so is newer than the source.
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
NATIVE = os.path.join(HERE, "..", "crop2seg_tpu", "native")
SRC = os.path.join(NATIVE, "loader.cpp")
OUT = os.path.join(NATIVE, "_loader.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(OUT)
            and os.path.getmtime(OUT) >= os.path.getmtime(SRC)):
        return OUT
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-std=c++17", "-o", OUT, SRC, "-lpthread"]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
