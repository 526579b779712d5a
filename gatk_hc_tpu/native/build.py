"""Build libhcnative.so.

Flags matter for exactness: -ffp-contract=off prevents FMA fusion so the f32
PairHMM path matches the Python oracle and the Pallas kernel op-for-op; no
-ffast-math (reassociation would break bit-exactness).
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "hc_native.cpp")
OUT = os.path.join(_DIR, "libhcnative.so")

CXXFLAGS = [
    "-std=c++17",
    "-O3",
    "-march=native",  # AVX2 autovectorization; -ffp-contract=off below keeps
    # float arithmetic unfused so PairHMM f32 results stay bit-exact
    "-fPIC",
    "-shared",
    "-ffp-contract=off",
    "-fno-math-errno",
    "-Wall",
]


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = ["g++", *CXXFLAGS, SRC, "-o", OUT]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
