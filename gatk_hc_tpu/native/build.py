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
    "-march=x86-64-v3",  # AVX2 autovectorization, portable across the hosts
    # of a multihost run (unlike -march=native); -ffp-contract=off below
    # keeps float arithmetic unfused so PairHMM f32 results stay bit-exact
    "-fPIC",
    "-shared",
    "-ffp-contract=off",
    "-fno-math-errno",
    "-pthread",  # hc_sam_parse_mt block workers
    "-Wall",
]


_STAMP = OUT + ".flags"


def build(force: bool = False) -> str:
    flags = " ".join(CXXFLAGS)
    fresh = (
        os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
        and os.path.exists(_STAMP)
        and open(_STAMP).read() == flags  # rebuild on flag changes too
    )
    if not force and fresh:
        return OUT
    cmd = ["g++", *CXXFLAGS, SRC, "-o", OUT]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    with open(_STAMP, "w") as handle:
        handle.write(flags)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
