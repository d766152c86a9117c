"""Build the native C++ components (no external deps beyond zlib).

Usage: python native/build.py
Produces native/libsalmontpu.so, loaded via ctypes by
salmon_tpu.alignment.bamio (with a pure-Python fallback when absent).
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "libsalmontpu.so")
SRCS = [os.path.join(HERE, "bamreader.cpp"),
        os.path.join(HERE, "fastqreader.cpp"),
        os.path.join(HERE, "kmersort.cpp"),
        os.path.join(HERE, "alnweights.cpp")]


def build(force: bool = False) -> str:
    if not force and os.path.exists(OUT) and all(
            os.path.getmtime(OUT) >= os.path.getmtime(s) for s in SRCS):
        return OUT
    cmd = ["g++", "-O3", "-std=c++17", "-fopenmp", "-shared", "-fPIC",
           "-o", OUT, *SRCS, "-lz"]
    print("+", " ".join(cmd), file=sys.stderr)
    subprocess.check_call(cmd)
    return OUT


if __name__ == "__main__":
    build(force="--force" in sys.argv)
    print(OUT)
