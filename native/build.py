#!/usr/bin/env python
"""Build the native fastloader shared library.

    python native/build.py        # -> native/libfastloader.so
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def build():
    src = os.path.join(HERE, "fastloader.cpp")
    out = os.path.join(HERE, "libfastloader.so")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", out, "-ljpeg", "-lpthread",
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
