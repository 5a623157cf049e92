"""Build the native data-plane library.

Usage: ``python -m nope_tpu.native.build``  (g++ -O3 -shared -fPIC)
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys

SRC = os.path.join(os.path.dirname(__file__), "warp.cpp")
OUT = os.path.join(os.path.dirname(__file__), "libnope_native.so")


def build(force: bool = False) -> str:
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", SRC, "-o", OUT,
    ]
    logging.info("building native library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
