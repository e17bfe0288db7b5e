"""Build the native host library with g++ (cached)."""

from __future__ import annotations

import logging
import subprocess
import sys
from pathlib import Path

SRC = Path(__file__).parent / "saspa_host.cpp"
BUILD_DIR = Path(__file__).parent / "_build"
LIB = BUILD_DIR / "libsaspa_host.so"


def build(force: bool = False) -> Path | None:
    if LIB.exists() and not force and LIB.stat().st_mtime >= SRC.stat().st_mtime:
        return LIB
    BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        "-o", str(LIB), str(SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return LIB
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logging.warning("native build failed (%s); falling back to numpy paths", e)
        return None


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path or "BUILD FAILED")
