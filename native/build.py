#!/usr/bin/env python3
"""Build the native TIFF codec shared library.

Usage: python native/build.py
Emits sarpro_tpu/_native/tiffcodec.so (plain C ABI, loaded via ctypes).
"""
import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).parent
OUT_DIR = HERE.parent / "sarpro_tpu" / "_native"


def main() -> int:
    OUT_DIR.mkdir(exist_ok=True)
    out = OUT_DIR / "tiffcodec.so"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread",
        str(HERE / "tiffcodec.cpp"),
        str(HERE / "jpegenc.cpp"),
        "-o", str(out),
    ]
    print(" ".join(cmd))
    rc = subprocess.call(cmd)
    if rc == 0:
        print(f"built {out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
