"""Build the native host-pipeline libraries (C++ via g++).

Usage: python -m climb_tpu.native.build
Produces libclimb_tokenizer.so and libclimb_image.so next to this file.
The Python wrappers (climb_tpu/native/__init__.py) fall back to pure-Python
implementations when the .so files are absent.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

TARGETS = [
    ("tokenizer.cpp", "libclimb_tokenizer.so", []),
    ("image_ops.cpp", "libclimb_image.so", ["-fopenmp"]),
    ("jpeg_decode.cpp", "libclimb_jpeg.so", ["-ljpeg"]),
]


def build(verbose: bool = True) -> bool:
    ok = True
    for src, out, extra in TARGETS:
        src_path = os.path.join(HERE, src)
        out_path = os.path.join(HERE, out)
        if os.path.exists(out_path) and os.path.getmtime(out_path) >= os.path.getmtime(src_path):
            if verbose:
                print(f"{out} up to date")
            continue
        # extras go after the source so -l libraries link correctly
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", "-o", out_path, src_path, *extra]
        if verbose:
            print(" ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"build of {out} failed: {e}", file=sys.stderr)
            ok = False
    return ok


if __name__ == "__main__":
    sys.exit(0 if build() else 1)
