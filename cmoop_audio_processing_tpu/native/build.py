"""Build the native shared libraries (currently libhv.so).

Usage: python -m cmoop_audio_processing_tpu.native.build
Idempotent: skips compilation when the .so is newer than its source.
"""

from __future__ import annotations

import os
import subprocess
import sys

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))

TARGETS = [
    ("hv.cpp", "libhv.so"),
]


def build(force: bool = False) -> bool:
    """Compile all native targets; returns True if everything is available."""
    ok = True
    for src_name, out_name in TARGETS:
        src = os.path.join(NATIVE_DIR, src_name)
        out = os.path.join(NATIVE_DIR, out_name)
        if (
            not force
            and os.path.exists(out)
            and os.path.getmtime(out) >= os.path.getmtime(src)
        ):
            continue
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            print(f"native build failed for {src_name}: {e}", file=sys.stderr)
            ok = False
    return ok


if __name__ == "__main__":
    sys.exit(0 if build(force="--force" in sys.argv) else 1)
