"""On-demand build of the native runtime library (g++, no pybind11).

The .so is compiled once into native/_build/ and reused; a source-hash in
the filename invalidates stale builds.  Failure to build (no compiler,
sandboxed env) degrades gracefully — callers fall back to numpy paths.
"""
from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "mapping_native.cpp")
_BUILD_DIR = os.path.join(_HERE, "_build")
_lock = threading.Lock()


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_BUILD_DIR, f"mapping_native_{digest}.so")


def build_library(verbose: bool = False) -> str | None:
    """Compile (if needed) and return the .so path, or None on failure."""
    try:
        path = _lib_path()
    except OSError:
        return None
    if os.path.exists(path):
        return path
    with _lock:
        if os.path.exists(path):
            return path
        os.makedirs(_BUILD_DIR, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-pthread", _SRC, "-o", tmp,
        ]
        try:
            res = subprocess.run(
                cmd, capture_output=True, text=True, timeout=120
            )
        except (OSError, subprocess.TimeoutExpired):
            return None
        if res.returncode != 0:
            if verbose:
                print(res.stderr, file=sys.stderr)
            return None
        os.replace(tmp, path)
        return path
