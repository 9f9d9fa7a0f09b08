"""Compile-on-first-use for the native components (g++ -O3 -shared).

No pybind11 in this image; the ABI is plain extern "C" + ctypes. The .so is
cached next to the source and rebuilt when the source is newer.
"""
from __future__ import annotations

import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()


class BuildError(RuntimeError):
    pass


def build(source_name: str) -> str:
    """Return the path of the compiled shared library for `source_name`
    (e.g. 'cell_list.cpp'), compiling if stale. Raises BuildError when no
    working toolchain is available."""
    src = os.path.join(_HERE, source_name)
    # 'lib' prefix keeps the artifact out of Python's import machinery
    # (a bare cell_list.so would shadow cell_list.py as an ext module)
    lib = os.path.join(_HERE, "lib" + source_name.replace(".cpp", ".so"))
    with _LOCK:
        if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
            return lib
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", src, "-o", lib,
        ]
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired) as e:
            raise BuildError(f"g++ unavailable: {e}") from e
        if proc.returncode != 0:
            raise BuildError(f"g++ failed:\n{proc.stderr[-2000:]}")
        return lib
