"""Native (C) kernels for host-side bit-serial codecs.

The reference links vendored C libs (szip/libaec, libcorrect, ...); here the
few codecs that are inherently sample-serial and too hot for Python (Rice)
are small C files compiled on demand with the system compiler and loaded via
ctypes — no pip dependencies, rebuilt automatically when the source changes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_libs = {}


def get_lib(name: str) -> ctypes.CDLL:
    """Compile (if stale) and load lib<name>.so built from <name>.c."""
    if name in _libs:
        return _libs[name]
    src = os.path.join(_DIR, f"{name}.c")
    so = os.path.join(_DIR, f"lib{name}.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        with tempfile.NamedTemporaryFile(suffix=".so", dir=_DIR,
                                         delete=False) as tmp:
            tmp_path = tmp.name
        cc = os.environ.get("CC", "cc")
        subprocess.run([cc, "-O2", "-shared", "-fPIC", "-o", tmp_path, src],
                       check=True, capture_output=True)
        os.replace(tmp_path, so)
    lib = ctypes.CDLL(so)
    _libs[name] = lib
    return lib
