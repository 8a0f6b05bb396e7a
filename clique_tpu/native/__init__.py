"""Native (C) runtime components, loaded via ctypes.

The shared library is built on first use from bamcodec.c (cc -O3 -shared
-fPIC -lz); no pybind11/pip needed. Falls back to the pure-python codecs in
io/sam.py when no C compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import Optional

log = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[str]:
    src = os.path.join(os.path.dirname(__file__), "bamcodec.c")
    out = os.path.join(os.path.dirname(__file__), "_bamcodec.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    for cc in ("cc", "gcc", "clang"):
        try:
            res = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", out, src, "-lz"],
                capture_output=True, timeout=120)
            if res.returncode == 0:
                return out
            log.debug("%s failed: %s", cc, res.stderr.decode()[:500])
        except (FileNotFoundError, subprocess.TimeoutExpired):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The bamcodec shared library, or None if unbuildable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _build_lib()
    if path is None:
        log.warning("no C compiler found; using pure-python BAM codec")
        return None
    lib = ctypes.CDLL(path)
    lib.encode_bam_records.restype = ctypes.c_long
    lib.encode_bam_records.argtypes = [
        ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_char_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_long,
    ]
    lib.bgzf_compress.restype = ctypes.c_long
    lib.bgzf_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long,
    ]
    lib.decode_bam_records.restype = ctypes.c_long
    lib.decode_bam_records.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB
