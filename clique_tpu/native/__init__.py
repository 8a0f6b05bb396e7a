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


_REFDP: Optional[ctypes.CDLL] = None
_REFDP_TRIED = False


def get_refdp_lib() -> Optional[ctypes.CDLL]:
    """The measured-baseline DP library (refdp.c), or None.

    refdp.c reimplements the reference engine's 3-plane affine DP hot
    loop (alignment_matrix.rs:366-683) so bench.py can MEASURE the
    single-node baseline on this host instead of modeling it."""
    global _REFDP, _REFDP_TRIED
    if _REFDP is not None or _REFDP_TRIED:
        return _REFDP
    _REFDP_TRIED = True
    src = os.path.join(os.path.dirname(__file__), "refdp.c")
    out = os.path.join(os.path.dirname(__file__), "_refdp.so")
    built = None
    if os.path.exists(out) and \
            os.path.getmtime(out) >= os.path.getmtime(src):
        built = out
    else:
        for cc in ("cc", "gcc", "clang"):
            try:
                res = subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", out, src,
                     "-lpthread"],
                    capture_output=True, timeout=120)
                if res.returncode == 0:
                    built = out
                    break
                log.debug("%s failed: %s", cc, res.stderr.decode()[:500])
            except (FileNotFoundError, subprocess.TimeoutExpired):
                continue
    if built is None:
        return None
    lib = ctypes.CDLL(built)
    lib.refdp_align_many.restype = ctypes.c_long
    lib.refdp_align_many.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_long, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
    ]
    _REFDP = lib
    return _REFDP


def measure_reference_dp(l1: int = 623, l2: int = 623,
                         n_reads: int = 192,
                         n_threads: Optional[int] = None
                         ) -> Optional[float]:
    """Measured single-node baseline: 3-plane DP-equivalent cells/s of
    the reference's fill+traceback recurrence on THIS host, threads
    fanned like the reference's rayon pool. Returns None without a C
    compiler."""
    import time

    import numpy as np

    lib = get_refdp_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = np.ascontiguousarray(rng.choice(bases, (n_reads, l1)))
    reads = np.ascontiguousarray(rng.choice(bases, (n_reads, l2)))
    ssum = ctypes.c_double()
    # warm (page-in, thread spawn), then timed
    lib.refdp_align_many(refs.tobytes(), l1, reads.tobytes(), l2,
                         min(16, n_reads), n_threads,
                         ctypes.byref(ssum))
    rb, db = refs.tobytes(), reads.tobytes()
    t0 = time.time()
    ops = lib.refdp_align_many(rb, l1, db, l2, n_reads, n_threads,
                               ctypes.byref(ssum))
    dt = time.time() - t0
    if ops <= 0 or dt <= 0:
        return None
    return n_reads * l1 * l2 * 3 / dt
