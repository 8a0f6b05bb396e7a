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
    lib.encode_fastpath_records.restype = ctypes.c_long
    lib.encode_fastpath_records.argtypes = [
        ctypes.c_long,
        ctypes.c_void_p,                     # ref_ids
        ctypes.c_char_p, ctypes.c_void_p,    # name blob/off
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # cigar runs
        ctypes.c_char_p, ctypes.c_void_p,    # seq blob/off
        ctypes.c_long, ctypes.c_char_p,      # n_syms, syms
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,  # captures
        ctypes.c_char_p, ctypes.c_void_p,    # rm strings
        ctypes.c_char_p, ctypes.c_void_p,    # score strings
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,  # out, cap, rec_off
    ]
    lib.bgzf_compress.restype = ctypes.c_long
    lib.bgzf_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long,
    ]
    lib.fastq_scan.restype = ctypes.c_long
    lib.fastq_scan.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.c_void_p, ctypes.c_void_p,    # name off/len
        ctypes.c_void_p, ctypes.c_void_p,    # seq off/len
        ctypes.c_void_p, ctypes.c_void_p,    # qual off/len
        ctypes.c_void_p, ctypes.c_void_p,    # consumed, stopped
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
                     "-lpthread", "-lm"],
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
    lib.refdp_collapse_model.restype = ctypes.c_double
    lib.refdp_collapse_model.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_long,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
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


def measure_reference_chain(l1: int = 342, l2: int = 342,
                            n_reads: int = 20000, n_cells: int = 500,
                            sample_reads: int = 128,
                            n_threads: Optional[int] = None,
                            sub_p: float = 0.05) -> Optional[dict]:
    """Measured single-node CHAIN baseline on this host.

    Align: the 3-plane DP recurrence rate from refdp_align_many (sampled,
    extrapolated linearly — per-read cost is shape-constant). Collapse:
    refdp_collapse_model run at FULL dataset scale (its cost depends on
    the tag multiset structure), on a dataset with the bench's exact
    shape (n_cells cell barcodes x 4 UMIs, sub_p substitutions).
    Returns {chain_reads_per_s, align_mcells_per_s, align_s, collapse_s}
    or None without a C compiler."""
    import time

    import numpy as np

    lib = get_refdp_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = os.cpu_count() or 1
    align_rate = measure_reference_dp(l1, l2, sample_reads, n_threads)
    if not align_rate:
        return None
    align_s = n_reads * 3.0 * l1 * l2 / align_rate

    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    L = l2
    ref = rng.choice(bases, L)
    # bench-shaped tag zones: 16bp cell barcode + 12bp UMI after a 24bp
    # adapter (bench.py's amplicon layout)
    ref[24:40] = ord("0")
    ref[40:52] = ord("1")
    cells = rng.choice(bases, (n_cells, 16))
    umis = rng.choice(bases, (n_cells, 4, 12))
    reads = np.broadcast_to(ref, (n_reads, L)).copy()
    idx = np.arange(n_reads)
    reads[:, 24:40] = cells[idx % n_cells]
    reads[:, 40:52] = umis[idx % n_cells, (idx // n_cells) % 4]
    subs = rng.random((n_reads, L)) < sub_p
    reads[subs] = rng.choice(bases, int(subs.sum()))
    rb = np.ascontiguousarray(reads).tobytes()
    ref_b = ref.tobytes()
    # warm (page-in, thread spawn) on a prefix, then timed full run
    lib.refdp_collapse_model(rb, ref_b, L, min(512, n_reads), 16, 12, 2,
                             n_threads)
    t0 = time.time()
    acc = lib.refdp_collapse_model(rb, ref_b, L, n_reads, 16, 12, 2,
                                   n_threads)
    collapse_s = time.time() - t0
    if acc == 0.0 or collapse_s <= 0:
        return None
    return {
        "chain_reads_per_s": n_reads / (align_s + collapse_s),
        "align_mcells_per_s": align_rate / 1e6,
        "align_s": align_s,
        "collapse_s": collapse_s,
    }
