"""Native C batch BAM decoder vs the pure-python record parser: identical
SamRecords for every field, including tags and missing quals."""

import numpy as np
import pytest

import clique_tpu.native as native
from clique_tpu.io.sam import BamReader, BamWriter, SamRecord

RNG = np.random.default_rng(11)
BASES = "ACGTN"


def _mk_records(n=300):
    recs = []
    for i in range(n):
        L = int(RNG.integers(1, 200))
        seq = "".join(RNG.choice(list(BASES), L))
        qual = ("I" * L) if i % 7 else "*"
        cigar = [(L, "M")] if i % 3 else [(L // 2, "M"), (2, "I"),
                                          (L - L // 2 - 2, "M"), (3, "D")]
        recs.append(SamRecord(
            name=f"read{i}", flag=0 if i % 5 else 0x100,
            reference_name="amp", pos=int(RNG.integers(1, 50)),
            mapq=60, cigar=cigar, seq=seq.encode(), qual=qual.encode()
            if qual != "*" else b"*",
            tags={"e0": "ACGT" * (i % 3 + 1), "ar": f"read{i}",
                  "rm": "0.95"}))
    return recs


def _read_all(path, parse_tags=True, force_python=False):
    saved = (native._LIB, native._TRIED)
    try:
        if force_python:
            native._LIB, native._TRIED = None, True
        with BamReader(path, parse_tags=parse_tags) as r:
            return list(r)
    finally:
        native._LIB, native._TRIED = saved


def test_native_decode_matches_python(tmp_path):
    if native.get_lib() is None:
        pytest.skip("no C compiler")
    path = str(tmp_path / "x.bam")
    recs = _mk_records()
    with BamWriter(path, [("amp", 1000)]) as w:
        w.write_batch(recs)

    fast = _read_all(path)
    slow = _read_all(path, force_python=True)
    assert len(fast) == len(slow) == len(recs)
    for a, b in zip(fast, slow):
        assert a.name == b.name
        assert a.flag == b.flag
        assert a.reference_name == b.reference_name
        assert a.pos == b.pos
        assert a.mapq == b.mapq
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        assert a.qual == b.qual
        assert a.tags == b.tags

    # parse_tags=False drops tags on both paths
    fast_nt = _read_all(path, parse_tags=False)
    assert all(not r.tags for r in fast_nt)
    assert [r.seq for r in fast_nt] == [r.seq for r in fast]
