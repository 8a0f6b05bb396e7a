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


def _corrupt_bam(tmp_path, mutate):
    """Write a small valid BAM, then corrupt the first record's fixed
    header via `mutate(header_bytearray)` and rewrite it BGZF-compressed."""
    import gzip
    import struct

    path = str(tmp_path / "ok.bam")
    with BamWriter(path, [("amp", 1000)]) as w:
        w.write_batch(_mk_records(4))
    raw = bytearray(gzip.open(path, "rb").read())
    # skip BAM header: magic(4) l_text(4) text n_ref(4) per-ref entries
    (l_text,) = struct.unpack("<i", raw[4:8])
    off = 8 + l_text
    (n_ref,) = struct.unpack("<i", raw[off:off + 4])
    off += 4
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", raw[off:off + 4])
        off += 4 + l_name + 4
    body = raw[off + 4:off + 4 + struct.unpack("<i", raw[off:off + 4])[0]]
    mutate(body)
    raw[off + 4:off + 4 + len(body)] = body
    bad = str(tmp_path / "bad.bam")
    with gzip.open(bad, "wb") as fh:
        fh.write(bytes(raw))
    return bad


@pytest.mark.parametrize("mutate", [
    # l_seq claimed far beyond the block
    lambda b: b.__setitem__(slice(16, 20), (1 << 24).to_bytes(4, "little")),
    # negative l_seq (passes naive caps, drives negative copy lengths)
    lambda b: b.__setitem__(slice(16, 20), (-5).to_bytes(4, "little",
                                                         signed=True)),
    # l_read_name = 0 → memcpy size (size_t)(-1) without validation
    lambda b: b.__setitem__(8, 0),
], ids=["lseq-overflow", "lseq-negative", "lname-zero"])
def test_native_decode_rejects_malformed(tmp_path, mutate):
    """decode_bam_records must validate header-claimed sizes before copying
    (advisor finding: hostile BAMs reach this path via collapse)."""
    if native.get_lib() is None:
        pytest.skip("no C compiler")
    bad = _corrupt_bam(tmp_path, mutate)
    with pytest.raises(ValueError, match="malformed BAM record"):
        _read_all(bad)
