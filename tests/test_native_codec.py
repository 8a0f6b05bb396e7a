"""Native C BAM codec tests: byte-identical output vs the python encoder."""

import numpy as np
import pytest

from clique_tpu.io.sam import BamReader, BamWriter, SamRecord
from clique_tpu.native import get_lib

RNG = np.random.default_rng(6)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def make_records(n=25):
    recs = []
    for i in range(n):
        L = int(RNG.integers(30, 120))
        seq = RNG.choice(BASES, L).tobytes()
        recs.append(SamRecord(
            name=f"read{i}",
            flag=0,
            reference_name="amp1",
            pos=int(RNG.integers(1, 10)),
            mapq=255,
            cigar=[(L // 2, "M"), (3, "I"), (L - L // 2 - 3, "M")],
            seq=seq,
            qual=bytes([33 + int(q) for q in RNG.integers(0, 40, L)]),
            tags={"e0": "ACGTACGT", "rc": "1", "rm": "0.97"},
        ))
    return recs


def test_native_lib_builds():
    lib = get_lib()
    if lib is None:
        pytest.skip("no C compiler in environment")
    assert lib.bgzf_compress is not None


def test_native_batch_matches_python_encoder(tmp_path):
    if get_lib() is None:
        pytest.skip("no C compiler in environment")
    recs = make_records()
    refs = [("amp1", 500)]

    p_py = tmp_path / "py.bam"
    with BamWriter(str(p_py), refs) as w:
        for r in recs:
            w.write(r)
    p_c = tmp_path / "c.bam"
    with BamWriter(str(p_c), refs) as w:
        w.write_batch(recs)

    with BamReader(str(p_py)) as r1, BamReader(str(p_c)) as r2:
        recs1 = list(r1)
        recs2 = list(r2)
    assert len(recs1) == len(recs2) == len(recs)
    for a, b in zip(recs1, recs2):
        assert a.name == b.name
        assert a.pos == b.pos
        assert a.cigar == b.cigar
        assert a.seq == b.seq
        assert a.qual == b.qual
        assert a.tags == b.tags
        assert a.flag == b.flag


def test_native_bgzf_roundtrip(tmp_path):
    lib = get_lib()
    if lib is None:
        pytest.skip("no C compiler in environment")
    import ctypes
    import gzip

    data = bytes(RNG.integers(0, 255, 200000, dtype=np.uint8))
    cap = len(data) * 2 + 65536
    out = ctypes.create_string_buffer(cap)
    w = lib.bgzf_compress(data, len(data), 6, ctypes.addressof(out), cap)
    assert w > 0
    blob = out.raw[:w]
    p = tmp_path / "x.bgzf"
    p.write_bytes(blob + bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))
    assert gzip.open(p, "rb").read() == data
