"""Chunk-index sidecar (<bam>.cqi): minting, byte-range reads, merge
translation, and the stale-sidecar guard."""

import numpy as np

from clique_tpu.io.sam import (BamReader, BamWriter, SamRecord,
                               concat_bam_parts, decode_record_stream,
                               read_cqi, read_voffset_range, write_cqi)

REFS = [("amp1", 200)]


def _rec(name, seq=b"ACGTACGTACGT"):
    return SamRecord(name=name, flag=0, reference_name="amp1", pos=1,
                     mapq=40, cigar=[(len(seq), "M")], seq=seq,
                     qual=b"I" * len(seq), tags={"ar": name})


def _write_bam(path, n, cqi_every=4):
    with BamWriter(str(path), REFS) as w:
        w._cqi_every = cqi_every
        for i in range(n):
            w.write(_rec(f"r{i}"))
    # close() appended the (end, total) sentinel
    write_cqi(str(path), w.chunk_offsets)
    return w.chunk_offsets


def test_cqi_ranges_cover_all_records(tmp_path):
    bam = tmp_path / "a.bam"
    _write_bam(bam, 23, cqi_every=4)
    pairs = read_cqi(str(bam))
    assert pairs is not None and len(pairs) > 3
    # sentinel: end-of-records voffset + total records
    assert pairs[-1][1] == 23
    with BamReader(str(bam)) as reader:
        references = reader.references
        want = [r.name for r in reader]
    got = []
    for i in range(len(pairs) - 1):
        chunk = read_voffset_range(str(bam), pairs[i][0], pairs[i + 1][0])
        names = [r.name for r in decode_record_stream(chunk, references)]
        # ordinal base matches the position of the chunk's first record
        assert pairs[i][1] == len(got)
        got.extend(names)
    assert got == want


def test_stale_cqi_rejected(tmp_path):
    bam = tmp_path / "a.bam"
    _write_bam(bam, 10)
    assert read_cqi(str(bam)) is not None
    # rewrite the BAM with MORE records; keep the old sidecar
    with BamWriter(str(bam), REFS) as w:
        for i in range(20):
            w.write(_rec(f"x{i}"))
    assert read_cqi(str(bam)) is None


def test_truncated_cqi_treated_as_absent(tmp_path):
    bam = tmp_path / "a.bam"
    _write_bam(bam, 10)
    cqi = tmp_path / "a.bam.cqi"
    raw = cqi.read_bytes()
    cqi.write_bytes(raw[: len(raw) // 2])   # crash mid-write
    assert read_cqi(str(bam)) is None


def test_concat_refuses_mismatched_part_header(tmp_path):
    import pytest

    part = tmp_path / "part.bam"
    _write_bam(part, 3)
    out = tmp_path / "m.bam"
    # different reference list -> different compressed header size: the
    # raw block append would corrupt silently, so the merge must refuse
    with pytest.raises(ValueError, match="header"):
        concat_bam_parts(str(out), [("other_ref", 999)], [str(part)])


def test_concat_translates_cqi(tmp_path):
    parts = []
    for p, n in enumerate((9, 0, 14)):
        path = tmp_path / f"part{p}.bam"
        _write_bam(path, n, cqi_every=4)
        parts.append(str(path))
    out = tmp_path / "merged.bam"
    concat_bam_parts(str(out), REFS, parts)
    pairs = read_cqi(str(out))
    assert pairs is not None
    assert pairs[-1][1] == 23          # ordinals shifted across parts
    with BamReader(str(out)) as reader:
        references = reader.references
        want = [r.name for r in reader]
    got = []
    for i in range(len(pairs) - 1):
        chunk = read_voffset_range(str(out), pairs[i][0], pairs[i + 1][0])
        got.extend(r.name for r in decode_record_stream(chunk, references))
    assert got == want
