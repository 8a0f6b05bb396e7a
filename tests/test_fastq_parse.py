"""Block-based FASTQ parser edge cases (io/fastq.py fastq_records).

The parser replaces the reference's rust-htslib/bio record iteration
(/root/reference/rust_cmd/src/read_strategies/read_set.rs:73-132); these
tests pin its semantics across block boundaries, gzip, truncated trailing
records, and name/comment splitting.
"""

import gzip

import pytest

from clique_tpu.io.fastq import FastqRecord, ReadIterator, fastq_records


def _write(tmp_path, body: bytes, gz: bool = False):
    p = tmp_path / ("reads.fastq.gz" if gz else "reads.fastq")
    data = gzip.compress(body) if gz else body
    p.write_bytes(data)
    return str(p)


def test_basic_records(tmp_path):
    path = _write(tmp_path, b"@r1 comment here\nACGT\n+\nIIII\n"
                            b"@r2\nGGCC\n+anything\nFFFF\n")
    recs = list(fastq_records(path))
    assert recs == [FastqRecord("r1", b"ACGT", b"IIII"),
                    FastqRecord("r2", b"GGCC", b"FFFF")]


def test_gzip_transparent(tmp_path):
    path = _write(tmp_path, b"@a\nAC\n+\nII\n@b\nGT\n+\nFF\n", gz=True)
    assert [r.name for r in fastq_records(path)] == ["a", "b"]


def test_no_trailing_newline(tmp_path):
    path = _write(tmp_path, b"@a\nAC\n+\nII\n@b\nGT\n+\nFF")
    recs = list(fastq_records(path))
    assert recs[-1] == FastqRecord("b", b"GT", b"FF")
    assert len(recs) == 2


def test_truncated_record_with_seq_still_emitted(tmp_path):
    # header + seq but no qual: the reader emits it (matching the old
    # line-by-line reader, which only stopped when BOTH were empty)
    path = _write(tmp_path, b"@a\nAC\n+\nII\n@b\nGT\n")
    recs = list(fastq_records(path))
    assert recs[-1] == FastqRecord("b", b"GT", b"")


def test_bare_trailing_header_dropped(tmp_path):
    path = _write(tmp_path, b"@a\nAC\n+\nII\n@b\n")
    assert len(list(fastq_records(path))) == 1


def test_empty_file(tmp_path):
    assert list(fastq_records(_write(tmp_path, b""))) == []


def test_records_spanning_block_boundary(tmp_path, monkeypatch):
    # force a pathological block size so every record straddles real
    # block boundaries in the REAL parser
    import clique_tpu.io.fastq as fq

    body = b"".join(
        b"@read%d some comment\n%s\n+\n%s\n"
        % (i, b"ACGT" * 10, b"I" * 40) for i in range(100))
    path = _write(tmp_path, body)
    whole = list(fastq_records(path))
    assert len(whole) == 100
    assert whole[7].name == "read7"
    assert whole[7].seq == b"ACGT" * 10

    monkeypatch.setattr(fq, "_FASTQ_BLOCK", 7)
    assert list(fastq_records(path)) == whole


def test_blank_line_run_stops_stream(tmp_path, monkeypatch):
    # a group with empty seq AND qual terminates the stream (old
    # line-by-line reader semantics), mid-file and as EOF padding,
    # at any block size
    import clique_tpu.io.fastq as fq

    trailing = _write(tmp_path, b"@a\nAC\n+\nII\n\n\n\n\n")
    assert [r.name for r in fastq_records(trailing)] == ["a"]

    (tmp_path / "mid.fastq").write_bytes(
        b"@a\nAC\n+\nII\n\n\n\n\n@b\nGT\n+\nFF\n")
    assert [r.name for r in fastq_records(str(tmp_path / "mid.fastq"))] \
        == ["a"]

    monkeypatch.setattr(fq, "_FASTQ_BLOCK", 5)
    assert [r.name for r in fastq_records(trailing)] == ["a"]
    assert [r.name for r in fastq_records(str(tmp_path / "mid.fastq"))] \
        == ["a"]


def test_single_stream_detection(tmp_path):
    r1 = _write(tmp_path, b"@a\nAC\n+\nII\n")
    it = ReadIterator(r1)
    assert it.single_stream
    assert [r.name for r in it.read_one_records()] == ["a"]

    (tmp_path / "r2.fastq").write_bytes(b"@a\nGG\n+\nII\n")
    it2 = ReadIterator(r1, str(tmp_path / "r2.fastq"))
    assert not it2.single_stream


def test_native_scanner_matches_python_parser(tmp_path):
    """The C fastq_scan path must yield byte-identical records to the
    pure-python block parser on tricky inputs: multi-block files, names
    with spaces, CR line endings kept verbatim, blank-group termination,
    and a trailing partial record."""
    import numpy as np

    from clique_tpu.io.fastq import _fastq_records_py, fastq_records
    from clique_tpu.native import get_lib

    if get_lib() is None:
        import pytest
        pytest.skip("no C compiler")

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)

    def mk(n, partial=False, blank_at=None, crlf=False):
        out = []
        for i in range(n):
            L = int(rng.integers(1, 400))
            seq = rng.choice(bases, L).tobytes().decode()
            name = f"r{i} extra comment" if i % 3 == 0 else f"r{i}"
            eol = "\r\n" if crlf else "\n"
            if blank_at is not None and i == blank_at:
                out.append(f"@pad{eol}{eol}+{eol}{eol}")
                continue
            out.append(f"@{name}{eol}{seq}{eol}+{eol}{'I' * L}{eol}")
        text = "".join(out)
        if partial:
            text += "@trailing\nACGT\n+"
        return text.encode()

    cases = [mk(50), mk(2000), mk(10, partial=True),
             mk(20, blank_at=7), mk(30, crlf=True), b"", b"@only\n"]
    for ci, data in enumerate(cases):
        p = tmp_path / f"case{ci}.fastq"
        p.write_bytes(data)
        nat = list(fastq_records(str(p)))
        py = list(_fastq_records_py(str(p)))
        assert nat == py, f"case {ci}: {len(nat)} vs {len(py)}"
