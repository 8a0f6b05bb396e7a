"""End-to-end `align` pipeline test: synthetic FASTQ -> tagged SAM/BAM with
extracted UMI tags, mirroring BASELINE config 1 (single-amplicon run)."""

import gzip
import os

import numpy as np
import pytest

from clique_tpu.align.pipeline import align_reads
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.io.sam import BamReader
from clique_tpu.reference.manager import ReferenceManager
from clique_tpu.utils.seq import reverse_complement

RNG = np.random.default_rng(123)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

ANCHOR5 = "TTCAGACGTGTGCTCTTCCGATCT"
ANCHOR3 = "AGATCGGAAGAGCACACGTCTGAA"
TARGET = "GGCACTGCGGCTGGAGGTGG"

LAYOUT_YAML = f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amplicon1:
    sequence: "{ANCHOR5}{'0' * 16}{'1' * 12}{TARGET}{ANCHOR3}"
    targets: ["{TARGET}"]
    target_types: ["Cas9WT"]
    umi_configurations:
      cell_id:
        symbol: '0'
        sort_type: "KnownTag"
        length: 16
        order: 0
        max_distance: 2
      cell_umi:
        symbol: '1'
        sort_type: "DegenerateTag"
        length: 12
        order: 1
        max_distance: 2
"""


def rand_seq(n):
    return RNG.choice(BASES, size=n).tobytes().decode()


def make_dataset(tmp_path, n_reads=40, revcomp_half=False):
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(LAYOUT_YAML)
    fastq_path = tmp_path / "reads.fastq.gz"
    truth = {}
    with gzip.open(fastq_path, "wt") as fh:
        for i in range(n_reads):
            cell = rand_seq(16)
            umi = rand_seq(12)
            read = f"{ANCHOR5}{cell}{umi}{TARGET}{ANCHOR3}"
            name = f"read{i}"
            truth[name] = (cell, umi)
            if revcomp_half and i % 2 == 1:
                read = reverse_complement(read)
            fh.write(f"@{name}\n{read}\n+\n{'I' * len(read)}\n")
    return str(layout_path), str(fastq_path), truth


def test_align_end_to_end_sam(tmp_path):
    layout_path, fastq_path, truth = make_dataset(tmp_path)
    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    stats = align_reads(layout, rm, str(out), read1=fastq_path, batch_size=16)
    assert stats.aligned == len(truth)

    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == len(truth)
    for line in lines:
        fields = line.split("\t")
        name = fields[0]
        tags = dict(f.split(":", 2)[::2] for f in fields[11:])
        cell, umi = truth[name]
        assert tags["e0"] == cell, f"{name}: {tags['e0']} != {cell}"
        assert tags["e1"] == umi
        assert tags["rc"] == "1"
        assert tags["ar"] == name
        # perfect reads over the wildcard reference: rate 1 on real columns
        assert float(tags["rm"]) == 1.0
        assert fields[2] == "amplicon1"
        assert fields[3] == "1"


def test_align_end_to_end_bam_roundtrip(tmp_path):
    layout_path, fastq_path, truth = make_dataset(tmp_path, n_reads=10)
    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.bam"
    align_reads(layout, rm, str(out), read1=fastq_path, batch_size=4)

    with BamReader(str(out)) as reader:
        assert reader.references[0][0] == "amplicon1"
        records = list(reader)
    assert len(records) == len(truth)
    for rec in records:
        cell, umi = truth[rec.name]
        assert rec.tags["e0"] == cell
        assert rec.tags["e1"] == umi
        assert rec.reference_name == "amplicon1"
        assert rec.pos == 1
        # sequence survives the 4-bit BAM encode/decode
        assert len(rec.seq) > 0
        assert rec.cigar_string.endswith("M") or "M" in rec.cigar_string


def test_align_orients_reverse_reads(tmp_path):
    yaml_unknown = LAYOUT_YAML.replace("known_strand: true",
                                       "known_strand: false")
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(yaml_unknown)
    fastq_path = tmp_path / "reads.fastq.gz"
    truth = {}
    import gzip as _gz
    with _gz.open(fastq_path, "wt") as fh:
        for i in range(8):
            cell = rand_seq(16)
            umi = rand_seq(12)
            read = f"{ANCHOR5}{cell}{umi}{TARGET}{ANCHOR3}"
            if i % 2 == 1:
                read = reverse_complement(read)
            truth[f"r{i}"] = (cell, umi)
            fh.write(f"@r{i}\n{read}\n+\n{'I' * len(read)}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    align_reads(layout, rm, str(out), read1=str(fastq_path), batch_size=4)
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == 8
    for line in lines:
        fields = line.split("\t")
        tags = dict(f.split(":", 2)[::2] for f in fields[11:])
        cell, umi = truth[fields[0]]
        assert tags["e0"] == cell
        assert tags["e1"] == umi


MIDDLE_A = "ACGTACGTACGTACGTACGT"
MIDDLE_B = "TGCATGCATGCATGCATGCA"

TWO_REF_YAML = f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  ampA:
    sequence: "{ANCHOR5}{MIDDLE_A}{TARGET}{ANCHOR3}"
    targets: ["{TARGET}"]
    target_types: ["Cas9WT"]
    umi_configurations: {{}}
  ampB:
    sequence: "{ANCHOR5}{MIDDLE_B}{TARGET}{ANCHOR3}"
    targets: ["{TARGET}"]
    target_types: ["Cas9WT"]
    umi_configurations: {{}}
"""


def test_align_exhaustive_search_batched(tmp_path):
    """quick_match_threshold > 1 forces every read down the exhaustive-search
    path (align vs every voted candidate, best score wins); reads must still
    land on their own amplicon."""
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(TWO_REF_YAML)
    fastq_path = tmp_path / "reads.fastq.gz"
    truth = {}
    with gzip.open(fastq_path, "wt") as fh:
        for i in range(12):
            mid = MIDDLE_A if i % 2 == 0 else MIDDLE_B
            ref = "ampA" if i % 2 == 0 else "ampB"
            read = f"{ANCHOR5}{mid}{TARGET}{ANCHOR3}"
            truth[f"x{i}"] = ref
            fh.write(f"@x{i}\n{read}\n+\n{'I' * len(read)}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    stats = align_reads(layout, rm, str(out), read1=str(fastq_path),
                        batch_size=4, quick_match_threshold=1.01)
    assert stats.aligned == len(truth)
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(lines) == len(truth)
    for line in lines:
        fields = line.split("\t")
        assert fields[2] == truth[fields[0]], fields[0]


def test_cli_help_and_version_smoke():
    from clique_tpu.cli import main

    import pytest as _pytest
    with _pytest.raises(SystemExit) as e:
        main(["align", "--help"])
    assert e.value.code == 0
    with _pytest.raises(SystemExit):
        main([])  # missing subcommand


def test_align_min_read_length_drops_short_reads(tmp_path):
    """--min-read-length gates short reads out before alignment. The
    reference parses the flag (main.rs:183-185) but never applies it
    (`_min_read_length`, alignment_functions.rs:532); we enforce the
    documented intent."""
    layout_path, fastq_path, truth = make_dataset(tmp_path, n_reads=6)
    # append two short reads below the gate
    with gzip.open(fastq_path, "at") as fh:
        fh.write("@short1\nACGTACGT\n+\nIIIIIIII\n")
        fh.write("@short2\nACGTACGTACGTACGTACGTACGT\n+\n"
                 + "I" * 24 + "\n")
    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    stats = align_reads(layout, rm, str(out), read1=fastq_path,
                        batch_size=4, min_read_length=50)
    assert stats.total == len(truth) + 2
    assert stats.dropped_short == 2
    assert stats.aligned == len(truth)
    lines = [l for l in out.read_text().splitlines()
             if not l.startswith("@")]
    names = {l.split("\t")[0] for l in lines}
    assert "short1" not in names and "short2" not in names


def test_batched_record_builder_matches_slow_path(tmp_path):
    """_fill_records_from_raw (batch-level numpy record construction) must
    produce byte-identical SamRecords to the per-read
    AlignedRead.to_sam_record/_make_record path, including tag order,
    digit captures through indels, rm/rs/as formatting and NaN rates."""
    from clique_tpu.align.pipeline import (
        AlignedRead, BatchAligner, _Pending, _fill_records_from_raw,
        _make_record)
    from clique_tpu.align.scoring import AffineScoring

    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(LAYOUT_YAML)
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    ref_seq = rm.references[0].sequence

    reads = []
    for i in range(9):
        arr = np.frombuffer(
            ref_seq.replace(b"0", b"A").replace(b"1", b"C"),
            dtype=np.uint8).copy()
        subs = RNG.random(len(arr)) < 0.08
        arr[subs] = RNG.choice(BASES, int(subs.sum()))
        read = arr.tobytes()
        if i % 3 == 1:        # deletion inside the cell-id zone
            read = read[:28] + read[31:]
        if i % 3 == 2:        # insertion
            read = read[:50] + b"GGTT" + read[50:]
        reads.append(read)

    pending = [_Pending(name=f"r{i}", seq=s, quals=b"I" * len(s), ref_id=0)
               for i, s in enumerate(reads)]
    aligner = BatchAligner(AffineScoring.aligner_default(), batch_size=4)
    refs = [ref_seq] * len(pending)

    fast = [None] * len(pending)
    for raw in aligner.align_pairs_raw(refs, [p.seq for p in pending]):
        _fill_records_from_raw(raw, pending, fast, layout, rm,
                               report_zero_score=False)

    out = aligner.align_pairs(refs, [p.seq for p in pending])
    slow = []
    for p, (a1, a2, cigar, score) in zip(pending, out):
        slow.append(_make_record(AlignedRead(
            read_name=p.name, reference_name=rm.references[0].name,
            reference_aligned=a1, read_aligned=a2, quals=p.quals,
            cigar=cigar, score=score), layout))

    for f, s in zip(fast, slow):
        assert f == s, (f, s)


def test_cigars_from_ops_batch_matches_row_rle():
    from clique_tpu.align.batch import (cigar_from_ops_row,
                                        cigars_from_ops_batch)

    ops = RNG.integers(0, 3, size=(17, 33)).astype(np.uint8)
    n_ops = RNG.integers(0, 34, size=17).astype(np.int32)
    n_ops[0] = 0
    n_ops[1] = 33
    batch = cigars_from_ops_batch(ops, n_ops)
    for b in range(17):
        assert batch[b] == cigar_from_ops_row(ops[b], int(n_ops[b]))


def test_align_rejects_layout_without_read1(tmp_path):
    """A single read1 stream against a layout that declares only Read2
    must still raise unify_read's unsupported-structure error — the
    single-stream fast path may not silently treat the stream as Read1."""
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(LAYOUT_YAML.replace("!Read1", "!Read2"))
    fastq_path = tmp_path / "reads.fastq"
    read = f"{ANCHOR5}{rand_seq(16)}{rand_seq(12)}{TARGET}{ANCHOR3}"
    fastq_path.write_text(f"@r0\n{read}\n+\n{'I' * len(read)}\n")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    with pytest.raises(ValueError, match="read structure"):
        align_reads(layout, rm, str(tmp_path / "out.sam"),
                    read1=str(fastq_path), batch_size=4)
