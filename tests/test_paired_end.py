"""Paired-end Illumina end-to-end: MergeStrategy Align (overlap consensus
batched through the device) and Concatenate, then alignment + extraction."""

import gzip

import numpy as np
import pytest

from clique_tpu.align.pipeline import align_reads
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.reference.manager import ReferenceManager
from clique_tpu.utils.seq import reverse_complement

RNG = np.random.default_rng(61)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

A5 = "TTCAGACGTGTGCTCTTCCGATCT"
A3 = "AGATCGGAAGAGCACACGTCTGAA"
T = "GGCACTGCGGCTGGAGGTGGAACCTTGGAACC"


def rand_seq(n):
    return RNG.choice(BASES, size=n).tobytes().decode()


def _layout(tmp_path, merge):
    p = tmp_path / "layout.yaml"
    p.write_text(f"""
known_strand: true
merge: "{merge}"
reads:
  - !Read1
    orientation: Forward
  - !Read2
    orientation: {"ReverseComplement" if merge != "Align" else "Forward"}
references:
  amp1:
    sequence: "{A5}{'0' * 12}{T}{A3}"
    targets: []
    target_types: []
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 12
        order: 0
        max_distance: 2
""")
    return str(p)


def test_align_merge_strategy(tmp_path):
    layout_path = _layout(tmp_path, "Align")
    r1p = tmp_path / "r1.fastq.gz"
    r2p = tmp_path / "r2.fastq.gz"
    truth = {}
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(10):
            umi = rand_seq(12)
            full = A5 + umi + T + A3
            truth[f"p{i}"] = umi
            # R1 = first 60bp; R2 = revcomp of last 60bp (overlap in middle)
            r1 = full[:60]
            r2 = reverse_complement(full[-60:])
            f1.write(f"@p{i}\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@p{i}\n{r2}\n+\n{'I' * len(r2)}\n")

    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    stats = align_reads(layout, rm, str(out), read1=str(r1p), read2=str(r2p),
                        batch_size=4)
    assert stats.aligned == 10
    for line in out.read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        tags = dict(t.split(":", 2)[::2] for t in f[11:])
        assert tags["e0"] == truth[f[0]], (f[0], tags["e0"])
        assert float(tags["rm"]) == 1.0


def test_concatenate_strategy(tmp_path):
    layout_path = _layout(tmp_path, "Concatenate")
    r1p = tmp_path / "r1.fastq.gz"
    r2p = tmp_path / "r2.fastq.gz"
    truth = {}
    with gzip.open(r1p, "wt") as f1, gzip.open(r2p, "wt") as f2:
        for i in range(6):
            umi = rand_seq(12)
            full = A5 + umi + T + A3
            truth[f"c{i}"] = umi
            half = len(full) // 2
            r1 = full[:half]
            r2 = reverse_complement(full[half:])  # layout revcomps it back
            f1.write(f"@c{i}\n{r1}\n+\n{'I' * len(r1)}\n")
            f2.write(f"@c{i}\n{r2}\n+\n{'I' * len(r2)}\n")

    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    stats = align_reads(layout, rm, str(out), read1=str(r1p), read2=str(r2p),
                        batch_size=4)
    assert stats.aligned == 6
    for line in out.read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        tags = dict(t.split(":", 2)[::2] for t in f[11:])
        assert tags["e0"] == truth[f[0]]


def test_index_read_concatenation(tmp_path):
    """Index1 participates in the concatenation layout (merger.rs decision
    tree (true,true,true,false) arm)."""
    layout_path = tmp_path / "layout.yaml"
    umi_len = 8
    layout_path.write_text(f"""
known_strand: true
merge: "Concatenate"
reads:
  - !Index1
    orientation: Forward
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{'0' * umi_len}{A5}{T}{A3}"
    targets: []
    target_types: []
    umi_configurations:
      idx:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: {umi_len}
        order: 0
        max_distance: 2
""")
    r1p = tmp_path / "r1.fastq.gz"
    i1p = tmp_path / "i1.fastq.gz"
    truth = {}
    with gzip.open(r1p, "wt") as f1, gzip.open(i1p, "wt") as fi:
        for i in range(5):
            idx = rand_seq(umi_len)
            truth[f"x{i}"] = idx
            body = A5 + T + A3
            f1.write(f"@x{i}\n{body}\n+\n{'I' * len(body)}\n")
            fi.write(f"@x{i}\n{idx}\n+\n{'I' * umi_len}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    stats = align_reads(layout, rm, str(out), read1=str(r1p),
                        index1=str(i1p), batch_size=4)
    assert stats.aligned == 5
    for line in out.read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        tags = dict(t.split(":", 2)[::2] for t in f[11:])
        assert tags["e0"] == truth[f[0]]
