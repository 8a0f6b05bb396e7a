"""Lifted-knob flags must actually change behavior (VERDICT r1 item 10:
the reference hardcodes these - SURVEY section 5 asks them in config)."""

import gzip

import numpy as np

from clique_tpu.align.pipeline import align_reads
from clique_tpu.collapse.pipeline import collapse
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.io.sam import BamReader
from clique_tpu.reference.manager import ReferenceManager

RNG = np.random.default_rng(9191)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

A5 = "TTCAGACGTGTGCTCTTCCGATCT"
A3 = "AGATCGGAAGAGCACACGTCTGAA"
TARGET = "GGCACTGCGGCTGGAGGTGG"


def build(tmp_path, n_reads=6):
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{A5}{'0' * 12}{TARGET}{A3}"
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 12
        order: 0
        max_distance: 2
""")
    umi = RNG.choice(BASES, 12).tobytes().decode()
    fq = tmp_path / "r.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        for i in range(n_reads):
            read = A5 + umi + TARGET + A3
            fh.write(f"@r{i}\n{read}\n+\n{'I' * len(read)}\n")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    aligned = tmp_path / "a.bam"
    align_reads(layout, rm, str(aligned), read1=str(fq), batch_size=8)
    return layout, str(aligned)


def test_downsample_cap_changes_dc_tag(tmp_path):
    layout, aligned = build(tmp_path, n_reads=6)
    out = tmp_path / "c.bam"
    collapse(str(out), layout, aligned, downsample_cap=3)
    with BamReader(str(out)) as r:
        recs = list(r)
    assert len(recs) == 1
    assert recs[0].tags["rc"] == "6"
    assert recs[0].tags["dc"] == "3"   # capped by the knob, not 40


def test_min_aligned_bases_filter_knob(tmp_path):
    layout, aligned = build(tmp_path)
    out = tmp_path / "c.bam"
    # the amplicon has ~68 alignable (non-wildcard) columns; an impossible
    # requirement must drop every read
    stats = collapse(str(out), layout, aligned, min_aligned_bases=1000)
    assert stats.passing == 0


def test_gap_call_threshold_knob(tmp_path):
    """gap_call_threshold=0.1 calls a gap wherever >=10% of members have
    one (here the 1/6 minority deletion); the default 0.75 outvotes it."""
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{A5}{'0' * 12}{TARGET}{A3}"
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 12
        order: 0
        max_distance: 2
""")
    umi = RNG.choice(BASES, 12).tobytes().decode()
    full = A5 + umi + TARGET + A3
    cut = len(A5) + 12 + 5
    with_del = full[:cut] + full[cut + 2:]
    fq = tmp_path / "r.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        for i in range(5):
            fh.write(f"@r{i}\n{full}\n+\n{'I' * len(full)}\n")
        fh.write(f"@rdel\n{with_del}\n+\n{'I' * len(with_del)}\n")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    aligned = tmp_path / "a.bam"
    align_reads(layout, rm, str(aligned), read1=str(fq), batch_size=8)

    out_default = tmp_path / "cd.bam"
    collapse(str(out_default), layout, str(aligned))
    out_low = tmp_path / "cz.bam"
    collapse(str(out_low), layout, str(aligned), gap_call_threshold=0.1)
    with BamReader(str(out_default)) as r:
        seq_default = list(r)[0].seq
    with BamReader(str(out_low)) as r:
        seq_low = list(r)[0].seq
    assert len(seq_default) == len(full)      # majority outvotes the del
    assert len(seq_low) == len(full) - 2     # knob forces the gap call


def test_cli_knob_flags_parse(tmp_path):
    """The CLI accepts every lifted knob (end-to-end parse check)."""
    from clique_tpu.cli import main

    layout, aligned = build(tmp_path, n_reads=2)
    out = tmp_path / "cli.bam"
    rc = main([
        "collapse", "--read-structure", str(tmp_path / "layout.yaml"),
        "--input-bam-file", aligned, "--output-bam-file", str(out),
        "--min-aligned-bases", "40", "--min-identity", "0.7",
        "--gap-call-threshold", "0.8", "--downsample-cap", "10",
    ])
    assert rc == 0
    with BamReader(str(out)) as r:
        assert len(list(r)) == 1
