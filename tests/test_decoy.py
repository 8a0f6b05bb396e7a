"""Background-reference subtraction (BASELINE config 4): a decoy reference
in the panel absorbs off-target reads so the amplicon's groups stay clean."""

import gzip

import numpy as np
import pytest

from clique_tpu.align.pipeline import align_reads
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.reference.manager import ReferenceManager

RNG = np.random.default_rng(71)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

A5 = "TTCAGACGTGTGCTCTTCCGATCT"
A3 = "AGATCGGAAGAGCACACGTCTGAA"
T = "GGCACTGCGGCTGGAGGTGG"


def rand_seq(n):
    return RNG.choice(BASES, size=n).tobytes().decode()


def test_decoy_reference_subtraction(tmp_path):
    decoy = rand_seq(120)  # stands in for an hg38 fragment
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{A5}{'0' * 12}{T}{A3}"
    targets: ["{T}"]
    target_types: ["Cas9WT"]
    umi_configurations:
      cell: {{symbol: '0', sort_type: "DegenerateTag", length: 12, order: 0, max_distance: 2}}
  decoy_hg38:
    sequence: "{decoy}"
    targets: []
    target_types: []
    umi_configurations: {{}}
""")
    fq = tmp_path / "r.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        for i in range(10):
            read = A5 + rand_seq(12) + T + A3
            fh.write(f"@amp{i}\n{read}\n+\n{'I' * len(read)}\n")
        for i in range(6):
            # genomic background: noisy copies of the decoy
            read = "".join(
                chr(RNG.choice(BASES)) if RNG.random() < 0.03 else c
                for c in decoy)
            fh.write(f"@bg{i}\n{read}\n+\n{'I' * len(read)}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "out.sam"
    stats = align_reads(layout, rm, str(out), read1=str(fq), batch_size=8)
    assert stats.aligned == 16

    routed = {}
    for line in out.read_text().splitlines():
        if line.startswith("@"):
            continue
        f = line.split("\t")
        routed[f[0]] = f[2]
    for name, ref in routed.items():
        if name.startswith("amp"):
            assert ref == "amp1", (name, ref)
        else:
            assert ref == "decoy_hg38", (name, ref)
