"""Collapse checkpoint/resume tests (SURVEY section 5: the reference's
implicit shardio temp levels made explicit and resumable)."""

import gzip

import numpy as np
import pytest

from clique_tpu.align.pipeline import align_reads
from clique_tpu.collapse.pipeline import collapse
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.io.sam import BamReader
from clique_tpu.reference.manager import ReferenceManager

RNG = np.random.default_rng(51)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
A5 = "TTCAGACGTGTGCTCTTCCGATCT"
A3 = "AGATCGGAAGAGCACACGTCTGAA"
T = "GGCACTGCGGCTGGAGGTGG"


def setup_dataset(tmp_path):
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{A5}{'0' * 12}{'1' * 10}{T}{A3}"
    targets: ["{T}"]
    target_types: ["Cas9WT"]
    umi_configurations:
      cell: {{symbol: '0', sort_type: "DegenerateTag", length: 12, order: 0, max_distance: 2}}
      umi: {{symbol: '1', sort_type: "DegenerateTag", length: 10, order: 1, max_distance: 2}}
""")
    fq = tmp_path / "r.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        for i in range(12):
            cell = RNG.choice(BASES, 12).tobytes().decode()
            umi = RNG.choice(BASES, 10).tobytes().decode()
            for k in range(2):
                read = A5 + cell + umi + T + A3
                fh.write(f"@x{i}_{k}\n{read}\n+\n{'I' * len(read)}\n")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(bam), read1=str(fq), batch_size=8)
    return layout, str(bam)


def test_checkpoint_resume_produces_identical_output(tmp_path):
    layout, bam = setup_dataset(tmp_path)
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()

    out1 = tmp_path / "c1.bam"
    collapse(str(out1), layout, bam, temp_dir=str(ckpt_dir), checkpoint=True)
    # checkpoints were written
    assert list(ckpt_dir.glob("collapse.amp1.level*.ckpt"))

    # "resume" run: checkpoints exist, so levels are skipped entirely
    out2 = tmp_path / "c2.bam"
    collapse(str(out2), layout, bam, temp_dir=str(ckpt_dir), checkpoint=True)

    with BamReader(str(out1)) as r1, BamReader(str(out2)) as r2:
        recs1 = [(r.name, r.seq, tuple(sorted(r.tags.items()))) for r in r1]
        recs2 = [(r.name, r.seq, tuple(sorted(r.tags.items()))) for r in r2]
    assert recs1 == recs2
    assert len(recs1) == 12


def test_no_checkpoint_without_flag(tmp_path):
    layout, bam = setup_dataset(tmp_path)
    ckpt_dir = tmp_path / "ckpt2"
    ckpt_dir.mkdir()
    out = tmp_path / "c.bam"
    collapse(str(out), layout, bam, temp_dir=str(ckpt_dir), checkpoint=False)
    assert not list(ckpt_dir.glob("*.ckpt"))
