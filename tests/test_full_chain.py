"""Full chain (BASELINE config 3): simulated edited lineage reads ->
align -> collapse -> call -> allele table + VCF with the expected event
strings."""

import gzip

import numpy as np
import pytest

from clique_tpu.align.pipeline import align_reads
from clique_tpu.caller.events import call_events_from_bam
from clique_tpu.collapse.pipeline import collapse
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.reference.manager import ReferenceManager

RNG = np.random.default_rng(99)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

A5 = "TTCAGACGTGTGCTCTTCCGATCT"
A3 = "AGATCGGAAGAGCACACGTCTGAA"
# a CAS9 target with PAM (...GG), length 23
TARGET = "ACGTAACGTAACGTAACGTACGG"


def test_align_collapse_call_chain(tmp_path):
    ref_seq = f"{A5}{'0' * 12}{TARGET}{A3}"
    target_pos = len(A5) + 12
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{ref_seq}"
    targets: ["{TARGET}"]
    target_types: ["Cas9WT"]
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 12
        order: 0
        max_distance: 2
""")
    # CAS9 forward editing window [14, 19] within the target
    cut_lo = target_pos + 14

    fq = tmp_path / "r.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        # group A: 3 reads with a 4bp deletion in the editing window
        umi_a = "".join(chr(RNG.choice(BASES)) for _ in range(12))
        edited = ref_seq.replace("0" * 12, umi_a)
        edited = edited[:cut_lo] + edited[cut_lo + 4:]
        for k in range(3):
            fh.write(f"@del{k}\n{edited}\n+\n{'I' * len(edited)}\n")
        # group B: 3 unedited reads
        umi_b = "".join(chr(RNG.choice(BASES)) for _ in range(12))
        wt = ref_seq.replace("0" * 12, umi_b)
        for k in range(3):
            fh.write(f"@wt{k}\n{wt}\n+\n{'I' * len(wt)}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    aligned = tmp_path / "a.bam"
    align_reads(layout, rm, str(aligned), read1=str(fq), batch_size=8)
    collapsed = tmp_path / "c.bam"
    collapse(str(collapsed), layout, str(aligned))

    # allele table
    table = tmp_path / "alleles.tsv"
    n = call_events_from_bam(layout, str(collapsed), str(table),
                             min_alignment_rate=0.5, min_read_count=1)
    assert n == 2
    rows = {l.split("\t")[0]: l.split("\t")
            for l in table.read_text().splitlines()[1:]}
    alleles = {name: row[2] for name, row in rows.items()}
    del_allele = [a for name, a in alleles.items() if name.startswith("del")]
    wt_allele = [a for name, a in alleles.items() if name.startswith("wt")]
    assert del_allele and wt_allele
    assert del_allele[0] == f"4D+{cut_lo}"
    assert wt_allele[0] == "NONE"

    # VCF
    vcf = tmp_path / "out.vcf"
    call_events_from_bam(layout, str(collapsed), str(vcf),
                         min_alignment_rate=0.5, min_read_count=1)
    body = [l for l in vcf.read_text().splitlines() if not l.startswith("#")]
    assert len(body) == 1
    fields = body[0].split("\t")
    assert fields[0] == "amp1"
    assert fields[2] == f"4D+{cut_lo}"
    assert "AC=3" in fields[7]
