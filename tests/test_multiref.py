"""Multi-amplicon panel tests: kmer-vote and HMM routing end-to-end
(BASELINE config 5 shape)."""

import gzip

import numpy as np
import pytest

from clique_tpu.align.pipeline import align_reads
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.reference.manager import ReferenceManager
from clique_tpu.utils.read_sim import write_assignment_tsv

RNG = np.random.default_rng(31)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n):
    return RNG.choice(BASES, size=n).tobytes().decode()


def noisy(seq, sub=0.05):
    out = []
    for c in seq:
        out.append(chr(RNG.choice(BASES)) if RNG.random() < sub else c)
    return "".join(out)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("panel")
    cores = [rand_seq(70) for _ in range(3)]
    refs_yaml = "\n".join(
        f"""  amp{i}:
    sequence: "{core}{'0' * 10}"
    targets: []
    target_types: []
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 10
        order: 0
        max_distance: 2"""
        for i, core in enumerate(cores))
    layout_path = tmp / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
{refs_yaml}
""")
    fq = tmp / "reads.fastq.gz"
    truth = {}
    with gzip.open(fq, "wt") as fh:
        for i in range(30):
            k = i % 3
            umi = rand_seq(10)
            read = noisy(cores[k]) + umi
            truth[f"r{i}"] = k
            fh.write(f"@r{i}\n{read}\n+\n{'I' * len(read)}\n")
    return tmp, str(layout_path), str(fq), truth


def _check_routing(tmp, layout_path, fq, truth, router):
    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    out = tmp / f"out_{router}.sam"
    stats = align_reads(layout, rm, str(out), read1=fq, batch_size=8,
                        router=router)
    assert stats.aligned == len(truth)
    correct = 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    for line in lines:
        fields = line.split("\t")
        if fields[2] == f"amp{truth[fields[0]]}":
            correct += 1
    assert correct >= 0.9 * len(truth), f"{router}: {correct}/{len(truth)}"


def test_kmer_routing(panel):
    tmp, layout_path, fq, truth = panel
    _check_routing(tmp, layout_path, fq, truth, "kmer")


def test_hmm_routing(panel):
    tmp, layout_path, fq, truth = panel
    _check_routing(tmp, layout_path, fq, truth, "hmm")


def test_hifi_mode(panel, tmp_path):
    tmp, layout_path, fq, truth = panel
    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "hifi.sam"
    stats = align_reads(layout, rm, str(out), read1=fq, batch_size=8,
                        mode="hifi")
    assert stats.aligned == len(truth)


def test_read_sim_assignment_tsv(tmp_path):
    fq = tmp_path / "sim.fastq"
    fq.write_text(
        "@read1 ampA,+strand,10-110 length=100\nACGT\n+\nIIII\n"
        "@read2\nACGT\n+\nIIII\n")
    out = tmp_path / "assign.tsv"
    n = write_assignment_tsv(str(fq), str(out))
    assert n == 2
    lines = out.read_text().splitlines()
    assert lines[1].split("\t") == ["read1", "ampA", "10", "110"]
    assert lines[2].split("\t")[1] == ""
