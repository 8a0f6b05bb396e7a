"""Router parity A/B (VERDICT r4 weak-7): the production router's
per-read choices vs our own exhaustive max-score search (= the
reference's quick_alignment_search fallback semantics,
alignment_functions.rs:693-827, last-max tie order) on a panel fixture.

The production path routes by unique-kmer vote when the top reference
holds > 0.90 of votes and falls back to the exhaustive search otherwise
— so disagreements can only come from confidently-wrong kmer votes.
This test pins the exact disagreement set on a seeded 12-guide panel at
5% substitution error (empty: every vote-routed read matches the
exhaustive argmax)."""

import os

import numpy as np
import pytest

DATA = "/root/reference/rust_cmd/test_data"
FASTA = os.path.join(DATA, "18guide1_pcr_sequence.fasta")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FASTA), reason="reference fixture mount absent")


def test_router_matches_exhaustive_on_panel(tmp_path):
    from clique_tpu.align.pipeline import BatchAligner, align_reads
    from clique_tpu.align.scoring import AffineScoring
    from clique_tpu.config.layout import SequenceLayout
    from clique_tpu.io.fastq import read_fasta
    from clique_tpu.io.sam import BamReader
    from clique_tpu.reference.manager import ReferenceManager

    refs = read_fasta(FASTA)[:12]
    layout_path = tmp_path / "layout.yaml"
    with open(layout_path, "w") as fh:
        fh.write("known_strand: true\nreads:\n  - !Read1\n"
                 "    orientation: Forward\nreferences:\n")
        for name, seq in refs:
            fh.write(f"  {name}:\n    sequence: \"{seq.decode()}\"\n")

    rng = np.random.default_rng(20260819)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    per_ref = 8
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as fh:
        for ri, (_name, seq) in enumerate(refs):
            base = np.frombuffer(seq, dtype=np.uint8)
            for k in range(per_ref):
                read = base.copy()
                subs = rng.random(len(read)) < 0.05
                read[subs] = rng.choice(bases, int(subs.sum()))
                fh.write(f"@e{ri * per_ref + k}\n"
                         f"{read.tobytes().decode()}\n+\n"
                         f"{'I' * len(read)}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out_bam = tmp_path / "o.bam"
    align_reads(layout, rm, str(out_bam), read1=str(fq), batch_size=64)

    routes = {}
    seqs = {}
    with BamReader(str(out_bam), parse_tags=False) as reader:
        for rec in reader:
            routes[rec.name] = rec.reference_name
            seqs[rec.name] = rec.seq
    assert len(routes) == len(refs) * per_ref

    # exhaustive max-score route for every read, last-max tie order
    aligner = BatchAligner(AffineScoring.aligner_default(), batch_size=64)
    names = sorted(routes, key=lambda n: int(n[1:]))
    pair_refs, pair_reads = [], []
    for n in names:
        pair_refs.extend(s for _nm, s in refs)
        pair_reads.extend([seqs[n]] * len(refs))
    outs = aligner.align_pairs(pair_refs, pair_reads)
    disagreements = []
    for si, n in enumerate(names):
        base = si * len(refs)
        best = 0
        for i in range(len(refs)):
            if outs[base + i][3] >= outs[base + best][3]:
                best = i
        if refs[best][0] != routes[n]:
            disagreements.append(n)

    # pinned disagreement set: the kmer-vote router (threshold 0.90,
    # quick_alignment_search) agrees with the exhaustive argmax on every
    # read of this seeded panel
    assert disagreements == []
