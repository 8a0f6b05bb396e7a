"""Batched anchored alignment for long reads (VERDICT r1 item 7): the
device-batched sub-DP path must equal align_string_with_anchors (host
golden), do far less DP work than a full fill, and be wired into
align_reads for reads >= anchored_min_length
(linked_alignment.rs:147-266 via alignment_functions.rs:260-321)."""

import gzip

import numpy as np

from clique_tpu.align.anchored import (
    AnchoredBatchAligner,
    align_string_with_anchors,
)
from clique_tpu.align.pipeline import BatchAligner, align_reads
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.io.sam import BamReader
from clique_tpu.reference.manager import (
    ReferenceManager,
    SeedIndex,
    find_greedy_non_overlapping_segments,
)

RNG = np.random.default_rng(808)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
SCORING = AffineScoring.aligner_default()


def make_long_pair(n=3000, subs=20, indels=3):
    ref = RNG.choice(BASES, n).tobytes()
    read = bytearray(ref)
    for _ in range(subs):
        p = int(RNG.integers(0, len(read)))
        read[p] = int(RNG.choice(BASES))
    for _ in range(indels):
        p = int(RNG.integers(100, len(read) - 100))
        if RNG.random() < 0.5:
            del read[p:p + int(RNG.integers(1, 6))]
        else:
            read[p:p] = RNG.choice(BASES, int(RNG.integers(1, 6))).tobytes()
    return ref, bytes(read)


def test_anchored_batch_matches_host_golden():
    pairs = [make_long_pair() for _ in range(4)]
    inner = BatchAligner(SCORING, batch_size=64)
    aligner = AnchoredBatchAligner(inner, SCORING, seed_size=12)
    out = aligner.align_pairs([p[0] for p in pairs], [p[1] for p in pairs])
    for (ref, read), (a1, a2, cigar, score) in zip(pairs, out):
        index = SeedIndex(ref, 12)
        segs = find_greedy_non_overlapping_segments(read, ref, index)
        golden = align_string_with_anchors(
            "read", "ref", read, ref, segs, None, SCORING)
        assert a1 == golden.reference_aligned
        assert a2 == golden.read_aligned
        assert cigar == golden.cigar
        assert score == golden.score
    # the sub-DPs must be a small fraction of the full-fill work
    full_cells = sum((len(r) + 1) * (len(d) + 1) for r, d in pairs)
    assert inner.cells_filled < full_cells / 5, (
        inner.cells_filled, full_cells)


def test_align_reads_routes_long_reads_through_anchors(tmp_path):
    n = 2600
    ref = RNG.choice(BASES, n).tobytes().decode()
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  longamp:
    sequence: "{ref}"
""")
    reads = []
    for i in range(3):
        r = bytearray(ref.encode())
        for _ in range(15):
            p = int(RNG.integers(0, len(r)))
            r[p] = int(RNG.choice(BASES))
        reads.append(bytes(r).decode())
    fq = tmp_path / "r.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        for i, r in enumerate(reads):
            fh.write(f"@long{i}\n{r}\n+\n{'I' * len(r)}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "o.bam"
    stats = align_reads(layout, rm, str(out), read1=str(fq), batch_size=8,
                        anchored_min_length=1024)
    assert stats.aligned == 3
    with BamReader(str(out)) as reader:
        records = {r.name: r for r in reader}
    assert len(records) == 3
    scoring = AffineScoring.aligner_default()
    for i, read in enumerate(reads):
        index = rm.references[0].index
        segs = find_greedy_non_overlapping_segments(
            read.encode(), ref.encode(), index)
        golden = align_string_with_anchors(
            f"long{i}", "longamp", read.encode(), ref.encode(), segs,
            None, scoring)
        rec = records[f"long{i}"]
        stripped = golden.read_aligned.replace(b"-", b"")
        assert rec.seq == stripped
        assert rec.cigar_string == "".join(
            f"{c}{op}" for c, op in golden.cigar)


def test_inversion_alignment_big_inversion_fixture():
    """Transcription of linked_alignment.rs inversion_alignment_big_inversion
    (:619-689, println-only in the reference): the ~3.3kb read whose 86bp
    middle is an inverted block must route through anchored alignment with
    inversion-aware gap sub-alignment and emit InversionOpen/Close markers.
    Score and structure pinned as regression goldens for this build."""
    from clique_tpu.align.scoring import InversionScoring

    import os

    data = os.path.join(os.path.dirname(__file__), "data")
    ref = open(os.path.join(data, "big_inversion_ref.txt")).read().encode()
    read = open(os.path.join(data, "big_inversion_read.txt")).read().encode()
    aff = AffineScoring(10.0, -11.0, 8.0, -15.0, -5.0, 1.0)
    inv = InversionScoring(10.0, -11.0, -15.0, -5.0, -2.0, 20)
    idx = SeedIndex(ref, 20)
    segs = find_greedy_non_overlapping_segments(read, ref, idx)
    assert len(segs.alignment_segments) == 2
    assert segs.total_length() == 3238
    res = align_string_with_anchors("read", "ref", read, ref, segs, inv, aff)
    ops = [op for _c, op in res.cigar]
    assert "<" in ops and ">" in ops      # inversion block spliced
    assert res.score == -16624.0
    assert len(res.reference_aligned) == len(res.read_aligned)
