"""Integration tests on the reference repo's own test fixtures
(/root/reference/rust_cmd/test_data): the 180-guide panel, the
two-reference wildcard amplicons, and the 10X barcode allowlists."""

import os

import numpy as np
import pytest

from clique_tpu.collapse.correct import correct_known_hamming
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.reference.manager import ReferenceManager

DATA = "/root/reference/rust_cmd/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test_data not mounted")

RNG = np.random.default_rng(17)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def test_guide_library_unique_kmers():
    # fasta_reference.rs:267-301 exercises unique-kmer construction on the
    # 180-guide library
    rm = ReferenceManager.from_fasta(
        f"{DATA}/18guide1_pcr_sequence.fasta", kmer_size=8, kmer_spacing=4)
    assert len(rm.references) == 180
    assert rm.longest_ref > 250
    # guides share a backbone: unique kmers may be sparse but routing by
    # vote must still pick the right guide for exact center fragments
    correct = 0
    checked = 0
    for rid in list(rm.references)[:40]:
        ref = rm.references[rid]
        # the guide-specific region sits around 168-200; spaced-kmer votes
        # are phase-sensitive (step 4), so sample a phase-aligned fragment -
        # the same constraint the reference's quick_alignment_search has
        frag = ref.sequence[168:240]
        votes = rm.vote_references(frag)
        if not votes:
            continue
        checked += 1
        if votes.most_common(1)[0][0] == rid:
            correct += 1
    assert checked >= 20, f"only {checked} fragments produced votes"
    assert correct >= 0.9 * checked, f"{correct}/{checked}"


def test_two_references_layout():
    rm = ReferenceManager.from_fasta(f"{DATA}/two_references.fa", 8, 4)
    assert len(rm.references) == 2
    names = {r.name for r in rm.references.values()}
    assert "cas_tag" in names


def test_known_list_10x_barcodes():
    # known_list.rs:285-338 corrects against real 10X barcode subsets
    with open(f"{DATA}/subset_barcode_list_500.txt", "rb") as fh:
        allow = [l.strip() for l in fh if l.strip()]
    assert len(allow) == 500
    length = len(allow[0])
    # exact barcodes correct to themselves
    counts = {allow[0]: 3, allow[10]: 2}
    out = correct_known_hamming(counts, allow, max_distance=1, length=length)
    assert out[allow[0]] == allow[0]
    assert out[allow[10]] == allow[10]
    # one substitution corrects back (if unambiguous in this subset)
    mutated = b"T" + allow[0][1:] if allow[0][0:1] != b"T" else b"A" + allow[0][1:]
    out2 = correct_known_hamming({mutated: 1}, allow, 1, length)
    if mutated in out2:  # unique within radius
        assert out2[mutated] == allow[0]


def test_known_list_10x_top100_unique_hits():
    """Full transcription of known_list.rs test_real_known_set (:285-338):
    every one of the first 100 allowlist barcodes corrects uniquely to
    itself at Hamming distance 1, and the two fixture queries (one exact,
    one with two substitutions at distance >1 from everything else) each
    produce exactly one hit."""
    from clique_tpu.collapse.distance import hamming_hits

    with open(f"{DATA}/subset_barcode_list_500.txt", "rb") as fh:
        allow = [l.strip() for l in fh if l.strip()]
    top = allow[:100]
    hits = hamming_hits(top, allow, max_distance=1)
    for barcode, hit in zip(top, hits):
        assert len(hit) == 1, (barcode, len(hit))
        assert allow[hit[0]] == barcode

    for query in (b"AAACCCAAGCAGATAA", b"TAACCCAAGCAGATAT"):
        (qhits,) = hamming_hits([query], allow, max_distance=1)
        assert len(qhits) == 1, (query, len(qhits))
