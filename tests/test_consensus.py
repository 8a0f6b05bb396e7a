"""Consensus tests: stretcher semantics + fast-path equivalence."""

import numpy as np
import pytest

from clique_tpu.consensus.fast import consensus_fast, group_is_insertion_free
from clique_tpu.consensus.quality import (
    combine_qual_scores,
    phred_to_error_prob,
    prob_to_phred,
)
from clique_tpu.consensus.stretcher import AlignmentCandidate

RNG = np.random.default_rng(23)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def test_prob_to_phred_caps_and_edges():
    assert prob_to_phred(float("nan")) == 0
    assert prob_to_phred(0.0) == 0
    assert prob_to_phred(1e-9) == 0
    assert prob_to_phred(0.9) == 10
    assert prob_to_phred(0.999999999) == 40  # capped


def test_stretcher_majority_base():
    ref = b"ACGTACGT"
    cand = AlignmentCandidate(ref, "r")
    for name, read in [("a", b"ACGTACGT"), ("b", b"ACGTACGT"),
                       ("c", b"ACTTACGT")]:
        cand.add_alignment(ref, read, name, b"I" * 8)
    con = cand.to_consensus(0.75)
    assert con.read_aligned == b"ACGTACGT"
    assert con.cigar == [(8, "M")]


def test_stretcher_gap_threshold():
    ref = b"ACGTACGT"
    cand = AlignmentCandidate(ref, "r")
    # 3/4 of reads have a deletion at position 3 -> gap called (>= 0.75)
    for name, read in [("a", b"ACG-ACGT"), ("b", b"ACG-ACGT"),
                       ("c", b"ACG-ACGT"), ("d", b"ACGTACGT")]:
        cand.add_alignment(ref, read, name, b"I" * len(read.replace(b"-", b"")))
    con = cand.to_consensus(0.75)
    assert con.read_aligned == b"ACG-ACGT"
    assert con.cigar == [(3, "M"), (1, "D"), (4, "M")]


def test_stretcher_insertion_column():
    ref = b"ACGT"
    cand = AlignmentCandidate(ref, "r")
    # all members share an insertion after position 2
    for name in ("a", "b", "c"):
        cand.add_alignment(b"AC-GT", b"ACTGT", name, b"IIIII")
    con = cand.to_consensus(0.75)
    assert con.read_aligned == b"ACTGT"
    assert con.reference_aligned == b"AC-GT"
    assert con.cigar == [(2, "M"), (1, "I"), (2, "M")]


def test_fast_path_matches_stretcher():
    ref = RNG.choice(BASES, 60).tobytes()
    for trial in range(6):
        G = int(RNG.integers(2, 9))
        reads = []
        quals = []
        names = []
        for g in range(G):
            row = bytearray(ref)
            # substitutions
            for _ in range(int(RNG.integers(0, 5))):
                p = int(RNG.integers(0, len(ref)))
                row[p] = RNG.choice(BASES)
            # occasional deletion run
            if RNG.random() < 0.5:
                p = int(RNG.integers(0, len(ref) - 4))
                for k in range(int(RNG.integers(1, 4))):
                    row[p + k] = ord("-")
            reads.append(bytes(row))
            q = bytes([33 + int(x) for x in
                       RNG.integers(5, 40, len(ref) - bytes(row).count(b"-"))])
            quals.append(q)
            names.append(f"m{g}")

        assert group_is_insertion_free(ref, [ref] * G)
        fast = consensus_fast(ref, reads, quals, names, "r", 0.75)

        cand = AlignmentCandidate(ref, "r")
        for row, q, nm in zip(reads, quals, names):
            cand.add_alignment(ref, row, nm, q)
        slow = cand.to_consensus(0.75)

        assert fast.read_aligned == slow.read_aligned, trial
        assert fast.cigar == slow.cigar
        assert fast.reference_aligned == slow.reference_aligned
        fq = np.frombuffer(fast.read_quals, dtype=np.int16 if False else np.uint8).astype(int)
        sq = np.frombuffer(slow.read_quals, dtype=np.uint8).astype(int)
        assert len(fq) == len(sq)
        assert np.abs(fq - sq).max() <= 1  # float summation order


def test_combine_qual_scores_prior():
    # all-agreeing high-quality reads drive the posterior to the base
    probs = combine_qual_scores([b"AAAA", b"", b"", b"", b""],
                                [bytes([40] * 4), b"", b"", b"", b""],
                                ord("A"), 0.75)
    assert probs[0] > 0.99


def test_calculate_conc_qual_score():
    from clique_tpu.consensus.quality import calculate_conc_qual_score

    ref = b"ACGTACGT"
    members = [b"ACGTACGT", b"ACGTACGT", b"ACTTACGT"]
    quals = [bytes([35] * 8), bytes([35] * 8), bytes([35] * 8)]
    conc, qv = calculate_conc_qual_score([ref] + members, quals)
    # reference loop drops the final column
    assert len(conc) == 7
    assert conc[:3] == b"ACG"


def test_batched_consensus_matches_single():
    from clique_tpu.consensus.fast import consensus_fast, consensus_fast_groups

    ref = RNG.choice(BASES, 50).tobytes()
    groups = []
    for g in range(5):
        G = int(RNG.integers(2, 7))
        reads, quals, names = [], [], []
        for m in range(G):
            row = bytearray(ref)
            for _ in range(int(RNG.integers(0, 4))):
                p = int(RNG.integers(0, len(ref)))
                row[p] = RNG.choice(BASES)
            if RNG.random() < 0.4:
                p = int(RNG.integers(0, len(ref) - 3))
                row[p] = ord("-")
            reads.append(bytes(row))
            quals.append(bytes([33 + int(x) for x in RNG.integers(
                5, 40, len(ref) - bytes(row).count(b"-"))]))
            names.append(f"g{g}m{m}")
        groups.append((reads, quals, names))

    batched = consensus_fast_groups(ref, groups, "r", 0.75)
    for (reads, quals, names), con_b in zip(groups, batched):
        con_s = consensus_fast(ref, reads, quals, names, "r", 0.75)
        assert con_b.read_aligned == con_s.read_aligned
        assert con_b.cigar == con_s.cigar
        assert con_b.read_quals == con_s.read_quals
        assert con_b.read_name == con_s.read_name
