"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/collapse.rs (the end-to-end collapse paths
are covered by tests/test_collapse_pipeline.py).
"""

from clique_tpu.collapse.correct import tag_consensus
from clique_tpu.collapse.pipeline import (
    CollapseStats,
    SortingRead,
    alignment_check,
)


def _read(ref_aligned: bytes, read_aligned: bytes) -> SortingRead:
    return SortingRead(
        read_name="", reference_name="", reference_aligned=ref_aligned,
        read_aligned=read_aligned, read_quals=None, cigar=[],
        reference_start=0, score=0.0)


# --- BamReadFiltering -------------------------------------------------------

def test_bam_read_filtering_passing_reads():
    """test_bam_read_filtering_passing_reads (collapse.rs:1075-1087)."""
    stats = CollapseStats(total_reads=100, unmapped=10, secondary=5,
                          failed_filters=3, duplicate_reads=1,
                          invalid_tags=4)
    assert stats.passing_reads() == 77


def test_bam_read_filtering_all_passing():
    """test_bam_read_filtering_all_passing (collapse.rs:1091-1102)."""
    assert CollapseStats(total_reads=50).passing_reads() == 50


def test_bam_read_filtering_none_passing():
    """test_bam_read_filtering_none_passing (collapse.rs:1105-1116)."""
    stats = CollapseStats(total_reads=10, unmapped=4, secondary=3,
                          failed_filters=1, duplicate_reads=1,
                          invalid_tags=1)
    assert stats.passing_reads() == 0


def test_bam_read_filtering_default():
    """test_bam_read_filtering_default (collapse.rs:1119-1123)."""
    stats = CollapseStats()
    assert stats.total_reads == 0
    assert stats.passing_reads() == 0


# --- consensus --------------------------------------------------------------

def test_consensus_all_same():
    """test_consensus_all_same (collapse.rs:1126-1133)."""
    assert tag_consensus([b"ACGT", b"ACGT", b"ACGT"]) == b"ACGT"


def test_consensus_majority_wins():
    """test_consensus_majority_wins (collapse.rs:1136-1143)."""
    assert tag_consensus([b"A", b"A", b"T"]) == b"A"


def test_consensus_gap_deprioritized():
    """test_consensus_gap_deprioritized (collapse.rs:1146-1153)."""
    assert tag_consensus([b"G", b"-"]) == b"G"


def test_consensus_n_deprioritized():
    """test_consensus_n_deprioritized (collapse.rs:1156-1163)."""
    assert tag_consensus([b"N", b"A"]) == b"A"


def test_consensus_single_sequence():
    """test_consensus_single_sequence (collapse.rs:1166-1169)."""
    assert tag_consensus([b"ACGTACGT"]) == b"ACGTACGT"


def test_consensus():
    """test_consensus (collapse.rs:1206-1245)."""
    assert tag_consensus([b"ATCG", b"GCTA", b"ATCG"]) == b"ATCG"
    assert tag_consensus([b"ATCG", b"ATC-"]) == b"ATCG"
    assert tag_consensus([b"ATC-", b"ATCG"]) == b"ATCG"
    assert tag_consensus([b"TGGTATGCTGG-", b"TGGTATGCTGGG"]) == b"TGGTATGCTGGG"
    assert tag_consensus([b"TGGTATGCTGGG", b"TGGTATGCTGG-"]) == b"TGGTATGCTGGG"


# --- AlignmentCheck ---------------------------------------------------------

def test_alignment_check():
    """test_alignment_check (collapse.rs:1172-1203): 12 identical aligned
    bases pass min_aligned_bases=10 at 0.8 identity."""
    read = _read(b"A" * 12, b"A" * 12)
    assert alignment_check(read, min_aligned_bases=10, min_identical=0.8)
