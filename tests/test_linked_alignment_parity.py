"""Transcriptions of the remaining inline tests of
/root/reference/rust_cmd/src/linked_alignment.rs (tests/test_anchored.py
covers extend_hit, greedy segments, score-from-strings, cigar validation,
and anchored scenario 1; test_anchored_batch.py has the big-inversion
fixture and the batched device path).

`test_alignment_results_struct` is Rust struct plumbing; not transcribed.
"""

import pytest

from clique_tpu.align.anchored import (
    align_string_with_anchors,
    cigar_alignment_to_full_string,
    slice_for_alignment,
)
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.reference.manager import (
    SeedIndex,
    extend_hit,
    find_greedy_non_overlapping_segments,
    orient_by_longest_segment,
)

AFF = AffineScoring(10.0, -11.0, 8.0, -15.0, -5.0, 1.0)

ANCHOR_REF = (
    b"CATGGTNNNNNNNNNNNNNNNNNNCGCCGCCGGGATCACTCTCGGCATGGACGAGCTGTACAAG"
    b"TAACGAAGAGTAACCGTTGCTAGGAGAGACCATATGTCTAGAGAAAGGTACCCTATCCTTTCGA"
    b"ATGGTCCACGCGTAGAAGAAAGTTAGCTCTTGTGCGA")


def _anchored(read: bytes, ref: bytes = ANCHOR_REF, seed: int = 20):
    index = SeedIndex(ref, seed)
    segs = find_greedy_non_overlapping_segments(read, ref, index)
    return align_string_with_anchors("read", "ref", read, ref, segs, None,
                                     AFF)


# --- slice_for_alignment ----------------------------------------------------

def test_slice_for_alignment_basic():
    """test_slice_for_alignment_basic (linked_alignment.rs:414-419)."""
    assert slice_for_alignment(b"ACGTACGT", 0, 4) == b"ACGT"
    assert slice_for_alignment(b"ACGTACGT", 4, 8) == b"ACGT"


def test_slice_for_alignment_empty():
    """test_slice_for_alignment_empty (linked_alignment.rs:421-425)."""
    assert slice_for_alignment(b"ACGT", 2, 2) == b""


def test_slice_for_alignment_full():
    """test_slice_for_alignment_full (linked_alignment.rs:427-431)."""
    assert slice_for_alignment(b"ACGT", 0, 4) == b"ACGT"


def test_slice_for_alignment_out_of_bounds():
    """test_slice_for_alignment_out_of_bounds (linked_alignment.rs:434-438)."""
    with pytest.raises(IndexError):
        slice_for_alignment(b"ACGT", 0, 10)


# --- cigar_alignment_to_full_string -----------------------------------------

def test_cigar_alignment_to_full_string_match_only():
    """test_cigar_alignment_to_full_string_match_only
    (linked_alignment.rs:483-494)."""
    read_str, ref_str = cigar_alignment_to_full_string(
        b"ACGT", b"ACGT", 0, [(4, "M")])
    assert read_str == "ACGT"
    assert ref_str == "ACGT"


def test_cigar_alignment_to_full_string_with_offset():
    """test_cigar_alignment_to_full_string_with_offset
    (linked_alignment.rs:496-507)."""
    read_str, ref_str = cigar_alignment_to_full_string(
        b"GT", b"ACGT", 2, [(2, "M")])
    assert read_str == "--GT"
    assert ref_str == "ACGT"


# --- extend_hit simple cases ------------------------------------------------

def test_simple_extend():
    """simple_extend_test + simple_extend_stop_before_end_test
    (linked_alignment.rs:543-560)."""
    assert extend_hit(b"AATGATACGG", 0, b"AATGATACGG", 0) == 10
    assert extend_hit(b"AATGATACGG", 0, b"AATGATACGGAAA", 0) == 10


# --- orient_by_longest_segment ----------------------------------------------

def test_orient_by_longest_segment():
    """orient_by_longest_segment_test (linked_alignment.rs:520-541)."""
    ref = b"AAAAATATATATATATAT"
    read = b"AAAAAGGGGGGGGGGGGG"
    index = SeedIndex(ref, 5)
    _fwd_wins, fwd, _rev = orient_by_longest_segment(read, ref, index)
    assert len(fwd.alignment_segments) == 1
    assert fwd.alignment_segments[0].search_start == 0

    ref = b"AAAAATATATATATATATCCACC"
    read = b"AAAAAGGGGGGGGGGGGGCCACC"
    index = SeedIndex(ref, 5)
    _fwd_wins, fwd, _rev = orient_by_longest_segment(read, ref, index)
    assert len(fwd.alignment_segments) == 2
    assert fwd.alignment_segments[0].search_start == 0
    assert fwd.alignment_segments[1].search_start == 18


# --- test_anchor_alignment scenarios 2-4 ------------------------------------

def test_anchor_alignment_bigger_dup():
    """test_anchor_alignment scenario 2 (linked_alignment.rs:712-722):
    a duplicated interior segment becomes a reference deletion."""
    read = (b"CATGGTAAAAAAAAAAAAAAAAAACGCCGCCGGGATCACTCTCGGCATGGACGAGCTGTACAAG"
            b"TAACGAAGAGTAACCGTTGCTAGGAGAGACCATAGTAACCGTTGCTAGGAGAGACCATATGTCT"
            b"AGAGAAAGGTACCCTATCCTTTCGAATGGTCCACGCGTAGAAGAAAGTTAGCTCTTGTGCGA")
    res = _anchored(read)
    assert res.read_aligned == read
    assert res.reference_aligned == (
        b"CATGGTNNNNNNNNNNNNNNNNNNCGCCGCCGGGATCACTCTCGGCATGGACGAGCTGTACAAG"
        b"TAACGAAGAGTAACCGTTGCTAGGAGAGACCATA-------------------------TGTCT"
        b"AGAGAAAGGTACCCTATCCTTTCGAATGGTCCACGCGTAGAAGAAAGTTAGCTCTTGTGCGA")


def test_anchor_alignment_trailing_gap():
    """test_anchor_alignment scenario 3 (linked_alignment.rs:724-735):
    a read ending before the reference gets a trailing read gap."""
    read = (b"CATGGTAAAAAAAAAAAAAAAAAACGCCGCCGGGATCACTCTCGGCATGGACGAGCTGTACAAG"
            b"TAACGAAGAGTAACCGTTGCTAGGAGAGACCATAGTAACCGTTGCTAGGAGAGACCATATGTCT"
            b"AGAGAAAGGTACCCTATCCTTTCGAATGGTCCACGCGTAG")
    res = _anchored(read)
    assert res.read_aligned == read + b"-" * 22
    assert res.reference_aligned == (
        b"CATGGTNNNNNNNNNNNNNNNNNNCGCCGCCGGGATCACTCTCGGCATGGACGAGCTGTACAAG"
        b"TAACGAAGAGTAACCGTTGCTAGGAGAGACCATA-------------------------TGTCT"
        b"AGAGAAAGGTACCCTATCCTTTCGAATGGTCCACGCGTAGAAGAAAGTTAGCTCTTGTGCGA")
