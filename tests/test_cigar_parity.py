"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/alignment_manager.rs (the
simplify_cigar_string cluster). Ops map as MatchMismatch=M, Del=D, Ins=I,
SoftClip=S, InversionOpen='<', InversionClose='>'.
"""

import pytest

from clique_tpu.align.cpu import simplify_cigar


def test_simplify_cigar_empty():
    """test_simplify_cigar_empty (alignment_manager.rs)."""
    assert simplify_cigar([]) == []


def test_simplify_cigar_single_element():
    """test_simplify_cigar_single_element (alignment_manager.rs)."""
    assert simplify_cigar([(5, "M")]) == [(5, "M")]


def test_simplify_cigar_merge_consecutive_matches():
    """test_simplify_cigar_merge_consecutive_matches (alignment_manager.rs)."""
    assert simplify_cigar([(3, "M"), (5, "M"), (2, "M")]) == [(10, "M")]


def test_simplify_cigar_merge_consecutive_dels():
    """test_simplify_cigar_merge_consecutive_dels (alignment_manager.rs)."""
    assert simplify_cigar([(1, "D"), (2, "D"), (3, "D")]) == [(6, "D")]


def test_simplify_cigar_merge_consecutive_ins():
    """test_simplify_cigar_merge_consecutive_ins (alignment_manager.rs)."""
    assert simplify_cigar([(1, "I"), (1, "I")]) == [(2, "I")]


def test_simplify_cigar_mixed_ops():
    """test_simplify_cigar_mixed_ops (alignment_manager.rs)."""
    assert simplify_cigar([(3, "M"), (5, "M"), (2, "I"), (4, "D"),
                           (1, "D")]) == [(8, "M"), (2, "I"), (5, "D")]


def test_simplify_cigar_no_merging_needed():
    """test_simplify_cigar_no_merging_needed (alignment_manager.rs)."""
    cigar = [(5, "M"), (2, "I"), (3, "D"), (4, "M")]
    assert simplify_cigar(cigar) == cigar


def test_simplify_cigar_with_inversions():
    """test_simplify_cigar_with_inversions (alignment_manager.rs)."""
    cigar = [(5, "M"), (1, "<"), (3, "M"), (1, ">"), (4, "M")]
    assert simplify_cigar(cigar) == cigar


def test_simplify_cigar_double_inversion_open_panics():
    """test_simplify_cigar_double_inversion_open_panics
    (alignment_manager.rs)."""
    with pytest.raises(ValueError, match="two inversion open"):
        simplify_cigar([(1, "<"), (1, "<")])


def test_simplify_cigar_double_inversion_close_panics():
    """test_simplify_cigar_double_inversion_close_panics
    (alignment_manager.rs)."""
    with pytest.raises(ValueError, match="two inversion closed"):
        simplify_cigar([(1, ">"), (1, ">")])


def test_simplify_cigar_alternating_ops():
    """test_simplify_cigar_alternating_ops (alignment_manager.rs)."""
    cigar = [(1, "M"), (1, "D"), (1, "M"), (1, "I"), (1, "M")]
    assert simplify_cigar(cigar) == cigar


def test_simplify_cigar_softclip():
    """test_simplify_cigar_softclip (alignment_manager.rs): separated
    soft clips are not merged."""
    cigar = [(5, "S"), (10, "M"), (3, "S")]
    assert simplify_cigar(cigar) == cigar
