"""Transcriptions of the remaining inline tests of
/root/reference/rust_cmd/src/alignment/alignment_matrix.rs (the main
clusters live in tests/test_align_cpu.py / test_inversion.py /
test_local_device.py).

The `AlignmentDirection` add/zero/panic tests are Rust operator-overload
plumbing on the enum-with-count representation; our traceback stores
plane codes in a uint8 array, so they have no behavioral analogue.
"""

import pytest

from clique_tpu.align.anchored import _match_segment_result
from clique_tpu.align.cpu import (
    AlignmentResult,
    affine_align,
    find_max_3d,
    three_way_max,
    DIAG,
)
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.utils.seq import reverse_complement
import numpy as np


def score(m, mm, sp, go, ge, fgm=1.0):
    return AffineScoring(m, mm, sp, go, ge, fgm)


def test_affine_loose_ends():
    """affine_loose_ends (alignment_matrix.rs:1218-1250): the reference
    times 50k fills of this pair; the behavioral content is that the
    global alignment round-trips both sequences."""
    res = affine_align(b"ACGTACGTACGT", b"ACGTACGTT",
                       score(6.0, -6.0, 5.0, -10.0, -10.0))
    assert res.reference_aligned.replace(b"-", b"") == b"ACGTACGTACGT"
    assert res.read_aligned.replace(b"-", b"") == b"ACGTACGTT"


def test_affine_alignment_cigar():
    """affine_alignment_cigar_test (alignment_matrix.rs:1318-1339)."""
    res = affine_align(b"AAAA", b"AATAA", score(6.0, -6.0, 8.0, -10.0, -10.0))
    assert res.reference_aligned == b"AA-AA"
    assert res.read_aligned == b"AATAA"


def test_affine_alignment_test2():
    """affine_alignment_test2 + inversion_alignment_setup_test
    (alignment_matrix.rs:1342-1372, 1407-1430): identical fixtures, local
    mode Waterman-Eggert segment."""
    ref = b"CCAATCTACTACTGCTTGCA"
    read = reverse_complement(b"GCCACTCTCGCTGTACTGTG")
    res = affine_align(ref, read, score(10.0, -11.0, 8.0, -15.0, -5.0),
                       local=True)
    assert res.reference_aligned == b"TACTGC"
    assert res.read_aligned == b"TACAGC"


def test_three_way_max_tie_left_diag():
    """test_three_way_max_and_direction_tie_left_diag
    (alignment_matrix.rs:1574-1579): left == diag ties to diag."""
    val, d = three_way_max(5.0, 10.0, 10.0)
    assert val == 10.0
    assert d == DIAG


def test_three_way_max_all_equal():
    """test_three_way_max_all_equal (alignment_matrix.rs:1581-1586)."""
    val, d = three_way_max(7.0, 7.0, 7.0)
    assert val == 7.0
    assert d == DIAG


def test_three_way_max_negative_values():
    """test_three_way_max_negative_values (alignment_matrix.rs:1588-1593)."""
    val, d = three_way_max(-10.0, -5.0, -3.0)
    assert val == -3.0
    assert d == DIAG


def test_alignment_tag_display():
    """test_alignment_tag_display (alignment_matrix.rs:1642-1651) via the
    cigar_string rendering."""
    res = AlignmentResult(
        reference_name="r", read_name="q", reference_aligned=b"",
        read_aligned=b"", read_quals=None,
        cigar=[(5, "M"), (3, "D"), (2, "I"), (10, "S"), (7, "H"),
               (1, "<"), (1, ">")],
        path=[], score=0.0)
    assert res.cigar_string == "5M3D2I10S7H<>"


def test_single_base_insertion_exact_scoring():
    """test_single_base_insertion (alignment_matrix.rs:1692-1714) with the
    reference's exact scoring."""
    res = affine_align(b"ACGACGT", b"ACGTACGT",
                       score(10.0, -10.0, 8.0, -8.0, -2.0))
    total_ins = sum(c for c, op in res.cigar if op == "I")
    assert total_ins == 1


def test_alignment_result_from_match_segment():
    """test_alignment_result_from_match_segment
    (alignment_matrix.rs:1716-1731)."""
    result = _match_segment_result(b"ACGT", b"ACGT", "ref", "read", 0, 0,
                                   AffineScoring.default_dna())
    assert result.reference_aligned == b"ACGT"
    assert result.read_aligned == b"ACGT"
    assert result.cigar == [(4, "M")]
    assert result.score == 20.0  # 4 matches * 5.0
    assert len(result.path) == 4


def test_find_max_value_3d_array_all_negative():
    """test_find_max_value_3d_array_all_negative
    (alignment_matrix.rs:1746-1751): an all-zero matrix still yields a
    maximum (0.0 > MAX_NEG_SCORE)."""
    scores = np.zeros((3, 3, 3))
    result = find_max_3d(scores, 3, 3)
    assert result is not None
    assert result[2] == 0.0
