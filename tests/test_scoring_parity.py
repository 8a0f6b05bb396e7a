"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/alignment/scoring_functions.rs.
"""

from clique_tpu.align.scoring import (
    AffineScoring,
    ConvexScoring,
    InversionScoring,
    SimpleScoring,
)


def test_simple_scoring_match():
    """test_simple_scoring_match (scoring_functions.rs)."""
    scoring = SimpleScoring(5.0, -4.0, -2.0)
    assert scoring.match_mismatch(ord("A"), ord("A")) == 5.0
    assert scoring.match_mismatch(ord("A"), ord("T")) == -4.0


def test_simple_scoring_gap():
    """test_simple_scoring_gap (scoring_functions.rs)."""
    scoring = SimpleScoring(5.0, -4.0, -2.0)
    assert scoring.gap(1) == -2.0
    assert scoring.gap(3) == -6.0
    assert scoring.gap(0) == 0.0


def test_convex_scoring_match():
    """test_convex_scoring_match (scoring_functions.rs)."""
    scoring = ConvexScoring(5.0, -4.0, -2.0, -10.0, -1.0)
    assert scoring.match_mismatch(ord("A"), ord("A")) == 5.0
    assert scoring.match_mismatch(ord("A"), ord("T")) == -4.0


def test_convex_scoring_gap():
    """test_convex_scoring_gap (scoring_functions.rs): gap(len) =
    gap_open + log10(len)."""
    scoring = ConvexScoring(5.0, -4.0, -2.0, -10.0, -1.0)
    assert scoring.gap(1) == -10.0
    assert scoring.gap(10) == -9.0


def test_affine_scoring_default_dna():
    """test_affine_scoring_default_dna (scoring_functions.rs)."""
    scoring = AffineScoring.default_dna()
    assert scoring.match_score == 5.0
    assert scoring.mismatch_score == -4.0
    assert scoring.gap_open == -10.0
    assert scoring.gap_extend == -0.5
    assert scoring.final_gap_multiplier == 0.5


def test_affine_scoring_distance_dna():
    """test_affine_scoring_distance_dna (scoring_functions.rs)."""
    scoring = AffineScoring.distance_dna()
    assert scoring.match_score == 0.0
    assert scoring.mismatch_score == -1.0


def test_affine_scoring_match_mismatch_regular():
    """test_affine_scoring_match_mismatch_regular (scoring_functions.rs)."""
    scoring = AffineScoring.default_dna()
    assert scoring.match_mismatch(ord("A"), ord("A")) == 5.0
    assert scoring.match_mismatch(ord("A"), ord("T")) == -4.0
    assert scoring.match_mismatch(ord("G"), ord("G")) == 5.0
    assert scoring.match_mismatch(ord("C"), ord("T")) == -4.0


def test_affine_scoring_match_mismatch_n_bases():
    """test_affine_scoring_match_mismatch_n_bases (scoring_functions.rs)."""
    scoring = AffineScoring.default_dna()
    assert scoring.match_mismatch(ord("N"), ord("A")) == 4.0
    assert scoring.match_mismatch(ord("A"), ord("N")) == 4.0
    assert scoring.match_mismatch(ord("N"), ord("N")) == 4.0


def test_affine_scoring_special_characters():
    """test_affine_scoring_special_characters (scoring_functions.rs):
    any byte < 58 (digits, '#', '*', ...) scores as special."""
    scoring = AffineScoring.default_dna()
    assert scoring.match_mismatch(ord("0"), ord("A")) == 4.0
    assert scoring.match_mismatch(ord("A"), ord("#")) == 4.0
    assert scoring.match_mismatch(ord("1"), ord("2")) == 4.0


def test_affine_scoring_gap_accessors():
    """test_affine_scoring_gap_accessors (scoring_functions.rs)."""
    scoring = AffineScoring.default_dna()
    assert scoring.gap_open == -10.0
    assert scoring.gap_extend == -0.5
    assert scoring.final_gap_multiplier == 0.5


def test_inversion_scoring_default():
    """test_inversion_scoring_default + test_inversion_scoring_gap_accessors
    (scoring_functions.rs:265-292)."""
    scoring = InversionScoring()
    assert scoring.match_score == 9.0
    assert scoring.mismatch_score == -21.0
    assert scoring.gap_open == -25.0
    assert scoring.gap_extend == -1.0
    assert scoring.inversion_penalty == -40.0
    assert scoring.min_inversion_length == 20


def test_inversion_scoring_match_mismatch():
    """test_inversion_scoring_match_mismatch (scoring_functions.rs)."""
    scoring = InversionScoring()
    assert scoring.match_mismatch(ord("A"), ord("A")) == 9.0
    assert scoring.match_mismatch(ord("A"), ord("T")) == -21.0


def test_match_matrix_agrees_with_scalar():
    """The dense device substitution matrix must agree with the scalar
    rule byte-for-byte (our device-path invariant)."""
    scoring = AffineScoring.default_dna()
    mat = scoring.match_matrix()
    for a in b"ACGTN0#*az":
        for b in b"ACGTN0#*az":
            assert mat[a, b] == scoring.match_mismatch(a, b)
