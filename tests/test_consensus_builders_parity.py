"""Transcriptions of the live (non-spoa-gated) inline tests of
/root/reference/rust_cmd/src/consensus/consensus_builders.rs.

Each test names the reference test function and line it transcribes; the
POA cluster (`#[cfg(feature = "spoa")]`, :531-770 etc.) is compiled out in
the reference and has no analogue here.
"""

import math

from clique_tpu.align.cpu import pair_to_cigar
from clique_tpu.align.pipeline import get_reference_alignment_rate
from clique_tpu.consensus.quality import (
    calculate_qual_scores,
    combine_qual_scores,
    phred_to_error_prob,
    prob_to_phred,
)

Q40 = ord("I") - 33  # b'I' - PHRED_OFFSET


def test_phred_to_prob():
    """test_phred_to_prob (consensus_builders.rs:951-956)."""
    assert phred_to_error_prob(ord("I") - 33) == 0.0001
    assert phred_to_error_prob(ord("!") - 33) == 1.0
    assert phred_to_error_prob(ord("+") - 33) == 0.1


def test_combine_qual_scores_reference_values():
    """test_combine_qual_scores (consensus_builders.rs:961-975)."""
    # four agreeing Q40 'A's, prior 0.1: posterior ~ 1.0
    probs = combine_qual_scores([bytes([ord("A")] * 4)], [bytes([Q40] * 4)],
                                ord("A"), 0.1)
    assert probs[0] == 1.0

    # one of each base at Q40 cancels out; the 0.99 reference prior is
    # (approximately) recovered
    probs = combine_qual_scores([b"ACGT"], [bytes([Q40] * 4)],
                                ord("A"), 0.99)
    assert abs(0.9924811371413187 - probs[0]) < 0.0001


def test_phred_to_error_prob_cluster():
    """test_phred_to_error_prob_{high_quality,low_quality,zero}
    (consensus_builders.rs:978-996)."""
    assert abs(phred_to_error_prob(40) - 0.0001) < 0.00001
    assert abs(phred_to_error_prob(10) - 0.1) < 0.001
    assert abs(phred_to_error_prob(0) - 1.0) < 0.001


def test_prob_to_phred_cluster():
    """test_prob_to_phred_{high_confidence,low_confidence,nan,very_small,
    capped_at_40} (consensus_builders.rs:999-1029)."""
    assert prob_to_phred(0.9999) == 40
    assert prob_to_phred(0.5) == 3
    assert prob_to_phred(float("nan")) == 0
    assert prob_to_phred(0.000000001) == 0
    assert prob_to_phred(0.001) <= 40


def test_calculate_qual_scores_uniform():
    """test_calculate_qual_scores_uniform (consensus_builders.rs:1032-1041)."""
    result = calculate_qual_scores([0.0] * 5)
    for r in result:
        assert abs(r - 0.2) < 0.001


def test_calculate_qual_scores_sum_to_one():
    """test_calculate_qual_scores_sum_to_one (consensus_builders.rs:1044-1049)."""
    result = calculate_qual_scores([-1.0, -2.0, -3.0, -4.0, -5.0])
    assert abs(sum(result) - 1.0) < 0.001


def test_calculate_qual_scores_dominant():
    """test_calculate_qual_scores_dominant (consensus_builders.rs:1052-1057)."""
    result = calculate_qual_scores([0.0, -100.0, -100.0, -100.0, -100.0])
    assert result[0] > 0.99


def test_get_reference_alignment_rate():
    """test_get_reference_alignment_rate (consensus_builders.rs:772-797)."""
    reference = b"ACGTACGT"
    assert get_reference_alignment_rate(reference, b"ACGTACGT") == 1.0
    # 5 matches out of 8: positions 0,1,2,3,7
    assert get_reference_alignment_rate(reference, b"ACGTTTTT") == 0.625
    # 2 matches out of 8 (positions 0, 4)
    assert get_reference_alignment_rate(reference, b"AAAAAAAA") == 0.25
    # gap columns (ASCII < 64) are skipped entirely
    assert get_reference_alignment_rate(b"ACG-TACGT", b"ACG-TACGT") == 1.0
    # 4 matches out of 8
    assert get_reference_alignment_rate(reference, b"ACGTTTCG") == 0.5


def test_get_reference_alignment_rate_edges():
    """test_get_reference_alignment_rate_{all_match,no_match,with_gaps}
    (consensus_builders.rs:1060-1079)."""
    assert get_reference_alignment_rate(b"ACGTACGT", b"ACGTACGT") == 1.0
    assert get_reference_alignment_rate(b"AAAA", b"TTTT") == 0.0
    assert get_reference_alignment_rate(b"A-A", b"A-A") == 1.0


def test_cigar_string():
    """test_cigar_string (consensus_builders.rs:870-883)."""
    reference = b"CGTACGCTAGACATTGTGCCGCATCGATTGTAGTGACAATAGGAAA-------TATACAAG"
    read = b"CGT-----AGACATTGTGCCGCATCGATTGTAGTGACAATAGGAAATGACGGCTATACAAG"
    assert pair_to_cigar(reference, read) == [
        (3, "M"), (5, "D"), (38, "M"), (7, "I"), (8, "M")]


def test_combine_qual_scores_all_same_base():
    """test_combine_qual_scores_all_same_base (consensus_builders.rs:1082-1095)."""
    result = combine_qual_scores([bytes([ord("A")] * 3)], [bytes([30] * 3)],
                                 ord("A"), 0.75)
    assert result[0] > result[1]
    assert result[0] > result[2]
    assert result[0] > result[3]


def test_combine_qual_scores_all_different_bases():
    """test_combine_qual_scores_all_different_bases
    (consensus_builders.rs:1098-1106)."""
    result = combine_qual_scores([b"ACGT"], [bytes([30] * 4)],
                                 ord("N"), 0.25)
    total = sum(result[0:4])
    assert abs(total - 1.0) < 0.01 or result[4] < 0.01
