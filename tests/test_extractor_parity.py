"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/extractor.rs not already covered by
tests/test_extractor.py (which has the real-example / zone-case /
fast-path property tests).
"""

import pytest

from clique_tpu.extract.extractor import (
    READ_CHAR,
    REFERENCE_CHAR,
    custom_umi_score,
    extract_tagged_sequences,
    gap_proportion_per_tag,
    recover_aligned_sequences,
    stretch_sequence_to_alignment,
)
from clique_tpu.utils.seq import strip_gaps


# --- stretch_sequence_to_alignment -----------------------------------------

def test_stretch_sequence_to_alignment_basic():
    """test_stretch_sequence_to_alignment_basic (extractor.rs:554-560)."""
    assert stretch_sequence_to_alignment(b"AC-GT-A", b"ACGTA") == b"AC-GT-A"


def test_stretch_sequence_to_alignment_no_gaps():
    """test_stretch_sequence_to_alignment_no_gaps (extractor.rs:562-568)."""
    assert stretch_sequence_to_alignment(b"ACGT", b"ACGT") == b"ACGT"


def test_stretch_sequence_to_alignment_all_gaps():
    """test_stretch_sequence_to_alignment_all_gaps (extractor.rs:570-577):
    with an empty native sequence the loop exits immediately."""
    assert stretch_sequence_to_alignment(b"----", b"") == b""


def test_stretch_sequence_to_alignment_leading_gap():
    """test_stretch_sequence_to_alignment_leading_gap (extractor.rs:579-585)."""
    assert stretch_sequence_to_alignment(b"-ACGT", b"ACGT") == b"-ACGT"


def test_stretch_sequence_to_alignment_trailing_gap():
    """test_stretch_sequence_to_alignment_trailing_gap (extractor.rs:587-595):
    trailing gaps after the native sequence is consumed are dropped."""
    assert stretch_sequence_to_alignment(b"ACGT-", b"ACGT") == b"ACGT"


def test_stretch_sequence_to_alignment_native_longer_panics():
    """test_stretch_sequence_to_alignment_native_longer_panics
    (extractor.rs:597-602)."""
    with pytest.raises(Exception):
        stretch_sequence_to_alignment(b"AC", b"ACGT")


# --- gap_proportion_per_tag -------------------------------------------------

def test_gap_proportion_per_tag_no_gaps():
    """test_gap_proportion_per_tag_no_gaps (extractor.rs:604-611)."""
    props = gap_proportion_per_tag({ord("0"): "ACGT"})
    assert props == [0.0]


def test_gap_proportion_per_tag_all_gaps():
    """test_gap_proportion_per_tag_all_gaps (extractor.rs:613-619)."""
    assert gap_proportion_per_tag({ord("0"): "----"}) == [1.0]


def test_gap_proportion_per_tag_ignores_ref_and_read_chars():
    """test_gap_proportion_per_tag_ignores_ref_and_read_chars
    (extractor.rs:621-628)."""
    props = gap_proportion_per_tag({REFERENCE_CHAR: "----",
                                    READ_CHAR: "----"})
    assert props == []


def test_gap_proportion_per_tag_multiple_tags():
    """test_gap_proportion_per_tag_multiple_tags (extractor.rs:630-641)."""
    props = gap_proportion_per_tag({ord("0"): "ACGT",
                                    ord("1"): "AC--",
                                    ord("2"): "----"})
    assert props == [0.0, 0.5, 1.0]


# --- extract_tagged_sequences ----------------------------------------------

def test_extract_tagged_sequences_basic():
    """test_extract_tagged_sequences_basic (extractor.rs:643-649)."""
    result = extract_tagged_sequences(b"AATGTTTTACGT", b"AATG0000ACGT")
    assert result[ord("0")] == "TTTT"


def test_extract_tagged_sequences_multiple_tags():
    """test_extract_tagged_sequences_multiple_tags (extractor.rs:651-658)."""
    result = extract_tagged_sequences(b"ACGTTTTT", b"00001111")
    assert result[ord("0")] == "ACGT"
    assert result[ord("1")] == "TTTT"


def test_extract_tagged_sequences_uppercase_tracking():
    """test_extract_tagged_sequences_uppercase_tracking
    (extractor.rs:660-668): case zones produce separate A/a keys."""
    result = extract_tagged_sequences(b"TTTTTT", b"aaAAaa")
    assert ord("A") in result
    assert ord("a") in result


def test_tagged_sequence_space():
    """tagged_sequence_test_space (extractor.rs:491-508)."""
    reference = (b"AAATACTTGTACTTCGTTCAGTTACGTATTGCTAAGCAGTGGTAT111111111"
                 b"GAGTACC------TTA--CAGTTCGATCTA")
    read = (b"-------------------------------CT-AGCAG----ATCACCGTAAGGACT"
            b"ACCAGACGTTTAGCC-----------")
    keyvalues = extract_tagged_sequences(read, reference)
    assert keyvalues[ord("1")] == "CACCGTAAG"


# --- custom_umi_score -------------------------------------------------------

def test_custom_umi_score_matching_bases():
    """test_custom_umi_score_matching_bases (extractor.rs:670-675)."""
    assert custom_umi_score(ord("A"), ord("A")) == 10
    assert custom_umi_score(ord("a"), ord("A")) == 10
    assert custom_umi_score(ord("A"), ord("a")) == 10


def test_custom_umi_score_mismatching_bases():
    """test_custom_umi_score_mismatching_bases (extractor.rs:677-681)."""
    assert custom_umi_score(ord("A"), ord("T")) == -8
    assert custom_umi_score(ord("C"), ord("G")) == -8


def test_custom_umi_score_special_characters():
    """test_custom_umi_score_special_characters (extractor.rs:683-688)."""
    assert custom_umi_score(ord("0"), ord("A")) == 7
    assert custom_umi_score(ord("A"), ord("#")) == 7
    assert custom_umi_score(ord("*"), ord("*")) == 7


# --- recover_soft_clipped_align_sequences -----------------------------------

def test_recover_soft_clipped_match_only():
    """test_recover_soft_clipped_match_only (extractor.rs:690-702)."""
    aligned_read, aligned_ref = recover_aligned_sequences(
        b"ACGTACGT", 1, [(8, "M")], b"ACGTACGT",
        soft_clip="MatchMismatch")
    assert aligned_read == b"ACGTACGT"
    assert aligned_ref == b"ACGTACGT"


def test_recover_soft_clipped_with_insertion():
    """test_recover_soft_clipped_with_insertion (extractor.rs:704-720)."""
    read, reference = b"ACGTTACGT", b"ACGTACGT"
    aligned_read, aligned_ref = recover_aligned_sequences(
        read, 1, [(4, "M"), (1, "I"), (4, "M")], reference,
        soft_clip="MatchMismatch")
    assert strip_gaps(aligned_read) == read
    assert strip_gaps(aligned_ref) == reference


def test_recover_soft_clipped_with_deletion():
    """test_recover_soft_clipped_with_deletion (extractor.rs:722-738)."""
    read, reference = b"ACGACGT", b"ACGTACGT"
    aligned_read, aligned_ref = recover_aligned_sequences(
        read, 1, [(3, "M"), (1, "D"), (4, "M")], reference,
        soft_clip="MatchMismatch")
    assert strip_gaps(aligned_read) == read
    assert strip_gaps(aligned_ref) == reference


def test_recover_align_sequences_realign():
    """test_recover_align_sequences (extractor.rs:740-783), scenario 1:
    leading 9bp soft clip realigned against the reference prefix."""
    read = (b"TTCCGATCTGTCATAACACCACACTAGAATCACGCGG"
            b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTT")
    reference = (b"CTACACGACGCTCTTCCGATCTNNNNNNNNNNNNNNNNNNNNNNNNNNNN"
                 b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTATTAGGAAAGGACAGTGGGAGTGGCACC")
    aligned_read, aligned_ref = recover_aligned_sequences(
        read, 23, [(9, "S"), (58, "M")], reference, soft_clip="Realign")
    assert aligned_read == (
        b"-------------TTCCGATCTGTCATAACACCACACTAGAATCACGCGG"
        b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTT-----------------------------")
    assert strip_gaps(aligned_read) == read
    assert aligned_ref == reference


def test_recover_align_sequences_realign_trailing_clip():
    """test_recover_align_sequences (extractor.rs:755-783), scenario 2:
    interior insertion + trailing soft clip realigned at the reference
    tail."""
    read = (b"TTCCGATCTGTCATAACACCACACTAGAATCACGCG"
            b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTT"
            b"ATTAGGAAAGGACAGTGGGAGTGGCA")
    reference = (b"CTACACGACGCTCTTCCGATCTNNNNNNNNNNNNNNNNNNNNNNNNNNNN"
                 b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTATTAGGAAAGGACAGTGGGAGTGGCACC")
    aligned_read, aligned_ref = recover_aligned_sequences(
        read, 14, [(38, "M"), (4, "I"), (54, "M"), (2, "S")], reference,
        soft_clip="Realign")
    assert strip_gaps(aligned_read) == read
    assert strip_gaps(aligned_ref) == reference
    assert aligned_read == (
        b"-------------TTCCGATCTGTCATAACACCACACTAGAATCACGCG"
        b"TTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTT"
        b"ATTAGGAAAGGACAGTGGGAGTGGCA--")
