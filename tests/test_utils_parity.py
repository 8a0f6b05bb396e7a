"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/utils/read_utils.rs (:140-280) and
/root/reference/rust_cmd/src/utils/base_utils.rs (:38-180).

Each test names the reference test it transcribes.
"""

import numpy as np
import pytest

from clique_tpu.utils.seq import (
    all_combinations,
    combine_phred_scores,
    create_fake_quality_scores,
    edit_distance,
    hamming_distance,
    is_valid_fasta_base,
    pad_right,
    phred_to_prob,
    prob_to_phred,
    random_sequence,
    reverse_complement,
    strip_gaps,
)


# --- read_utils.rs ---------------------------------------------------------

def test_phred_to_qual():
    """phred_to_qual_test (read_utils.rs:118-124)."""
    assert phred_to_prob(ord("I")) == 0.0001
    assert phred_to_prob(ord("H")) == 0.00012589254117941674
    assert phred_to_prob(ord("+")) == 0.1
    assert phred_to_prob(ord("5")) == 0.01


def test_qual_to_phred():
    """qual_to_phred_test (read_utils.rs:126-132)."""
    assert prob_to_phred(0.0001) == ord("I")
    assert prob_to_phred(0.00012589254117941674) == ord("H")
    assert prob_to_phred(0.1) == ord("+")
    assert prob_to_phred(0.01) == ord("5")


def test_combine_qual():
    """combine_qual_test (read_utils.rs:134-138) — includes the reference's
    disagreement-formula quirk."""
    assert combine_phred_scores(ord("H"), ord("+"), False) == ord("!")
    assert combine_phred_scores(ord("H"), ord("+"), True) == ord("R")


def test_reverse_complement_standard():
    """test_reverse_complement_standard (read_utils.rs:142-148)."""
    assert reverse_complement(b"ACGT") == b"ACGT"
    assert reverse_complement(b"AAAA") == b"TTTT"
    assert reverse_complement(b"TTTT") == b"AAAA"
    assert reverse_complement(b"CCCC") == b"GGGG"
    assert reverse_complement(b"GGGG") == b"CCCC"


def test_reverse_complement_palindrome():
    """test_reverse_complement_palindrome (read_utils.rs:151-154)."""
    assert reverse_complement(b"AATT") == b"AATT"
    assert reverse_complement(b"GCGC") == b"GCGC"


def test_reverse_complement_single_base():
    """test_reverse_complement_single_base (read_utils.rs:157-164)."""
    assert reverse_complement(b"A") == b"T"
    assert reverse_complement(b"T") == b"A"
    assert reverse_complement(b"G") == b"C"
    assert reverse_complement(b"C") == b"G"
    assert reverse_complement(b"N") == b"N"


def test_reverse_complement_empty():
    """test_reverse_complement_empty (read_utils.rs:166-169)."""
    assert reverse_complement(b"") == b""


def test_reverse_complement_degenerate_bases():
    """test_reverse_complement_degenerate_bases (read_utils.rs:171-184)."""
    assert reverse_complement(b"R") == b"Y"
    assert reverse_complement(b"Y") == b"R"
    assert reverse_complement(b"S") == b"S"
    assert reverse_complement(b"W") == b"W"
    assert reverse_complement(b"K") == b"M"
    assert reverse_complement(b"M") == b"K"
    assert reverse_complement(b"B") == b"V"
    assert reverse_complement(b"V") == b"B"
    assert reverse_complement(b"D") == b"H"
    assert reverse_complement(b"H") == b"D"


def test_reverse_complement_lowercase():
    """test_reverse_complement_lowercase (read_utils.rs:186-189)."""
    assert reverse_complement(b"acgt") == b"ACGT"


def test_reverse_complement_double_application_is_identity():
    """test_reverse_complement_double_application_is_identity
    (read_utils.rs:191-199)."""
    seq = b"ACGTRYSWKMBDHVN"
    assert reverse_complement(reverse_complement(seq)) == seq.upper()


def test_strip_gaps():
    """test_strip_gaps (read_utils.rs:201-207)."""
    assert strip_gaps(b"A-C-G") == b"ACG"
    assert strip_gaps(b"ACG") == b"ACG"
    assert strip_gaps(b"---") == b""
    assert strip_gaps(b"") == b""


def test_pad_right():
    """test_pad_right (read_utils.rs:209-214)."""
    assert pad_right(b"AC", 5, ord("-")) == b"AC---"
    assert pad_right(b"AC", 2, ord("-")) == b"AC"
    assert pad_right(b"", 3, ord("N")) == b"NNN"


def test_pad_right_shorter_target():
    """test_pad_right_shorter_target (read_utils.rs:216-220): Vec::resize
    truncates when the target is shorter."""
    assert pad_right(b"ACG", 1, ord("-")) == b"A"


def test_u8s():
    """test_u8s (read_utils.rs:221-226): byte-vector to string; the
    analogue of the reference's u8s helper is bytes.decode, which every
    output path here uses."""
    assert bytes([ord("A"), ord("C"), ord("G"), ord("T")]).decode() == "ACGT"
    assert b"".decode() == ""


def test_create_fake_quality_scores():
    """test_create_fake_quality_scores{,_zero} (read_utils.rs:228-239)."""
    quals = create_fake_quality_scores(5)
    assert len(quals) == 5
    assert all(q == ord("H") for q in quals)
    assert create_fake_quality_scores(0) == b""


def test_all_combinations_length_2():
    """test_all_combinations_length_2 (read_utils.rs:241-250)."""
    combos = all_combinations(2)
    assert len(combos) == 16
    assert "AA" in combos
    assert "TT" in combos
    assert "AC" in combos


def test_all_combinations_length_3():
    """test_all_combinations_length_3 (read_utils.rs:252-256)."""
    assert len(all_combinations(3)) == 64


def test_phred_roundtrip():
    """test_phred_roundtrip (read_utils.rs:259-266)."""
    for phred in b"!+5I":
        assert prob_to_phred(phred_to_prob(phred)) == phred


def test_phred_to_prob_boundaries():
    """test_phred_to_prob_boundaries (read_utils.rs:269-272)."""
    assert phred_to_prob(ord("!")) == 1.0


def test_random_sequence_with_replacement():
    """Covers our documented deviation from random_sequence
    (read_utils.rs:78-83): the reference samples without replacement (a
    noted bug capping sequences at 4 bases); ours draws length bases."""
    rng = np.random.default_rng(5)
    seq = random_sequence(10, rng)
    assert len(seq) == 10
    assert set(seq) <= set("ACGT")


# --- base_utils.rs ---------------------------------------------------------

def test_edit_distance_identical():
    """test_edit_distance_identical (base_utils.rs:41-46)."""
    assert edit_distance(b"ACGT", b"ACGT") == 0


def test_edit_distance_all_different():
    """test_edit_distance_all_different (base_utils.rs:48-53)."""
    assert edit_distance(b"AAAA", b"TTTT") == 4


def test_edit_distance_single_mismatch():
    """test_edit_distance_single_mismatch (base_utils.rs:55-60)."""
    assert edit_distance(b"ACGT", b"ACGA") == 1


def test_edit_distance_degenerate_bases():
    """test_edit_distance_degenerate_bases (base_utils.rs:62-78)."""
    assert edit_distance(b"A", b"R") == 0  # R = A or G
    assert edit_distance(b"N", b"T") == 0  # N matches everything
    assert edit_distance(b"G", b"Y") == 1  # Y = C or T


def test_edit_distance_case_insensitive():
    """test_edit_distance_case_insensitive (base_utils.rs:80-90)."""
    assert edit_distance(b"a", b"A") == 0
    assert edit_distance(b"a", b"a") == 0


def test_edit_distance_different_lengths():
    """test_edit_distance_different_lengths (base_utils.rs:92-97,
    #[should_panic])."""
    with pytest.raises(AssertionError):
        edit_distance(b"AC", b"A")


def test_edit_distance_empty():
    """test_edit_distance_empty (base_utils.rs:99-103)."""
    assert edit_distance(b"", b"") == 0


def test_is_valid_fasta_base_standard():
    """test_is_valid_fasta_base_standard (base_utils.rs:106-113)."""
    for b in b"ACGTUN":
        assert is_valid_fasta_base(b)


def test_is_valid_fasta_base_lowercase():
    """test_is_valid_fasta_base_lowercase (base_utils.rs:116-122)."""
    for b in b"acgtn":
        assert is_valid_fasta_base(b)


def test_is_valid_fasta_base_degenerate():
    """test_is_valid_fasta_base_degenerate (base_utils.rs:125-136)."""
    for b in b"RYSWKMBDHV":
        assert is_valid_fasta_base(b)


def test_is_valid_fasta_base_invalid():
    """test_is_valid_fasta_base_invalid (base_utils.rs:139-145)."""
    for b in b"-X0 *":
        assert not is_valid_fasta_base(b)


def test_simple_edit_distance_identical():
    """test_simple_edit_distance_identical (base_utils.rs:148-153):
    simple_edit_distance == exact-byte Hamming (our hamming_distance)."""
    assert hamming_distance(b"ACGT", b"ACGT") == 0


def test_simple_edit_distance_all_different():
    """test_simple_edit_distance_all_different (base_utils.rs:155-160)."""
    assert hamming_distance(b"AAAA", b"TTTT") == 4


def test_simple_edit_distance_case_sensitive():
    """test_simple_edit_distance_case_sensitive (base_utils.rs:162-168)."""
    assert hamming_distance(b"a", b"A") == 1


def test_simple_edit_distance_different_lengths():
    """test_simple_edit_distance_different_lengths (base_utils.rs:171-176,
    #[should_panic])."""
    with pytest.raises(AssertionError):
        hamming_distance(b"AC", b"A")
