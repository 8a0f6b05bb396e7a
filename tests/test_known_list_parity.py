"""Transcriptions of the FastaString inline tests of
/root/reference/rust_cmd/src/umis/known_list.rs (:190-283).
tests/test_reference_fixtures.py holds the real-known-set / 10X barcode
transcriptions.

Documented deviation: known_list.rs's private FastaString::reverse_complement
preserves the case of acgt ("acgt" -> "acgt") while folding n -> N — unlike
read_utils::reverse_complement, which our utils.seq table follows (always
uppercase out). KnownList inputs are uppercase barcode files, so the quirk
is unreachable in the product paths; the case-folding tests below assert
our single-table behavior instead. The struct-plumbing tests
(distance == u32::MAX sentinel, BestF32Hits clone) have no analogue.
"""

from clique_tpu.utils.seq import hamming_distance, reverse_complement


def test_fasta_string_hamming_distance_identical():
    """test_fasta_string_hamming_distance_identical (known_list.rs:198-203)."""
    assert hamming_distance(b"ACGT", b"ACGT") == 0


def test_fasta_string_hamming_distance_one_diff():
    """test_fasta_string_hamming_distance_one_diff (known_list.rs:205-210)."""
    assert hamming_distance(b"ACGT", b"ACTT") == 1


def test_fasta_string_hamming_distance_all_diff():
    """test_fasta_string_hamming_distance_all_diff (known_list.rs:212-217)."""
    assert hamming_distance(b"AAAA", b"TTTT") == 4


def test_fasta_string_hamming_distance_symmetric():
    """test_fasta_string_hamming_distance_symmetric (known_list.rs:219-224)."""
    assert hamming_distance(b"ACGT", b"TGCA") == hamming_distance(b"TGCA",
                                                                  b"ACGT")


def test_fasta_string_reverse_complement():
    """test_fasta_string_reverse_complement (known_list.rs:226-233)."""
    assert reverse_complement(b"ACGT") == b"ACGT"
    assert reverse_complement(b"AAAA") == b"TTTT"
    assert reverse_complement(b"TTTT") == b"AAAA"
    assert reverse_complement(b"") == b""
    assert reverse_complement(b"A") == b"T"


def test_fasta_string_reverse_complement_case_folding_deviation():
    """test_fasta_string_reverse_complement_lowercase/_n
    (known_list.rs:235-245): the reference's KnownList-private table keeps
    acgt lowercase; ours folds to uppercase everywhere (see module
    docstring)."""
    assert reverse_complement(b"acgt") == b"ACGT"
    assert reverse_complement(b"aaaa") == b"TTTT"
    assert reverse_complement(b"N") == b"N"
    assert reverse_complement(b"n") == b"N"


def test_fasta_string_new_reverse_complement():
    """test_fasta_string_new_reverse_complement (known_list.rs:247-253)."""
    assert reverse_complement(b"ACGT") == b"ACGT"  # its own complement
    assert reverse_complement(b"AAAA") == b"TTTT"


def test_fasta_string_metric_space():
    """test_fasta_string_metric_space (known_list.rs:255-263): the VP-tree
    metric is the same Hamming distance."""
    assert hamming_distance(b"ACGTACGT", b"ACGTACGT") == 0
    assert hamming_distance(b"ACGTACGT", b"TCGTACGT") == 1


def test_fasta_string_equality():
    """test_fasta_string_equality (known_list.rs:265-273)."""
    assert b"ACGT" == b"ACGT"
    assert b"ACGT" != b"TGCA"
