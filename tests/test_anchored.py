"""Anchored alignment + seed machinery tests (linked_alignment.rs:364-766)."""

import pytest

from clique_tpu.align.anchored import (
    align_string_with_anchors,
    calculate_score_from_strings,
    validate_cigar_string,
)
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.reference.manager import (
    SeedIndex,
    extend_hit,
    find_greedy_non_overlapping_segments,
    orient_by_longest_segment,
)

AFF = AffineScoring(10.0, -11.0, 8.0, -15.0, -5.0, 1.0)


def test_extend_hit():
    """test_extend_hit_{full_match,partial_match,no_match,offset_search,
    offset_reference,degenerate_bases} (linked_alignment.rs:369-412) plus
    simple_extend_internal_test / simple_extend_short_test
    (linked_alignment.rs:563-581)."""
    assert extend_hit(b"ACGTACGT", 0, b"ACGTACGT", 0) == 8
    assert extend_hit(b"ACGTTTTT", 0, b"ACGTACGT", 0) == 4
    assert extend_hit(b"TTTT", 0, b"ACGT", 0) == 0
    assert extend_hit(b"TTACGT", 2, b"ACGT", 0) == 4
    assert extend_hit(b"ACGT", 0, b"TTACGT", 2) == 4
    # symmetric containment: R's set has A but A's set lacks R
    assert extend_hit(b"RCGT", 0, b"ACGT", 0) == 0
    assert extend_hit(b"AATGATACGG", 0, b"GGAATGATACGGAAA", 2) == 10
    assert extend_hit(b"AATGATACGG", 0, b"AAA", 0) == 2


def test_greedy_segments_and_orientation():
    """find_greedy_simple_ref_test (linked_alignment.rs:604-616, same
    fixture; the reference test only prints, we assert the segments) and
    orient_by_longest_segment on it."""
    ref = b"GTGGAAAGGACGAAACACCGGTACTTTCGAAAGTACGCGTTTTAGAGCTAGAAATAGCAAGTTAAAATAAGGCTAGTCCGTTATCAACTTGAAAAAGTGGCACCGAGTCGGTGCTTTTTTCGCATTCTACCGTGACTTTAGCAAGGTGATCATTCGCAACAGTATCGACCTGCGTACTTTCGAAAGTACGCCGGTCGATGTTTGAATTCGAATTTAAATCGGATCCGCGGCCAA"
    read = b"GTGGAAAGGACGAAACACCGGTACTTTCGAAAGTACGCGTTTTAGAGCTAGAAATAGCAAGTTAAAATAAGGCTAGTCCGTTATCAACTTGAAAAAGTGGCACCGAGTCGGTGCTTTTTTCGCATTCTACCGTGACTTTAGCAAGGTGATCATTCGCAACAGTATCGACGGGCGTACTTTCGAAAGTACGCCCGTCGATGTTTGAATTCGAATTTAAATCGGATCCGCGGCCAA"
    index = SeedIndex(ref, 20)
    segs = find_greedy_non_overlapping_segments(read, ref, index)
    assert len(segs.alignment_segments) >= 2
    assert segs.total_length() > 150
    fwd, _f, _r = orient_by_longest_segment(read, ref, index)
    assert fwd is True


def test_calculate_score_from_strings():
    # all-match columns hit the gap_open/gap_extend arms (reference quirk:
    # the match arm only fires for ref-base/read-gap columns)
    s = calculate_score_from_strings(b"ACGT", b"ACGT", AFF)
    assert s == AFF.gap_open + 3 * AFF.gap_extend


def test_validate_cigar_string():
    """test_validate_cigar_string_{simple_match,deletion,insertion,mixed}
    (linked_alignment.rs:439-481)."""
    validate_cigar_string(b"ACGT", b"ACGT", [(4, "M")])
    validate_cigar_string(b"ACGT", b"----", [(4, "D")])
    validate_cigar_string(b"--", b"AC", [(2, "I")])
    with pytest.raises(AssertionError):
        validate_cigar_string(b"AC-T", b"ACGT", [(4, "M")])


def test_suffix_array_kmer_lookup():
    """suffix_array_test (linked_alignment.rs:583-589): the reference's
    suffix table answers substring queries of any length; our SeedIndex is
    a fixed-length k-mer map, so the lookup is pinned at the seed size."""
    index = SeedIndex(b"AATGATACGG", 3)
    assert index.positions(b"AAT") == [0]
    assert index.positions(b"TTT") == []
    assert index.positions(b"GAT") == [3]


def test_find_greedy_non_overlapping_segments_big_fixture():
    """find_greedy_non_overlapping_segments_test (linked_alignment.rs:591-602):
    the reference test only prints the hits; we assert they are
    non-overlapping, in-bounds exact anchors."""
    ref = (b"NNNNNNNNCATGGTCCTGCTGGAGTTCGTGACCGCCGCCGGGATCACTCTCGGCATGGAC"
           b"GAGCTGTACAAGTAACGAAGAGTAACCGTTGCTAGGAGAGACCATATGTCTAGAGAAAGG"
           b"TACCCTATCCTTTCGAATGGTCCACGCGTAGAAGAAAGTTAGCTCTTGTGCGAGCTACAG"
           b"GAACGATGTTTGATTAGAGTAAGCAGAGGACAAGGGCTCGCGTGCAGCCGAAGTTTGGCC"
           b"GGTACTCTCCAACCGTTAACAACAACACCTTTCATCGAAATCCGCTTGGTAACAACACTA")
    read = (b"GTATTGCTCATGGTCCTGCTGGAGTTCGTGACCGCCGCCGGGATCACTCTCGGCATGGAC"
            b"GAGCTGTACAAGTAACGAAGAGTAACCGTTGCTAGGAGAGACCAAATGTCTAGAGAAAGG"
            b"TACCCTATCCTTTCGAATGGTCCACGCATAGAAGAAGCTTAGCTCTTGTGCGAGCTACAG"
            b"GAACGATGTTTGATTAGAGTAAGCAGAGGACAAGGGCTCGCGTGCAGCCGAAG")
    index = SeedIndex(ref, 20)
    segs = find_greedy_non_overlapping_segments(read, ref, index)
    assert len(segs.alignment_segments) >= 2
    prev_ref_end = prev_read_end = -1
    for seg in segs.alignment_segments:
        assert seg.length >= 20
        assert ref[seg.ref_start:seg.ref_start + seg.length] == \
            read[seg.search_start:seg.search_start + seg.length]
        assert seg.ref_start >= prev_ref_end
        assert seg.search_start >= prev_read_end
        prev_ref_end = seg.ref_start + seg.length
        prev_read_end = seg.search_start + seg.length


def test_anchored_alignment_end_to_end():
    ref = b"CATGGTNNNNNNNNNNNNNNNNNNCGCCGCCGGGATCACTCTCGGCATGGACGAGCTGTACAAGTAACGAAGAGTAACCGTTGCTAGGAGAGACCATATGTCTAGAGAAAGGTACCCTATCCTTTCGAATGGTCCACGCGTAGAAGAAAGTTAGCTCTTGTGCGA"
    read = b"CATGGTCCTGCTGGAGTTCGTGACCGCCGCCGGGATCAACGAGCTGTACAAGTAACGAAGAGTAACCGTTGCTGAAAGGTACCCTATCCTTTCGAATGGTCCACGCGTAGAAGAAAGTTAGTGCGA"
    index = SeedIndex(ref, 20)
    segs = find_greedy_non_overlapping_segments(read, ref, index)
    res = align_string_with_anchors("read", "ref", read, ref, segs, None, AFF)
    assert len(res.reference_aligned) == len(res.read_aligned)
    # anchors guarantee the shared 20+mers are aligned base-for-base
    assert res.read_aligned == b"CATGGTCCTGCTGGAGTTCGTGACCGCCGCCGGGATCA------------ACGAGCTGTACAAGTAACGAAGAGTAACCGTTGCT---------------------GAAAGGTACCCTATCCTTTCGAATGGTCCACGCGTAGAAGAAAGTTAG------TGCGA"
