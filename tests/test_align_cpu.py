"""Golden DP tests transcribed from the reference's inline unit tests
(/root/reference/rust_cmd/src/alignment/alignment_matrix.rs:1130-1775).

These pin the behavioral contract of the 3-plane affine DP: exact aligned
strings, Waterman-Eggert secondary alignments, wildcard scoring, terminal-gap
handling, and tie-break order.
"""

import numpy as np
import pytest

from clique_tpu.align.cpu import (
    AlignmentResult,
    Matrices,
    affine_align,
    clean_and_find_next_best,
    fill_affine,
    find_max_3d,
    three_way_max,
    traceback,
    DIAG, UP, LEFT,
)
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.utils.seq import reverse_complement


def score(m, mm, sp, go, ge, fgm=1.0):
    return AffineScoring(m, mm, sp, go, ge, fgm)


# --- three_way_max tie order (alignment_matrix.rs:1544-1592) ---------------

def test_three_way_max_up_wins():
    assert three_way_max(10.0, 5.0, 3.0) == (10.0, UP)


def test_three_way_max_left_wins():
    assert three_way_max(3.0, 10.0, 5.0) == (10.0, LEFT)


def test_three_way_max_diag_wins():
    assert three_way_max(3.0, 5.0, 10.0) == (10.0, DIAG)


def test_three_way_max_ties_prefer_diag():
    assert three_way_max(10.0, 5.0, 10.0) == (10.0, DIAG)
    assert three_way_max(5.0, 10.0, 10.0) == (10.0, DIAG)
    assert three_way_max(7.0, 7.0, 7.0) == (7.0, DIAG)
    assert three_way_max(-10.0, -5.0, -3.0) == (-3.0, DIAG)


# --- Waterman-Eggert local alignment (rs:1142-1193) ------------------------

def test_waterman_eggart_affine():
    """waterman_eggart_affine_test_case (alignment_matrix.rs:1173-1193)."""
    ref = b"CCAATCTACTACTGCTTGCAGTAC"
    read = b"AGTCCGAGGGCTACTCTACTGAAC"
    res = affine_align(ref, read, score(10, -9, 8, -20, -10), local=True)
    assert res.reference_aligned == b"CCAATCTACT"
    assert res.read_aligned == b"CTACTCTACT"


def test_waterman_eggart_affine_second_best():
    """waterman_eggart_affine_test_case_2nds (alignment_matrix.rs:1142-1171)."""
    ref = b"CCAATCTACTACTGCTTGCAGTAC"
    read = b"AGTCCGAGGGCTACTCTACTGAAC"
    sc = score(10, -9, 8, -10, -10)
    mat = Matrices.create(len(ref) + 1, len(read) + 1, local=True)
    fill_affine(mat, ref, read, sc)
    res = traceback(mat, ref, read)
    assert res.reference_aligned == b"CCAATCTACT"
    assert res.read_aligned == b"CTACTCTACT"

    clean_and_find_next_best(mat, ref, read, sc, res)
    res2 = traceback(mat, ref, read)
    assert res2.reference_aligned == b"CTACTACTGCT"
    assert res2.read_aligned == b"CTACT-CTACT"


# --- wildcard / special-character scoring (rs:1195-1273) -------------------

def test_affine_special_scoring():
    """affine_special_scoring_test (alignment_matrix.rs:1195-1215)."""
    res = affine_align(b"AAAANAAAA", b"AAAAAAAA", score(6, -6, 5, -10, -10))
    assert res.reference_aligned == b"AAAANAAAA"
    assert res.read_aligned == b"AAAA-AAAA"


def test_affine_special_practical():
    """affine_special_practical_test (alignment_matrix.rs:1253-1274)."""
    ref = b"AAAAAAAA############################AGATCGGAAGAGCGTCGTGTAGGGAAAGA"
    read = b"AAAAAAAAAAAAAAAAAAAAAAAAATATCTCGTTTAATTGACTCTGAAATCAAGATCGGAAGAGCGTCGTGTAGGGAAAGA"
    res = affine_align(ref, read, score(6, -6, 5, -10, -10))
    assert res.reference_aligned == b"----------------AAAAAAAA############################AGATCGGAAGAGCGTCGTGTAGGGAAAGA"
    assert res.read_aligned == read


def test_favor_non_special_characters():
    """affine_alignment_test_favor_non_special_characters
    (alignment_matrix.rs:1298-1316)."""
    ref = b"TTAAGCAGTGGTATCAACGCAGAGTACGCCTTAGGTTAACTTGCTATTTCTAGCTCTAACCCCACCCACGATTGCCGCCGACCCCCATATAAGAAANNNNNNNNNNNNNNNNNNNNNNNNNNAGAT"
    read = b"TTAAGCAGTGGTATCAACGCAGAGTACGCCTTAGGTTAACTTGCTAGTTCTAGCTCTAACCCCACCAACAAGTTTTTCAACACCTAGCGTGT"
    res = affine_align(ref, read, AffineScoring.default_dna())
    assert res.reference_aligned == ref
    assert res.read_aligned == b"TTAAGCAGTGGTATCAACGCAGAGTACGCCTTAGGTTAACTTGCTAGTTCTAGCTCTAACCCCACC----------------------------AACAAGTTTTTCAACACCTAGCGTGT------"


# --- basic global alignment (rs:1276-1339, 1652-1713) ----------------------

def test_affine_alignment_basic():
    """affine_alignment_test (alignment_matrix.rs:1276-1296)."""
    res = affine_align(b"AAAA", b"AATAA", score(6, -6, 8, -10, -10))
    assert res.reference_aligned == b"AA-AA"
    assert res.read_aligned == b"AATAA"
    assert res.cigar_string == "2M1I2M"


def test_identical_sequences_global():
    """test_identical_sequences_global_alignment
    (alignment_matrix.rs:1652-1668)."""
    seq = b"ACGTACGT"
    res = affine_align(seq, seq, AffineScoring.default_dna())
    assert res.reference_aligned == seq
    assert res.read_aligned == seq
    assert res.cigar == [(8, "M")]


def test_single_base_deletion():
    res = affine_align(b"ACGTACGT", b"ACGACGT", score(10, -10, 8, -8, -2))
    dels = sum(c for c, op in res.cigar if op == "D")
    assert dels == 1


def test_single_base_insertion():
    res = affine_align(b"ACGACGT", b"ACGTACGT", score(10, -10, 8, -8, -2))
    ins = sum(c for c, op in res.cigar if op == "I")
    assert ins == 1


# --- local alignment (rs:1342-1371, 1753-1774) -----------------------------

def test_local_alignment_revcomp_read():
    ref = b"CCAATCTACTACTGCTTGCA"
    read = reverse_complement(b"GCCACTCTCGCTGTACTGTG")
    res = affine_align(ref, read, score(10, -11, 8, -15, -5), local=True)
    assert res.reference_aligned == b"TACTGC"
    assert res.read_aligned == b"TACAGC"


def test_local_alignment_finds_best_segment():
    ref = b"XXXXXXACGTACGTXXXXXX"
    read = b"ACGTACGT"
    res = affine_align(ref, read, score(10, -11, 8, -20, -5), local=True)
    assert res.score > 0.0
    assert len(res.reference_aligned) > 0


# --- find_max_3d (rs:1733-1751) --------------------------------------------

def test_find_max_3d():
    """test_find_max_value_3d_array (alignment_matrix.rs:1733-1744)."""
    scores = np.zeros((3, 3, 3))
    scores[1, 2, 0] = 42.0
    x, y, v = find_max_3d(scores, 3, 3)
    assert (x, y, v) == (1, 2, 42.0)


def test_find_max_3d_tie_rules():
    # equal values: smaller x+y wins, then smaller x
    scores = np.zeros((4, 4, 3))
    scores[2, 2, 0] = 5.0
    scores[1, 3, 1] = 5.0
    scores[3, 1, 2] = 5.0
    x, y, v = find_max_3d(scores, 4, 4)
    assert (x, y) == (1, 3)  # x+y ties at 4; smallest x wins


# --- real-world long read, local mode (rs:1374-1404) -----------------------

def test_real_world_minimap_ugly_alignment():
    """affine_alignment_real_world_minimap_ugly_alignment
    (alignment_matrix.rs:1374-1404)."""
    ref = b"CTACACGACGCTCTTCCGATCTNNNNNNNNNNNNNNNNNNNNNNNNNNNNTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTATTAGGAAAGGACAGTGGGAGTGGCACCTTCCAGGGTCAAGGAAGGCACGGGGGAGGGGCAAACAACAGATGGCTGGCAACTAGAAGGCACAGTGAGCTTGTACATAACTACGCAAGTCCTTGCTAGGACCGGCCTTAAAGCCACGTGGCGGCCGCCGAGCGGTATCAGCTCACTCAAAGGCGGTAATACGGTTATCCACAGAATCGTGGTACAATATGCGTCTCCGAAATTAACCCGGTGTGTTTAAACGAAAAGGACCGACTACTACCTCGCGAAAGCTCTAAGTGTTGTGTCAGCGAAACTTCGCGGAGGTTCGACATCGAAAGACACGCGGGTGTATATGGCGAAAGCAGCAACCTGATCTGGGGTGAAAAGCCATGGATGTCGGGACGAGAAAGGTCTAGGACTGTTTTGCGAGAAAAGGATTAGAGTTAGAATCGCGAAACGCTCGCGTTCTACCGCTCCGAAAGATCCCGAGGTTGTTTTACCGAAAGCGACGACTTCTGTCATAGTGAAACGATTGGACGTCTCTGGTGCGAAATCGCGGGTTGTACAACATACGAAACCGAGGCTATAATCCCGGACGAAAGGTATAGGTAGCTAACACGCGAAACCCTAGGGATCGTGCTAGCCGAAAGCCCTATTATGTAGGGGACTGAAAAACATGGGTACGTCCCCGATGAAACGCTGCTTGTCTGGCCTCGCGAAAGAATGAGCTGAGTGTGAGGCGAAAAGCTTAAGCTGTGCACTCTCGAAAGTCGGTGTCTATTAGTGGATGAAACAGCGGGTTCCTGCTCCCGCGAAACGCCACCTGTATGTTACTTCGAAAATGAAGGGATAGTGGCGGACGAAAGTCATATTCCGTTGTGGTACGAAATTGGTCCTGATGTACGCACAGAAAAGATTGACCTCTGTTCGTACGAAAGCTCGGCCTCTGGGAGTCGTGAAAGACTCGGATCCGTACCAGATGAAAGGCACACCCATGTCCGTCACGAAAACCCAAACCTTGTATGTATGGAAATCTTCTGCGTTCGGGCCGCGGAAAAGCGTATACCTATCTCGCATGAAAGTCTCTTATCTTGTCTACGCGAAACGCTCGTATGCGTACGGGCTGAAAGCGATATACTGTTCGCCCCTGAAACCCTCTAGTTATGCGCCAGTGAAAGAGTCGCGTAGAGTACAGTGCAAGGTCGACAATCAACCTCTGGATTACATCCGATTGCCTTACTGTGCGAAAGTACTCGATGGTGTGGCTTAGAAAGCGTACAGTCTCTGTGCCGGGAAAATAAGAGCGTCTGCGGTTATGAAATCGTGGGCTACTCCTGGGTGGAAAGCTATCCTGTATATTAGTACGAAAGGTGCCAGGTTGCTTCGATCGAAAGCCCGAGAGATTACTCGTAGGAAACTACGCCGGTTACGACGGGCGAAACGACATGAACTTATCCGGACGAAAGGTAGTCCTTACGGTGATCTGCTAGGGTCTCTCCTAGCAACGGTTACTCGATTTGGTACNNNNNNNNNNNNNNNNNNGTACCTGATGCGGCACAATGTCTAGC"
    read = b"TTCCGATCTGTCATAACACCACACTAGAATCACGCGTTTTTTTTTTTTTTTTTTTTTTTTTTTTTTAGCGATGCAATTTCCTCATTTTATTAGGAAAGGACAGTGGGAGTGGCACCTTCCAGGGTCAAGGAAGGCACGGGGGAGGGGCAAACAACAGATGGCTGGCAACTAGAAGGCACAGTGAGCTTGTACATAACTACGCAAGTCCTTGCTAGGACCGGCCTTAAAGCCACGTGGCGGCCGCCGAGCGGTATCAGCTCACTCAAAGGCGGTAATACGGTTATCCACAGAATCGTGGTACAATATGCGTCTCCGAAATTAACCCGGTGCGTTTAAACGAAAAGGACCGACTACTACCTCGCGAAAGCTCTAAGCGTCGTGTCAGCGAAACTTCGCGGAGGTTCGACATCGAAAGACACGCGGGTGTATGTGGCGAAAGCAGCAACCTGATCTGGGGTGAAAAGCCATGGACGCCGGGACGAGAAAGGTCTAGGACTGTTTTGCGAGAAAAGGATTAGAGTTAGAATCGCGAAACGCTCGCGTTCCACCGCTCCGAAAGATCCCGAGGTCGTTTTACCGAAAGCGACGACTTCTGTCATAGTGAAACGATTGGACGTCTCTGGTGCGAAATCGCGGGTTGTACAACATACGAAACCGAGGCTACAACCCCGGACGAAAAGGTATAGGTAGCTAACACGCGAAACCCTAGGGATCGTGCTAGCCGAAAGCCCTATCACGCAGGGGACTGAAAAACATGGGCACGCCCCCGATGAAACGCTGCTTGTCTGGCCTCGCGAAAGAATGAGCAGAGCGTGAGGCGAAAAGCTTAAGCTGTGCACTCTCGAAAGTCGGTGTCCATCAGTGGATGAAACAGCGGGTTCCTGCTCCCGCGAAACGCCACCTGTACGTTACTTCGAAAATGAAGGGACAGCGGCGGACGAAAGTCATATTCCGTTGTGGTACGAAATTGGTCCTGATGCACGCACAGAAAAGATTGACCTCCGTTCGTACGAAAGCTCGGCCTCTGGGAGTCGTGAAAGACTCGGATCCGCACCAGATGAAAGGCACACCCACGCCCGTCACGAAAACCCAAACCTTGTATGTATGGAAATCTTCTGCGTCCGGGCCGCGGAAAAGCGTATACCTATCTCGCATGAAAGTCTCTCACCTCGTCTACGCGAAACGCTCGTACGCGTACGGGCTGAAAGCGATACACCGCTCGCCCCTGAAACCCTCTAGTTACGCGCCAGTGAAAGAGTCGCGTAGAGTACAGTGCAAGGTCGACAATCAACCTCTGGATTACATCCGATTGCCTCACTGTGCGAAAGTACTCGATGGCGTGGCTTAGAAAGCGTACAGTCTCCGTGCCGGGAAAATAAGAGCGCCTGCGGTTATGAAATCGTGGGCTACTCCTGGGTGGAAAGCTATCCTGCACATTAGTACGAAAGGTGCCAGGTTGCTTCGATCGAAAGCCCGAGAGATCACTCGTAGGAAACTACGCCGGTCACGACGGGCGAAACGACATGAACTCATCCGGACGAAAGGTAGTCCTTACGGTGATCTGCTAGGGTCTCTCCTAGCAACGGTTACTCCATCTGGTACACCCCCTGCTCGGGGCAAGTACCTGATGCGGCACAATGTCTAGCAGGTGCTGAAGAAAGTTGTCGGTGTCTTTGTGTTAACCTTAGCAATACGTCTGTCGAAGCAGCTACAA"
    res = affine_align(ref, read, score(10, -11, 8, -15, -5), local=True)
    assert res.reference_aligned == b"TTCCGATCTNNNNNNNNNNNNNNNNNNNNNNNNNNNNTTTTTTTTTTTTTTTTTTTTTTTTTTT--------------------TTTTATTAGGAAAGGACAGTGGGAGTGGCACCTTCCAGGGTCAAGGAAGGCACGGGGGAGGGGCAAACAACAGATGGCTGGCAACTAGAAGGCACAGTGAGCTTGTACATAACTACGCAAGTCCTTGCTAGGACCGGCCTTAAAGCCACGTGGCGGCCGCCGAGCGGTATCAGCTCACTCAAAGGCGGTAATACGGTTATCCACAGAATCGTGGTACAATATGCGTCTCCGAAATTAACCCGGTGTGTTTAAACGAAAAGGACCGACTACTACCTCGCGAAAGCTCTAAGTGTTGTGTCAGCGAAACTTCGCGGAGGTTCGACATCGAAAGACACGCGGGTGTATATGGCGAAAGCAGCAACCTGATCTGGGGTGAAAAGCCATGGATGTCGGGACGAGAAAGGTCTAGGACTGTTTTGCGAGAAAAGGATTAGAGTTAGAATCGCGAAACGCTCGCGTTCTACCGCTCCGAAAGATCCCGAGGTTGTTTTACCGAAAGCGACGACTTCTGTCATAGTGAAACGATTGGACGTCTCTGGTGCGAAATCGCGGGTTGTACAACATACGAAACCGAGGCTATAATCCCGGACG-AAAGGTATAGGTAGCTAACACGCGAAACCCTAGGGATCGTGCTAGCCGAAAGCCCTATTATGTAGGGGACTGAAAAACATGGGTACGTCCCCGATGAAACGCTGCTTGTCTGGCCTCGCGAAAGAATGAGCTGAGTGTGAGGCGAAAAGCTTAAGCTGTGCACTCTCGAAAGTCGGTGTCTATTAGTGGATGAAACAGCGGGTTCCTGCTCCCGCGAAACGCCACCTGTATGTTACTTCGAAAATGAAGGGATAGTGGCGGACGAAAGTCATATTCCGTTGTGGTACGAAATTGGTCCTGATGTACGCACAGAAAAGATTGACCTCTGTTCGTACGAAAGCTCGGCCTCTGGGAGTCGTGAAAGACTCGGATCCGTACCAGATGAAAGGCACACCCATGTCCGTCACGAAAACCCAAACCTTGTATGTATGGAAATCTTCTGCGTTCGGGCCGCGGAAAAGCGTATACCTATCTCGCATGAAAGTCTCTTATCTTGTCTACGCGAAACGCTCGTATGCGTACGGGCTGAAAGCGATATACTGTTCGCCCCTGAAACCCTCTAGTTATGCGCCAGTGAAAGAGTCGCGTAGAGTACAGTGCAAGGTCGACAATCAACCTCTGGATTACATCCGATTGCCTTACTGTGCGAAAGTACTCGATGGTGTGGCTTAGAAAGCGTACAGTCTCTGTGCCGGGAAAATAAGAGCGTCTGCGGTTATGAAATCGTGGGCTACTCCTGGGTGGAAAGCTATCCTGTATATTAGTACGAAAGGTGCCAGGTTGCTTCGATCGAAAGCCCGAGAGATTACTCGTAGGAAACTACGCCGGTTACGACGGGCGAAACGACATGAACTTATCCGGACGAAAGGTAGTCCTTACGGTGATCTGCTAGGGTCTCTCCTAGCAACGGTTACTCGATTTGGTACNNNNNNNNNNNNNNNNNNGTACCTGATGCGGCACAATGTCTAGC"


def test_distance_dna_scoring_is_negated_distance():
    # distance_dna: match 0, everything else -1-ish => score == -edit-path cost
    sc = AffineScoring.distance_dna()
    res = affine_align(b"ACGTACGT", b"ACGTACGT", sc)
    assert res.score == 0.0
    res = affine_align(b"ACGTACGT", b"ACGAACGT", sc)
    assert res.score == -1.0


def test_full_band_equals_default_band():
    ref = b"ACGTTGCAACGTACGTGGCC"
    read = b"ACGTTGCACGTACGTGGACC"
    sc = AffineScoring.aligner_default()
    full = affine_align(ref, read, sc)
    banded = affine_align(ref, read, sc, bandwidth=len(read))
    assert full.reference_aligned == banded.reference_aligned
    assert full.read_aligned == banded.read_aligned
    assert full.score == banded.score


def test_simplify_cigar():
    from clique_tpu.align.cpu import simplify_cigar

    assert simplify_cigar([(1, "M"), (1, "M"), (2, "M")]) == [(4, "M")]
    assert simplify_cigar([(1, "M"), (1, "D"), (1, "D"), (1, "M")]) == \
        [(1, "M"), (2, "D"), (1, "M")]
    assert simplify_cigar([]) == []


# --- vectorized host aligner (jax-free Realign path) ------------------------

def test_affine_align_fast_matches_golden():
    """affine_align_fast (numpy anti-diagonal) must equal affine_align
    exactly - strings, cigar, score - across schemes incl. wildcards and
    terminal-gap multipliers."""
    import numpy as np

    from clique_tpu.align.cpu import affine_align_fast
    from clique_tpu.align.scoring import AffineScoring

    rng = np.random.default_rng(606)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    schemes = [
        AffineScoring.default_dna(),
        AffineScoring.aligner_default(),
        AffineScoring(10.0, -5.0, 8.0, -15.0, -1.0, 0.25),
    ]
    for trial in range(30):
        sc = schemes[trial % len(schemes)]
        la = int(rng.integers(1, 40))
        lb = int(rng.integers(1, 40))
        a = bytearray(rng.choice(bases, la).tobytes())
        b = bytearray(rng.choice(bases, lb).tobytes())
        if trial % 4 == 0 and la > 6:  # wildcard zone in the reference
            a[2:5] = b"012"
        if trial % 5 == 0:
            a[0:1] = b"N"
        a, b = bytes(a), bytes(b)
        g = affine_align(a, b, sc)
        f = affine_align_fast(a, b, sc)
        assert f.reference_aligned == g.reference_aligned, (a, b)
        assert f.read_aligned == g.read_aligned, (a, b)
        assert f.cigar == g.cigar, (a, b)
        assert f.score == g.score, (a, b)
        assert f.path == g.path, (a, b)


def test_affine_align_fast_empty_sides():
    from clique_tpu.align.cpu import affine_align_fast
    from clique_tpu.align.scoring import AffineScoring

    sc = AffineScoring.default_dna()
    for a, b in ((b"", b"ACGT"), (b"ACGT", b""), (b"", b"")):
        g = affine_align(a, b, sc)
        f = affine_align_fast(a, b, sc)
        assert (f.reference_aligned, f.read_aligned, f.score) == \
            (g.reference_aligned, g.read_aligned, g.score)
