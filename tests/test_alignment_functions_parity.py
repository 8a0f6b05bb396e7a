"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/alignment_functions.rs.

`exhaustive_alignment_search` lives inside the align pipeline's batched
flush here, so the find-best-reference fixtures are driven through the
same ranking rule (max score over every candidate; Rust max_by keeps the
LAST maximum) with the golden host aligner.
"""

from clique_tpu.align.anchored import cigar_alignment_to_full_string
from clique_tpu.align.cpu import affine_align, pair_to_cigar, simplify_cigar
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.io.fastq import read_fasta

ALIGNER_SCORE = AffineScoring(10.0, -9.0, 9.0, -20.0, -1.0, 1.0)


def _best_reference(fasta_path: str, read: bytes) -> str:
    refs = read_fasta(fasta_path)
    best_name, best_score = None, None
    for name, seq in refs:
        res = affine_align(seq.upper(), read, ALIGNER_SCORE)
        if best_score is None or res.score >= best_score:  # keep-last ties
            best_name, best_score = name, res.score
    return best_name


def test_find_best_reference():
    """test_find_best_reference (alignment_functions.rs:931-1012) with the
    mounted test_best_alignment.fasta panel."""
    fasta = "/root/reference/rust_cmd/test_data/test_best_alignment.fasta"
    read = (b"atggactatcatatgcttaccgtaacttgaaagtatttcgatttcttggctttatatatct"
            b"tgtggaaaggacgaaacaccgGGTAGCAAACGTTTGGACGTGGGGTTAGAGCTAGAAATAG"
            b"CAAGTTAACCTAAGGCTAGTCCGTTATCAACTTGAAAAAGTGGCACCGAGTCGGTGCTTTT"
            b"TTTTCCTGCAGGAAACCCCGGGgaat").upper()
    assert _best_reference(fasta, read) == "1_AAACCCCGGG_GGTAGCAAACGTTTGGACGTG"

    read = (b"atggactatcatatgcttaccgtaacttgaaagtatttcgatttcttggctttatatatct"
            b"tgtggaaaggacgaaacaccgGGTGCCCTTACTCTCACCTGATTACTTAATCCGTGGGGTT"
            b"AGAGCTAGAAATAGCAAGTTAACCTAAGGCTAGTCCGTTATCAACTTGAAAAAGTGGCACC"
            b"GAGTCGGTGCTTTTTTTTCCTGCAGGAACGCCCTACgaattcgggcccattggtatggc"
            ).upper()
    assert _best_reference(fasta, read) == (
        "2_AACGCCCTAC_GGTGCCCTTACTCTCACCTGATTACTTAATCCGTG")


def test_find_best_reference2():
    """test_find_best_reference2 (alignment_functions.rs:1014-1074) with
    the mounted test_ref_alignment.fasta panel."""
    fasta = "/root/reference/rust_cmd/test_data/test_ref_alignment.fasta"
    read = (b"ATGGACTATCATATGCTTACCGTAACTTGAAAGTATTTCGATTTCTTGGCTTTATATATCT"
            b"TGTGGAAAGGACGAAACACCGGTAAATTTGAGGCTCCGGCATGCAGGAGGCCGTGGGGTTA"
            b"GAGCTAGAAATAGCAAGTTAACCTAAGGCTAGTCCGTTATCAACTTG")
    assert _best_reference(fasta, read) == (
        "ref_48_GGTAAATTTGAGGCTCCGGCATGCAGGAGGCCGTG")


def test_simplify_cigar_merge_runs():
    """simplify_cigar_test (alignment_functions.rs:1076-1100)."""
    assert simplify_cigar([(1, "M"), (1, "M"), (1, "M")]) == [(3, "M")]
    assert simplify_cigar([(1, "M"), (1, "I"), (1, "M"), (1, "M")]) == \
        [(1, "M"), (1, "I"), (2, "M")]


def test_simplify_cigar_no_merge_needed():
    """test_simplify_cigar_no_merge_needed (alignment_functions.rs:1115-1126)."""
    ops = [(3, "M"), (2, "D"), (1, "I"), (4, "M")]
    assert simplify_cigar(ops) == ops


def test_simplify_cigar_all_same_type():
    """test_simplify_cigar_all_same_type (alignment_functions.rs:1128-1137)
    plus test_alignment_direction_add_same_type
    (alignment_matrix.rs:1594-1607): merging same-op runs adds counts."""
    assert simplify_cigar([(1, "D"), (2, "D"), (3, "D")]) == [(6, "D")]
    assert simplify_cigar([(3, "M"), (5, "M")]) == [(8, "M")]
    assert simplify_cigar([(2, "I"), (4, "I")]) == [(6, "I")]


def test_simplify_cigar_insertions():
    """test_simplify_cigar_insertions (alignment_functions.rs:1139-1149)."""
    assert simplify_cigar([(1, "I"), (1, "I"), (1, "I")]) == [(3, "I")]


def test_cigar_to_alignment_perfect_match():
    """test_cigar_to_alignment_perfect_match
    (alignment_functions.rs:1150-1163)."""
    read_aln, ref_aln = cigar_alignment_to_full_string(
        b"ACGT", b"ACGT", 0, [(4, "M")])
    assert ref_aln == "ACGT"
    assert read_aln == "ACGT"
    assert pair_to_cigar(ref_aln.encode(), read_aln.encode()) == [(4, "M")]


def test_cigar_to_alignment_with_deletion():
    """test_cigar_to_alignment_with_deletion
    (alignment_functions.rs:1166-1181)."""
    read_aln, ref_aln = cigar_alignment_to_full_string(
        b"AT", b"ACGT", 0, [(1, "M"), (2, "D"), (1, "M")])
    assert ref_aln == "ACGT"
    assert read_aln[0] == "A"
    assert read_aln[3] == "T"
    assert len(pair_to_cigar(ref_aln.encode(), read_aln.encode())) == 3


def test_cigar_to_alignment_with_insertion():
    """test_cigar_to_alignment_with_insertion
    (alignment_functions.rs:1183-1198)."""
    read_aln, ref_aln = cigar_alignment_to_full_string(
        b"ACGT", b"AT", 0, [(1, "M"), (2, "I"), (1, "M")])
    assert read_aln == "ACGT"
    assert ref_aln[0] == "A"
    assert ref_aln[3] == "T"
    assert len(pair_to_cigar(ref_aln.encode(), read_aln.encode())) == 3


def test_cigar_to_alignment_with_substitution():
    """test_cigar_to_alignment_with_substitution
    (alignment_functions.rs:1200-1215): substitutions are MatchMismatch,
    merging to one M run."""
    read_aln, ref_aln = cigar_alignment_to_full_string(
        b"ATGT", b"ACGT", 0, [(4, "M")])
    assert ref_aln == "ACGT"
    assert read_aln == "ATGT"
    assert pair_to_cigar(ref_aln.encode(), read_aln.encode()) == [(4, "M")]
