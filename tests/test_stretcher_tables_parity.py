"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/consensus/stretcher.rs and
/root/reference/rust_cmd/src/fasta_comparisons.rs.

The reference's table types (phf maps of maps) become dense uint8 numpy
tables here (utils/seq.py), so the structural `.get(..) == None` checks
translate to mask/identity assertions with the same semantics. The
`ReferenceStatus` PartialEq and `Display` tests are Rust-trait plumbing
with no behavioral analogue and are not transcribed.
"""

import pytest

from clique_tpu.consensus.stretcher import AlignmentCandidate, NucCounts
from clique_tpu.utils.seq import (
    DEGENERATE_MASK,
    KNOWN_BASE,
    _BITS,
    edit_distance,
    reverse_complement,
)

GAP = ord("-")


# --- stretcher.rs NucCounts -------------------------------------------------

def test_nuc_counts_new():
    """test_nuc_counts_new (stretcher.rs)."""
    nc = NucCounts(ord("A"))
    assert nc.ref_base == ord("A")
    assert nc.counts == [0, 0, 0, 0, 0, 0]
    assert nc.total() == 0


def test_nuc_counts_update():
    """test_nuc_counts_update (stretcher.rs)."""
    nc = NucCounts(ord("A"))
    nc.update(ord("A"), ord("H"))
    assert nc.counts[0] == 1
    assert nc.quals[0] == [ord("H")]
    nc.update(ord("C"), ord("I"))
    assert nc.counts[1] == 1
    nc.update(ord("G"), ord("F"))
    assert nc.counts[2] == 1
    nc.update(ord("T"), ord("H"))
    assert nc.counts[3] == 1
    nc.update(GAP, None)
    assert nc.counts[5] == 1
    assert nc.total() == 5


def test_nuc_counts_update_lowercase():
    """test_nuc_counts_update_lowercase (stretcher.rs)."""
    nc = NucCounts(ord("A"))
    for i, b in enumerate(b"acgt"):
        nc.update(b, ord("H"))
        assert nc.counts[i] == 1


def test_nuc_counts_update_unknown_base():
    """test_nuc_counts_update_unknown_base (stretcher.rs): anything that
    isn't ACGT/acgt/- counts as N."""
    nc = NucCounts(ord("A"))
    nc.update(ord("N"), ord("H"))
    assert nc.counts[4] == 1
    assert nc.quals[4] == [ord("H")]


def test_nuc_counts_proportion():
    """test_nuc_counts_proportion (stretcher.rs)."""
    nc = NucCounts(ord("A"))
    nc.update(ord("A"), ord("H"))
    nc.update(ord("A"), ord("H"))
    nc.update(ord("C"), ord("H"))
    nc.update(GAP, None)
    assert nc.proportion(ord("A"), 4) == 0.5
    assert nc.proportion(ord("C"), 4) == 0.25
    assert nc.proportion(GAP, 4) == 0.25
    assert nc.proportion(ord("G"), 4) == 0.0


def test_nuc_counts_new_from():
    """test_nuc_counts_new_from (stretcher.rs): one observed base against a
    different reference base."""
    nc = NucCounts(ord("G"))
    nc.update(ord("A"), ord("H"))
    assert nc.ref_base == ord("G")
    assert nc.counts[0] == 1
    assert nc.quals[0] == [ord("H")]
    assert nc.total() == 1


def test_nuc_counts_consensus_base_majority():
    """test_nuc_counts_consensus_base_majority (stretcher.rs)."""
    nc = NucCounts(ord("A"))
    for _ in range(5):
        nc.update(ord("G"), ord("I") - 33)
    nc.update(ord("A"), ord("I") - 33)
    base, qual = nc.consensus_base(0.75)
    assert base == ord("G")
    assert qual is not None


def test_nuc_counts_consensus_base_gap_call():
    """test_nuc_counts_consensus_base_gap_call (stretcher.rs): 4 gaps of 5
    = 0.80 >= 0.75 calls a gap with no quality."""
    nc = NucCounts(ord("A"))
    for _ in range(4):
        nc.update(GAP, None)
    nc.update(ord("A"), ord("I") - 33)
    base, qual = nc.consensus_base(0.75)
    assert base == GAP
    assert qual is None


# --- stretcher.rs AlignmentCandidate ---------------------------------------

def test_alignment_candidate_new():
    """test_alignment_candidate_new (stretcher.rs)."""
    cand = AlignmentCandidate(b"ACGT", "test_ref")
    assert len(cand.columns) == 4
    assert len(cand.read_names) == 0
    assert cand.reference_name == "test_ref"


def test_alignment_candidate_single_perfect_match():
    """test_alignment_candidate_single_perfect_match (stretcher.rs)."""
    cand = AlignmentCandidate(b"ACGT", "ref")
    cand.add_alignment(b"ACGT", b"ACGT", "testread")
    conc = cand.to_consensus(0.75)
    assert conc.reference_aligned == b"ACGT"
    assert conc.read_aligned == b"ACGT"


def test_nuc_counts_display():
    """test_nuc_counts_display (stretcher.rs:515-520): repr mirrors the
    reference Display format."""
    nc = NucCounts(ord("A"))
    assert "a: 0" in repr(nc)
    nc.update(ord("G"), 30)
    assert "g1" in repr(nc)


def test_alignment_candidate_mismatched_refs_error():
    """test_alignment_candidate_mismatched_refs_error (stretcher.rs) plus
    test_reference_status_partial_eq_u8 (stretcher.rs:522-530): the
    column-vs-reference base comparison is what rejects a member whose
    reference string disagrees with the column model."""
    cand = AlignmentCandidate(b"ACGT", "ref")
    cand.add_alignment(b"ACGT", b"ACGT", "r0")
    with pytest.raises(ValueError):
        cand.add_alignment(b"TCGT", b"ACGT", "r1")


def test_merge_two_references():
    """test_merge_two_references (stretcher.rs) — the multi-step insertion
    evidence scenario, step for step."""
    cand = AlignmentCandidate(b"ACGTACGT", "ref_name")

    cand.add_alignment(b"ACGTACGT", b"ACG--CGT", "r0")
    conc = cand.to_consensus(0.75)
    assert conc.reference_aligned == b"ACGTACGT"
    assert conc.read_aligned == b"ACG--CGT"

    # a single read carrying an insertion: not enough evidence (1/2 < 0.75)
    cand.add_alignment(b"ACGT-ACGT", b"ACGTAACGT", "r1")
    conc = cand.to_consensus(0.75)
    assert conc.reference_aligned == b"ACGTACGT"
    assert conc.read_aligned == b"ACGTACGT"

    cand.add_alignment(b"ACGTACGT", b"ACGTACGT", "r2")
    conc = cand.to_consensus(0.75)
    assert conc.reference_aligned == b"ACGTACGT"
    assert conc.read_aligned == b"ACGTACGT"

    cand.add_alignment(b"ACGTACGT", b"--------", "r3")
    conc = cand.to_consensus(0.75)
    assert conc.reference_aligned == b"ACGTACGT"
    assert conc.read_aligned == b"ACGTACGT"

    # 20 reads with a 4-column insertion: 20/24 >= 0.75, insertion called
    for k in range(20):
        cand.add_alignment(b"ACGT----ACGT", b"ACGTAGGAACGT", f"ins{k}")
    conc = cand.to_consensus(0.75)
    assert conc.reference_aligned == b"ACGT----ACGT"
    assert conc.read_aligned == b"ACGTAGGAACGT"


# --- fasta_comparisons.rs ---------------------------------------------------

def test_knownbases_standard():
    """test_knownbases_standard (fasta_comparisons.rs): canonical ACGT both
    cases."""
    for b in "ACGT":
        assert KNOWN_BASE[ord(b)] == ord(b)
        assert KNOWN_BASE[ord(b.lower())] == ord(b)


def test_knownbases_excludes_degenerate():
    """test_knownbases_excludes_degenerate (fasta_comparisons.rs)."""
    assert KNOWN_BASE[ord("N")] == 0
    assert KNOWN_BASE[ord("R")] == 0
    assert KNOWN_BASE[GAP] == 0


def test_reversecomp_standard():
    """test_reversecomp_standard (fasta_comparisons.rs): ACGT/acgt map to
    their uppercase complements."""
    assert reverse_complement(b"A") == b"T"
    assert reverse_complement(b"a") == b"T"
    assert reverse_complement(b"T") == b"A"
    assert reverse_complement(b"t") == b"A"
    assert reverse_complement(b"G") == b"C"
    assert reverse_complement(b"g") == b"C"
    assert reverse_complement(b"C") == b"G"
    assert reverse_complement(b"c") == b"G"


def test_degeneratebases_standard_bases():
    """test_degeneratebases_standard_bases (fasta_comparisons.rs): A's set
    contains A/a and not C."""
    assert edit_distance(b"A", b"A") == 0
    assert edit_distance(b"A", b"a") == 0
    assert edit_distance(b"A", b"C") == 1


def test_degeneratebases_r_purine():
    """test_degeneratebases_r_purine (fasta_comparisons.rs): R = A|G."""
    assert DEGENERATE_MASK[ord("R")] == (_BITS["A"] | _BITS["G"])
    assert DEGENERATE_MASK[ord("r")] == (_BITS["A"] | _BITS["G"])


def test_degeneratebases_y_pyrimidine():
    """test_degeneratebases_y_pyrimidine (fasta_comparisons.rs): Y = C|T."""
    assert DEGENERATE_MASK[ord("Y")] == (_BITS["C"] | _BITS["T"])


def test_degeneratebases_n_any():
    """test_degeneratebases_n_any (fasta_comparisons.rs): N = ACGT."""
    assert DEGENERATE_MASK[ord("N")] == 15


def test_degeneratebases_case_insensitive_keys():
    """test_degeneratebases_case_insensitive_keys (fasta_comparisons.rs)."""
    for code in "ACGTRYKMSWBDHVN":
        assert DEGENERATE_MASK[ord(code)] == DEGENERATE_MASK[ord(code.lower())]


def test_degeneratebases_all_iupac_codes_present():
    """test_degeneratebases_all_iupac_codes_present (fasta_comparisons.rs)."""
    for code in "ACGTRYKMSWBDHVN":
        assert DEGENERATE_MASK[ord(code)] != 0
        assert DEGENERATE_MASK[ord(code.lower())] != 0


def test_degeneratebases_exclusion_codes():
    """test_degeneratebases_{b_not_a,d_not_c,h_not_g,v_not_t}
    (fasta_comparisons.rs:207-247)."""
    assert DEGENERATE_MASK[ord("B")] == (_BITS["C"] | _BITS["G"] | _BITS["T"])
    assert DEGENERATE_MASK[ord("D")] == (_BITS["A"] | _BITS["G"] | _BITS["T"])
    assert DEGENERATE_MASK[ord("H")] == (_BITS["A"] | _BITS["C"] | _BITS["T"])
    assert DEGENERATE_MASK[ord("V")] == (_BITS["A"] | _BITS["C"] | _BITS["G"])


def test_knownbasesplusinsert_includes_gap():
    """test_knownbasesplusinsert_includes_gap (fasta_comparisons.rs:121-127):
    the consensus column alphabet recognizes '-' alongside ACGT (NucCounts
    tracks it in its own slot) while the plain base table does not."""
    nc = NucCounts(ord("A"))
    nc.update(ord("-"), None)
    assert nc.counts[5] == 1
    assert KNOWN_BASE[ord("-")] == 0
    assert KNOWN_BASE[ord("A")] == ord("A")
    assert KNOWN_BASE[ord("N")] == 0


def test_reversecomp_excludes_others():
    """test_reversecomp_excludes_others (fasta_comparisons.rs:140-144): N and
    '-' have no ACGT complement; the IUPAC-aware reverse_complement passes
    them through rather than mapping them to a canonical base."""
    assert reverse_complement(b"N") == b"N"
    assert reverse_complement(b"-") == b"-"
