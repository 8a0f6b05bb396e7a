"""Transcriptions of the remaining inline tests of
/root/reference/rust_cmd/src/merger.rs (tests/test_merge.py has the
simple/palincode/no-merge trio). read_merger_many_real_reads is a timing
loop over the same input as read_merger_real_reads and is folded into it.
"""

import pytest

from clique_tpu.align.merge import (
    alignment_rate_and_consensus,
    merge_by_alignment,
    merge_by_concatenation,
    orient_sequence,
)
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.config.layout import (
    AlignedReadOrientation,
    ReadPosition,
    SequenceLayout,
)
from clique_tpu.io.fastq import FastqRecord, ReadSetContainer

SCORING = AffineScoring.merge_default()
FWD = AlignedReadOrientation("Forward")
REV = AlignedReadOrientation("Reverse")
RC = AlignedReadOrientation("ReverseComplement")
UNK = AlignedReadOrientation("Unknown")


def _pair(r1, q1, r2, q2):
    return ReadSetContainer(
        read_one=FastqRecord("fakeRead", r1, q1),
        read_two=FastqRecord("fakeRead", r2, q2))


def _layout(reads):
    return SequenceLayout(known_strand=True, reads=reads, references={})


# --- orient_sequence --------------------------------------------------------

def test_orient_sequence_forward():
    """test_orient_sequence_forward (merger.rs:690-695)."""
    assert orient_sequence(b"ACGT", FWD) == b"ACGT"


def test_orient_sequence_reverse():
    """test_orient_sequence_reverse (merger.rs:697-702)."""
    assert orient_sequence(b"ACGT", REV) == b"TGCA"


def test_orient_sequence_reverse_complement():
    """test_orient_sequence_reverse_complement (merger.rs:704-709)."""
    assert orient_sequence(b"ACGT", RC) == b"ACGT"


def test_orient_sequence_reverse_complement_poly_a():
    """test_orient_sequence_reverse_complement_poly_a (merger.rs:711-716)."""
    assert orient_sequence(b"AAAA", RC) == b"TTTT"


def test_orient_sequence_unknown_panics():
    """test_orient_sequence_unknown_panics (merger.rs:719-723)."""
    with pytest.raises(ValueError, match="Unknown"):
        orient_sequence(b"ACGT", UNK)


def test_orient_sequence_empty():
    """test_orient_sequence_empty (merger.rs:725-730)."""
    assert orient_sequence(b"", FWD) == b""
    assert orient_sequence(b"", REV) == b""
    assert orient_sequence(b"", RC) == b""


# --- alignment_rate_and_consensus -------------------------------------------

def test_alignment_rate_and_consensus_identical():
    """test_alignment_rate_and_consensus_identical (merger.rs:733-742)."""
    seq, quals = alignment_rate_and_consensus(b"ACGT", b"HHHH",
                                              b"ACGT", b"HHHH")
    assert seq == b"ACGT"
    assert len(quals) == 4


def test_alignment_rate_and_consensus_with_gap():
    """test_alignment_rate_and_consensus_with_gap (merger.rs:744-753):
    a one-sided gap takes the other read's base."""
    seq, _quals = alignment_rate_and_consensus(b"A-GT", b"HHH",
                                               b"ACGT", b"HHHH")
    assert seq[1] == ord("C")


# --- real-read align merges -------------------------------------------------

def test_read_merger_real_reads_from_meisam():
    """read_merger_real_reads_from_meisam (merger.rs:640-655)."""
    r1 = b"CGAATGTCAAAGTCAATGCGTTAGGGTTTCTTATATGGTGGTTTCTAACATTGGGGTTAGAGCTAGAAATAGCAAGTTAACCTAAGGCGTACTCTGCGTTGATACCACTGCTTAGATCGGAAGAGCACACGTCTGAACTCCAGTCACATG"
    q1 = b"AAFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF"[:150]
    r2 = b"AATCAGTGGTATAAAAGCAGAGTACTCCTTAGGTTAACTTTCTATTTCTAGCTCTAACCCCAATGTTAGAAACCCCCATATAAGAAACCCTAACGCATTGACTTTGACATTCGAGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGTAGAT"
    q2 = b"=FAF6FFFFFFF//FFFFFFFFFF//FAAAFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFAFFFFF/FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFAFFAFFFFFF//FF/FA/F/F=F//=/"
    merged = merge_by_alignment(_pair(r1, q1, r2, q2), SCORING)
    assert merged.seq == (
        b"ATCTACACTCTTTCCCTACACGACGCTCTTCCGATCTCGAATGTCAAAGTCAATGCGTTAGGGTTT"
        b"CTTATATGGTGGTTTCTAACATTGGGGTTAGAGCTAGAAATAGCAAGTTAACCTAAGGCGTACTCT"
        b"GCGTTGATACCACTGCTTAGATCGGAAGAGCACACGTCTGAACTCCAGTCACATG")


def test_read_merger_real_reads():
    """read_merger_real_reads (merger.rs:657-670): the low-quality N is
    replaced by the other read's base."""
    q1 = b"FFFFFFFFFFAFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF/FFAFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF/F/FFFFFFFFFFAFFFFFFFFFFFFFFFA/F=FFFFFFFFFFFFFFFAF!F#FFF"
    r1 = b"GTGGAAAGGACGAAACACCGACGTCTACGTAGACGTACGTTGGAGAGCTAGAAATAGCAAGTTAAAATAAGGCTAGTCCGTTATCAACTTGAACAAGTGGCACCGAGTCGGTGCTTTTTTCGCATTCTACCGTCTTTAGCAAGNTGA"
    r2 = b"TTGGCCGCGGATCCGATTTAAATTCGAATTCAAACATCGACCTGTACGTCTACGTAGACGTACAGGTCGATACTGTTGCGAATGATCACCTTGCTAAAGTCACGGTAGAATGCGAAAAAAGCACCGACTCGGTGCCACTTTTTCAAGTT"
    q2 = b"FFFFFFFFAFFAFFFFF/FFFFFFFFAFFFFFFFFFFFF/FFFFAFFFFFFFFFFFAFFFF/FFFFFFFFAAFFFFFFAFF/FF=FFFFFFFAFFFFFFFFFFFFFFFFFFFFF=FAFFFFFFFFFFFFFFFFFFFFFF=F=FFF=FFF"
    merged = merge_by_alignment(_pair(r1, q1, r2, q2), SCORING)
    assert merged.seq == (
        b"GTGGAAAGGACGAAACACCGACGTCTACGTAGACGTACGTTGGAGAGCTAGAAATAGCAAGTTAAA"
        b"ATAAGGCTAGTCCGTTATCAACTTGAAAAAGTGGCACCGAGTCGGTGCTTTTTTCGCATTCTACCG"
        b"TGACTTTAGCAAGGTGATCATTCGCAACAGTATCGACCTGTACGTCTACGTAGACGTACAGGTCGA"
        b"TGTTTGAATTCGAATTTAAATCGGATCCGCGGCCAA")


def test_read_merger_real_reads2():
    """read_merger_real_reads2 (merger.rs:672-687)."""
    q1 = b"FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF/FFFFFFFFFFFFFFFFAFFFFFFFFF"[:150]
    r1 = b"TTTGTCATCTGCCCTAAAAACACCGGTTTCTTATATGGTGGTGTACGTATGGACTGAACCAGGTGTGCAAGTGGGGTTAGAGCTAGAAATAGCAAGTTAACCTAAGGCGTACTCTGCGTTGATACCACTGCTTAGATCGGAAGAGCACAC"
    r2 = b"AAGCAGTGGTATAAAAGAAGAGTACGCCTTAGGTTAACTTTCTATTTCTAGCTCTAACCCCACTTGCACACCTGGTTCAGTCCATACGTACACCCCCATATAAGAAACCGGTGTTTTTAGGGCAGATGACAAAAGATCGGAAGAGCGTCG"
    q2 = b"/=AFFFFFFFFFFAF/F6FF=FFF6/FAAAFFFFFFFFFF=FFFFFFFFFFFFFFFFFFFFFFFFFFFF6FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFF=AFFFFFFFFFFFFFFFFFFFFF/FF/FFFFFFFFFFFFFFFF"[:150]
    merged = merge_by_alignment(_pair(r1, q1, r2, q2), SCORING)
    assert merged.seq == (
        b"CGACGCTCTTCCGATCTTTTGTCATCTGCCCTAAAAACACCGGTTTCTTATATGGTGGTGTACGTA"
        b"TGGACTGAACCAGGTGTGCAAGTGGGGTTAGAGCTAGAAATAGCAAGTTAACCTAAGGCGTACTCT"
        b"GCGTTGATACCACTGCTTAGATCGGAAGAGCACAC")


# --- merge_reads_by_concatenation -------------------------------------------

def test_check_orientation():
    """check_orientation (merger.rs:774-856)."""
    rsc = _pair(b"AAAAAAAAAA", b"FFFFFFFFFF", b"TTTTTTTTTT", b"FFFFFFFFFF")
    both_fwd = b"AAAAAAAAAATTTTTTTTTT"
    both_rc = b"AAAAAAAAAAAAAAAAAAAA"

    merged = merge_by_concatenation(rsc, _layout([
        ReadPosition("Read1", FWD), ReadPosition("Read2", RC)]))
    assert merged.seq == both_rc

    merged = merge_by_concatenation(rsc, _layout([
        ReadPosition("Read1", FWD), ReadPosition("Read2", REV)]))
    assert merged.seq != both_rc

    merged = merge_by_concatenation(rsc, _layout([
        ReadPosition("Read1", FWD), ReadPosition("Read2", FWD)]))
    assert merged.seq == both_fwd


def test_check_spacers():
    """check_spacers (merger.rs:858-908): spacer sequences are spliced in
    with fake 'H' qualities."""
    rsc = _pair(b"AAAAAAAAAA", b"FFFFFFFFFF", b"TTTTTTTTTT", b"FFFFFFFFFF")
    merged = merge_by_concatenation(rsc, _layout([
        ReadPosition("Read1", FWD),
        ReadPosition("Spacer", FWD, spacer_sequence="ACGTACGTACGT"),
        ReadPosition("Read2", FWD),
        ReadPosition("Spacer", FWD, spacer_sequence="GGGG"),
    ]))
    assert merged.seq == b"AAAAAAAAAAACGTACGTACGTTTTTTTTTTTGGGG"
    assert merged.quals == b"F" * 10 + b"H" * 12 + b"F" * 10 + b"H" * 4
