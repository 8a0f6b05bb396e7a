"""Read-merge golden tests transcribed from merger.rs:500-580."""

import pytest

from clique_tpu.align.merge import merge_by_alignment
from clique_tpu.align.scoring import AffineScoring
from clique_tpu.io.fastq import FastqRecord, ReadSetContainer

SCORING = AffineScoring(10.0, -5.0, 8.0, -15.0, -1.0, 0.25)


def _pair(r1, q1, r2, q2):
    return ReadSetContainer(
        read_one=FastqRecord("fakeRead", r1, q1),
        read_two=FastqRecord("fakeRead", r2, q2))


def test_read_merger_simple():
    # merger.rs:527-545: overlap consensus of R1 vs revcomp(R2)
    rsc = _pair(b"AAAAAAAAAAAAAAAAAAAAAAAAAAGGGGGGGGGGGGGG", b"H" * 40,
                b"AAAAAAAAAAAAAAAAAAAAAAAAAAGGGGGGGGGCCCCC", b"H" * 40)
    merged = merge_by_alignment(rsc, SCORING)
    assert merged.seq == (
        b"AAAAAAAAAAAAAAAAAAAAAAAAAAGGGGGGGGGGGGGG"
        b"CCCCCCCCCTTTTTTTTTTTTTTTTTTTTTTTTTT")


def test_read_merger_real_from_palincode():
    # merger.rs:548-566 with real MiSeq reads + qualities
    r1 = b"TACCGGGTCATTCGCTCGCAAACGTGTTTTGCTAGGACCGGCCTTAAAGCGGATACTGGATGAGCCAAGTTCGAAGAGCGGCGGGCGATGTACCTGTCATCTTAGCTAAGATTACAGTACATGTCCAGGAAGTACTCGAGTACTTCCTGG"
    q1 = b"FFAAFFFFFFAAA/A=A/AFFFAFAFFFFFFFFFF/FFFF/AFFFAFFFAFFFFFFFFFFFFF/FFFFAF=FFAF/=FAF/FFF/F/FF/AFF/F/F/FF/FFF=FA=A//=/F=A=EFF=/F=F=FFFFFAFFFF6FF/=F/A=FAF=/"
    r2 = b"AAGCAGTGGTATCAACGCAGAGTACATGGGCCAGGAAGTACTCGAGTACTTCCTGGACATGTCCTGTCATCTTAGCTAAGATGACAGGTACATCGCCAGCCGCTCTTCGAACTTGGCTCATCCAGTATCCGCTTTAAGGCCGGTCCTAGC"
    q2 = b"FFA//FFFFFFFFFFF/FF/FFFFAFF/AFFFFFFFFFFFFFFFFFFFF=FFFFFFFFFFFFFFFFFFFAF=FFFF6FFFFAFFFFFFAAFF=FA=F/=FFFFFF6FF=FFFFF/FFFFFFFFFF/66/FFF66==F=FFFFFFFFF6FF"
    merged = merge_by_alignment(_pair(r1, q1, r2, q2), SCORING)
    assert merged.seq == (
        b"TACCGGGTCATTCGCTCGCAAACGTGTTTTGCTAGGACCGGCCTTAAAGCGGATACTGGATGAGCC"
        b"AAGTTCGAAGAGCGGCGGGCGATGTACCTGTCATCTTAGCTAAGATGACAGGACATGTCCAGGAAG"
        b"TACTCGAGTACTTCCTGGCCCATGTACTCTGCGTTGATACCACTGCTT")


def test_read_merger_simple_no_merge():
    # merger.rs:569-586: disjoint reads concatenate via terminal gaps
    rsc = _pair(b"A" * 40, b"H" * 40, b"G" * 40, b"H" * 40)
    merged = merge_by_alignment(rsc, SCORING)
    assert merged.seq == b"A" * 40 + b"C" * 40
