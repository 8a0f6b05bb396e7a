"""Inversion-alignment golden tests transcribed from
alignment_matrix.rs:1406-1467 and linked_alignment.rs inversion tests."""

import pytest

from clique_tpu.align.inversion import inversion_alignment
from clique_tpu.align.scoring import AffineScoring, InversionScoring

AFF = AffineScoring(10.0, -11.0, 8.0, -15.0, -5.0, 1.0)


def test_inversion_alignment_local():
    # alignment_matrix.rs:1432-1467
    inv = InversionScoring(10.0, -11.0, -15.0, -5.0, -2.0, 4)
    res = inversion_alignment(
        b"CCAATCTACTACTGCTTGCA", b"GCCACTCTCGCTGTACTGTG",
        "REFERENCE_NAME", "READ_NAME", inv, AFF, local=True)
    assert res.reference_aligned == b"CCAATCTACTACTGCTTG"
    assert res.read_aligned == b"CCACTCT-CTACAGCCTG"


def test_inversion_alignment_global():
    # alignment_matrix.rs:1469-1506
    inv = InversionScoring(10.0, -11.0, -15.0, -5.0, -2.0, 2)
    res = inversion_alignment(
        b"CCAATCTACTACTGCTTGCA", b"CCGTAGATTTACTGCTTGCA",
        "REFERENCE_NAME", "READ_NAME", inv, AFF, local=False)
    assert res.reference_aligned == b"CCAATCTACTACTGCTTGCA"
    assert res.read_aligned == b"CCAATCTACTACTGCTTGCA"


def test_inversion_cigar_has_markers():
    inv = InversionScoring(10.0, -11.0, -15.0, -5.0, -2.0, 4)
    res = inversion_alignment(
        b"CCAATCTACTACTGCTTGCA", b"CCGTAGATTTACTGCTTGCA",
        "ref", "read", inv, AFF, local=False)
    ops = [op for _c, op in res.cigar]
    assert "<" in ops and ">" in ops
