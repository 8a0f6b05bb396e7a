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
    """inversion_alignment_cigar_test (alignment_matrix.rs:1508-1543);
    the reference test only prints, we assert the inversion markers."""
    inv = InversionScoring(10.0, -11.0, -15.0, -5.0, -2.0, 4)
    res = inversion_alignment(
        b"CCAATCTACTACTGCTTGCA", b"CCGTAGATTTACTGCTTGCA",
        "ref", "read", inv, AFF, local=False)
    ops = [op for _c, op in res.cigar]
    assert "<" in ops and ">" in ops


# --- batched device path (VERDICT r1 item 6) --------------------------------

def test_inversion_batch_matches_host():
    """inversion_alignment_batch must match the host golden per read: the
    screen-negative device keep-last fill and the screen-positive host
    fallback both agree with inversion_alignment."""
    import numpy as np

    from clique_tpu.align.inversion import inversion_alignment_batch
    from clique_tpu.utils.seq import reverse_complement

    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, 60).tobytes()
    inv = InversionScoring(10.0, -11.0, -15.0, -5.0, -2.0, 8)

    reads = []
    # plain reads (substitutions + small indels - no inversion)
    for i in range(14):
        r = bytearray(ref)
        for _k in range(3):
            p = int(rng.integers(0, len(r)))
            r[p] = int(rng.choice(bases))
        if i % 3 == 1:
            p = int(rng.integers(1, len(r) - 4))
            del r[p:p + int(rng.integers(1, 4))]
        elif i % 3 == 2:
            p = int(rng.integers(1, len(r) - 1))
            r[p:p] = rng.choice(bases, int(rng.integers(1, 4))).tobytes()
        reads.append(bytes(r))
    # a read with a true 20bp inversion block
    block = ref[20:40]
    reads.append(ref[:20] + reverse_complement(block) + ref[40:])
    # an indel read
    reads.append(ref[:25] + ref[28:])

    names = [f"r{i}" for i in range(len(reads))]
    out = inversion_alignment_batch(ref, reads, "ref", names, inv, AFF)
    assert len(out) == len(reads)
    for i, read in enumerate(reads):
        golden = inversion_alignment(ref, read, "ref", names[i], inv, AFF,
                                     local=False)
        assert out[i].score == golden.score, (i, out[i].score, golden.score)
        assert out[i].reference_aligned == golden.reference_aligned, i
        assert out[i].read_aligned == golden.read_aligned, i
        assert out[i].cigar == golden.cigar, i
    # the inversion read must carry the block markers
    ops = [op for _c, op in out[14].cigar]
    assert "<" in ops and ">" in ops
