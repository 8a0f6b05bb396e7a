"""Device Waterman-Eggert local mode: the batched argmax-start walk must
match the host golden (align/cpu.py affine_align local=True) on the W-E
published fixture and random pairs (alignment_matrix.rs:868-899, 941-986;
VERDICT r1 item 6)."""

import numpy as np
import pytest

from clique_tpu.align import batch as dbatch
from clique_tpu.align.cpu import affine_align
from clique_tpu.align.scoring import AffineScoring

RNG = np.random.default_rng(2024)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def score(m, mm, sp, go, ge, fgm=1.0):
    return AffineScoring(m, mm, sp, go, ge, fgm)


def device_local(pairs, scoring):
    """Run a batch of (ref, read) pairs through the device local path."""
    L1 = max(len(a) for a, _b in pairs)
    L2 = max(len(b) for _a, b in pairs)
    B = len(pairs)
    refs = np.zeros((B, L1), dtype=np.uint8)
    reads = np.zeros((B, L2), dtype=np.uint8)
    ref_lens = np.zeros(B, dtype=np.int32)
    read_lens = np.zeros(B, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        refs[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        reads[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        ref_lens[i], read_lens[i] = len(a), len(b)
    bw = np.maximum(ref_lens, read_lens)
    params = dbatch.scoring_to_params(scoring)
    res, _tb = dbatch.align_batch_device(
        refs, reads, ref_lens, read_lens, bw, params,
        n1=L1 + 1, n2=L2 + 1, local=True)
    return res


def expand_local(res, i, ref, read):
    """Aligned strings for batch row i from the local result."""
    ops = np.asarray(res.ops)[i]
    n = int(np.asarray(res.n_ops)[i])
    rs = int(np.asarray(res.ref_start)[i])
    ds = int(np.asarray(res.read_start)[i])
    a1 = bytearray()
    a2 = bytearray()
    x, y = rs, ds
    for op in ops[:n]:
        if op == dbatch.OP_MATCH:
            a1.append(ref[x]); a2.append(read[y]); x += 1; y += 1
        elif op == dbatch.OP_DEL:
            a1.append(ref[x]); a2.append(ord("-")); x += 1
        elif op == dbatch.OP_INS:
            a1.append(ord("-")); a2.append(read[y]); y += 1
    assert x == int(np.asarray(res.ref_end)[i])
    assert y == int(np.asarray(res.read_end)[i])
    return bytes(a1), bytes(a2)


def test_waterman_eggert_fixture_device():
    ref = b"CCAATCTACTACTGCTTGCAGTAC"
    read = b"AGTCCGAGGGCTACTCTACTGAAC"
    sc = score(10, -9, 8, -20, -10)
    res = device_local([(ref, read)], sc)
    a1, a2 = expand_local(res, 0, ref, read)
    assert a1 == b"CCAATCTACT"
    assert a2 == b"CTACTCTACT"
    golden = affine_align(ref, read, sc, local=True)
    assert float(np.asarray(res.score)[0]) == golden.score


def test_local_device_matches_golden_random():
    sc = score(10, -11, 8, -15, -5)
    pairs = []
    for _ in range(24):
        la = int(RNG.integers(8, 40))
        lb = int(RNG.integers(8, 40))
        a = RNG.choice(BASES, la).tobytes()
        if RNG.random() < 0.5:
            # embed a shared segment so a real local hit exists
            seg = RNG.choice(BASES, int(RNG.integers(5, 12))).tobytes()
            pa = int(RNG.integers(0, la - 1))
            a = a[:pa] + seg + a[pa:]
            b = RNG.choice(BASES, lb).tobytes()
            pb = int(RNG.integers(0, lb - 1))
            b = b[:pb] + seg + b[pb:]
        else:
            b = RNG.choice(BASES, lb).tobytes()
        pairs.append((a, b))
    res = device_local(pairs, sc)
    for i, (a, b) in enumerate(pairs):
        golden = affine_align(a, b, sc, local=True)
        assert float(np.asarray(res.score)[i]) == golden.score, (i, a, b)
        a1, a2 = expand_local(res, i, a, b)
        assert a1 == golden.reference_aligned, (i, a, b, a1)
        assert a2 == golden.read_aligned, (i, a, b, a2)


def test_local_device_mixed_lengths_padding():
    """Padding rows must not leak into shorter elements' argmax."""
    sc = score(10, -9, 8, -20, -10)
    pairs = [
        (b"CCAATCTACTACTGCTTGCAGTAC", b"AGTCCGAGGGCTACTCTACTGAAC"),
        (b"ACGT", b"ACGT"),
        (b"AAAA", b"TTTT"),
    ]
    res = device_local(pairs, sc)
    for i, (a, b) in enumerate(pairs):
        golden = affine_align(a, b, sc, local=True)
        assert float(np.asarray(res.score)[i]) == golden.score, i
        a1, a2 = expand_local(res, i, a, b)
        assert (a1, a2) == (golden.reference_aligned, golden.read_aligned)
