"""Parity test for the fetch-fuse result-transfer packing.

CLIQUE_TPU_FETCH_FUSE=K concatenates K same-shape dispatched groups'
fused result buffers on device into ONE pulled array (batch.concat_fused),
then slices rows back per group on the host (align_pairs_entries pulls()).
Unlike the lax.scan wave (CLIQUE_TPU_WAVE), the K fills stay separate
parallel dispatches — only the device->host transfer fuses — so results
must be bit-identical to the unfused path for every mix of shapes,
remainder batches, and non-uniform references.
"""

import numpy as np

from clique_tpu.align.pipeline import BatchAligner
from clique_tpu.align.scoring import AffineScoring

RNG = np.random.default_rng(20260820)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _random_seq(n):
    return RNG.choice(BASES, size=n).tobytes()


def _mutate(seq, sub=0.08, indel=0.04):
    out = bytearray()
    for b in seq:
        r = RNG.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(RNG.choice(BASES))
        if RNG.random() < sub:
            out.append(RNG.choice(BASES))
        else:
            out.append(b)
    return bytes(out)


def _dataset():
    """Mixed workload: two references of different lengths (two bucket
    shapes -> pack boundaries), uniform runs longer than the batch size
    (multiple same-shape groups -> actual packing), and a remainder
    batch (padded rows must not leak across pack slices)."""
    ref_a = _random_seq(90)
    ref_b = _random_seq(170)
    refs, reads = [], []
    for _ in range(23):          # bucket shape A, group of 23 (remainder)
        refs.append(ref_a)
        reads.append(_mutate(ref_a))
    for _ in range(40):          # bucket shape B: 40 pairs at batch 16
        refs.append(ref_b)       # -> 3 groups, packed under fuse>1
        reads.append(_mutate(ref_b))
    for _ in range(9):           # back to shape A (non-adjacent same shape)
        refs.append(ref_a)
        reads.append(_mutate(ref_a))
    return refs, reads


def _run(monkeypatch, fuse, refs, reads):
    monkeypatch.setenv("CLIQUE_TPU_FETCH_FUSE", str(fuse))
    aligner = BatchAligner(AffineScoring.aligner_default(), batch_size=16)
    assert aligner.fetch_fuse == fuse
    return aligner.align_pairs(refs, reads)


def test_fetch_fuse_bit_parity(monkeypatch):
    refs, reads = _dataset()
    base = _run(monkeypatch, 1, refs, reads)
    for fuse in (2, 8):
        packed = _run(monkeypatch, fuse, refs, reads)
        assert len(packed) == len(base)
        for got, want in zip(packed, base):
            assert got == want  # (ref_aligned, read_aligned, cigar, score)
