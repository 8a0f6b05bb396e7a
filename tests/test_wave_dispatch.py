"""Wave dispatch (align_pairs_raw coalescing): runs of same-shape
uniform-reference groups fuse into one lax.scan device call
(dbatch.align_batch_device_wave). Results must match the per-group
dispatch path exactly."""

import numpy as np
import pytest

from clique_tpu.align.pipeline import BatchAligner
from clique_tpu.align.scoring import AffineScoring


def _dataset(n, rng, ref_len=48):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, ref_len).tobytes()
    reads = []
    for i in range(n):
        read = bytearray(ref)
        for _ in range(3):
            read[int(rng.integers(ref_len))] = int(rng.choice(bases))
        if i % 5 == 0:
            del read[int(rng.integers(ref_len - 1))]   # a deletion
        reads.append(bytes(read))
    return ref, reads


def test_wave_matches_per_group(monkeypatch):
    rng = np.random.default_rng(31)
    ref, reads = _dataset(22, rng)
    refs = [ref] * len(reads)   # same OBJECT — the uniform hot path

    monkeypatch.setenv("CLIQUE_TPU_WAVE", "4")
    waved = BatchAligner(AffineScoring.aligner_default(), batch_size=4,
                         use_mesh=False)
    assert waved.wave == 4
    got = waved.align_pairs(refs, reads)

    monkeypatch.setenv("CLIQUE_TPU_WAVE", "1")
    plain = BatchAligner(AffineScoring.aligner_default(), batch_size=4,
                         use_mesh=False)
    want = plain.align_pairs(refs, reads)
    assert got == want


def test_wave_skips_mixed_references(monkeypatch):
    """Distinct reference objects fall back to per-group dispatch but
    still produce correct alignments."""
    rng = np.random.default_rng(13)
    ref1, reads1 = _dataset(6, rng)
    ref2, reads2 = _dataset(6, rng)
    refs = [ref1] * 6 + [ref2] * 6
    reads = reads1 + reads2

    monkeypatch.setenv("CLIQUE_TPU_WAVE", "4")
    aligner = BatchAligner(AffineScoring.aligner_default(), batch_size=4,
                           use_mesh=False)
    got = aligner.align_pairs(refs, reads)
    monkeypatch.setenv("CLIQUE_TPU_WAVE", "1")
    plain = BatchAligner(AffineScoring.aligner_default(), batch_size=4,
                         use_mesh=False)
    want = plain.align_pairs(refs, reads)
    assert got == want


def test_wave_under_mesh(monkeypatch):
    """Wave + data mesh: the wave axis stays whole, the batch axis shards."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    rng = np.random.default_rng(5)
    ref, reads = _dataset(40, rng)
    refs = [ref] * len(reads)

    monkeypatch.setenv("CLIQUE_TPU_WAVE", "2")
    meshed = BatchAligner(AffineScoring.aligner_default(), batch_size=16,
                          use_mesh=True)
    got = meshed.align_pairs(refs, reads)
    monkeypatch.setenv("CLIQUE_TPU_WAVE", "1")
    plain = BatchAligner(AffineScoring.aligner_default(), batch_size=16,
                         use_mesh=False)
    want = plain.align_pairs(refs, reads)
    assert got == want
