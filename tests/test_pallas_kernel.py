"""Pallas fused DP kernel vs the XLA scan kernel, interpreter mode on CPU:
traceback bytes and corner scores must match exactly."""

import numpy as np
import pytest

from clique_tpu.align.batch import align_batch_device, scoring_to_params
from clique_tpu.align.pallas_kernel import pallas_fill
from clique_tpu.align.scoring import AffineScoring

RNG = np.random.default_rng(13)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


@pytest.mark.parametrize("scoring", [
    AffineScoring.aligner_default(),
    AffineScoring.default_dna(),
])
def test_pallas_fill_matches_xla(scoring):
    B, LR, LD = 8, 31, 45
    n1 = 128
    n2 = 128
    refs = np.zeros((B, n1 - 1), dtype=np.uint8)
    reads = np.zeros((B, n2 - 1), dtype=np.uint8)
    for i in range(B):
        refs[i, :LR] = RNG.choice(BASES, LR)
        reads[i, :LD] = RNG.choice(BASES, LD)
    ref_lens = np.full(B, LR, dtype=np.int32)
    read_lens = np.full(B, LD, dtype=np.int32)
    bw = np.maximum(ref_lens, read_lens)
    params = scoring_to_params(scoring)

    res, tb_xla = align_batch_device(
        refs, reads, ref_lens, read_lens, bw, params, n1=n1, n2=n2)
    tb_xla = np.asarray(tb_xla)

    # pallas wants refs pre-shifted: refs_p[:, x] = ref[x - 1]
    refs_p = np.zeros((B, n1), dtype=np.uint8)
    refs_p[:, 1:] = refs
    reads_p = np.zeros((B, n2 - 1), dtype=np.uint8)
    reads_p[:] = reads
    tb_pl, corner = pallas_fill(
        refs_p, reads_p, LR, LD, params, n1=n1, n2=n2, interpret=True)
    tb_pl = np.asarray(tb_pl)
    corner = np.asarray(corner)

    assert tb_pl.shape == tb_xla.shape
    mismatch = np.nonzero(tb_pl != tb_xla)
    assert tb_pl.dtype == tb_xla.dtype
    assert (tb_pl == tb_xla).all(), (
        f"first mismatches at {[m[:5] for m in mismatch]}")

    # corner scores must equal the XLA score after plane selection
    z = np.where(corner[:, 2] >= np.maximum(corner[:, 0], corner[:, 1]), 2,
                 np.where(corner[:, 1] >= corner[:, 0], 1, 0))
    score = corner[np.arange(B), z]
    np.testing.assert_array_equal(score, np.asarray(res.score))
