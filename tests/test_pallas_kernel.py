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


@pytest.mark.parametrize("special_mode", ["both", "ref_n_only"])
def test_align_batch_device_use_pallas_varlen(special_mode):
    """The integrated pallas path must reproduce the XLA path exactly on a
    batch with per-element lengths and N/special bytes."""
    B, n1, n2 = 16, 128, 128
    refs = np.zeros((B, n1 - 1), dtype=np.uint8)
    reads = np.zeros((B, n2 - 1), dtype=np.uint8)
    ref_lens = np.zeros(B, dtype=np.int32)
    read_lens = np.zeros(B, dtype=np.int32)
    for i in range(B):
        lr = int(RNG.integers(20, n1 - 1))
        ld = int(RNG.integers(20, n2 - 1))
        refs[i, :lr] = RNG.choice(BASES, lr)
        reads[i, :ld] = RNG.choice(BASES, ld)
        # sprinkle special bytes on both sides
        for arr, ln in ((refs, lr), (reads, ld)):
            mask = RNG.random(ln) < 0.05
            arr[i, :ln][mask] = ord("N")
        ref_lens[i] = lr
        read_lens[i] = ld
    bw = np.maximum(ref_lens, np.maximum(read_lens, 1))
    params = scoring_to_params(AffineScoring.aligner_default())

    res_x, tb_x = align_batch_device(
        refs, reads, ref_lens, read_lens, bw, params, n1=n1, n2=n2,
        special_mode=special_mode)
    res_p, tb_p = align_batch_device(
        refs, reads, ref_lens, read_lens, bw, params, n1=n1, n2=n2,
        special_mode=special_mode, use_pallas=True)

    np.testing.assert_array_equal(np.asarray(tb_p), np.asarray(tb_x))
    np.testing.assert_array_equal(np.asarray(res_p.score),
                                  np.asarray(res_x.score))
    np.testing.assert_array_equal(np.asarray(res_p.start_z),
                                  np.asarray(res_x.start_z))
    np.testing.assert_array_equal(np.asarray(res_p.ops),
                                  np.asarray(res_x.ops))
    np.testing.assert_array_equal(np.asarray(res_p.n_ops),
                                  np.asarray(res_x.n_ops))
    np.testing.assert_array_equal(np.asarray(res_p.ops_packed),
                                  np.asarray(res_x.ops_packed))

    # the production path skips the debug traceback entirely
    res_n, tb_n = align_batch_device(
        refs, reads, ref_lens, read_lens, bw, params, n1=n1, n2=n2,
        special_mode=special_mode, use_pallas=True, return_traceback=False)
    assert tb_n is None
    np.testing.assert_array_equal(np.asarray(res_n.ops),
                                  np.asarray(res_x.ops))
    np.testing.assert_array_equal(np.asarray(res_n.score),
                                  np.asarray(res_x.score))
