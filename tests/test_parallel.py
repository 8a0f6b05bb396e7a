"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_sharded_align_step_matches_single_device():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    from clique_tpu.align.batch import align_batch_device, scoring_to_params
    from clique_tpu.align.scoring import AffineScoring
    from clique_tpu.parallel.mesh import make_mesh, sharded_align_step

    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    B, LR, LD = 16, 24, 32
    refs = rng.choice(bases, size=(B, LR)).astype(np.uint8)
    reads = rng.choice(bases, size=(B, LD)).astype(np.uint8)
    ref_lens = np.full(B, LR, dtype=np.int32)
    read_lens = np.full(B, LD, dtype=np.int32)
    params = scoring_to_params(AffineScoring.aligner_default())

    mesh = make_mesh(8)
    scores, ops, n_ops = sharded_align_step(
        mesh, refs, reads, ref_lens, read_lens, params,
        n1=LR + 1, n2=LD + 1)

    bw = np.maximum(ref_lens, read_lens)
    single, _ = align_batch_device(
        refs, reads, ref_lens, read_lens, bw, params, n1=LR + 1, n2=LD + 1)

    np.testing.assert_array_equal(np.asarray(scores), np.asarray(single.score))
    np.testing.assert_array_equal(np.asarray(n_ops), np.asarray(single.n_ops))
    np.testing.assert_array_equal(np.asarray(ops), np.asarray(single.ops))


def test_graft_entry_single_chip():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == args[0].shape[0]


def test_graft_dryrun_multichip():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_length_sharded_align_matches_single_device():
    """SURVEY 2.11 P6: one long alignment with the reference-lane axis
    sharded over the mesh (halo-exchange wavefront) must equal the
    single-device fill exactly."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    from clique_tpu.align.batch import align_batch_device, scoring_to_params
    from clique_tpu.align.scoring import AffineScoring
    from clique_tpu.parallel.mesh import length_sharded_align, make_mesh

    rng = np.random.default_rng(12)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    B, LR, LD = 2, 512, 480   # LR divisible by 8 devices
    refs = rng.choice(bases, size=(B, LR)).astype(np.uint8)
    reads = np.empty((B, LD), dtype=np.uint8)
    for b in range(B):   # reads = mutated ref prefixes (realistic hit)
        r = refs[b, :LD].copy()
        subs = rng.random(LD) < 0.05
        r[subs] = rng.choice(bases, int(subs.sum()))
        reads[b] = r
    ref_lens = np.full(B, LR, dtype=np.int32)
    read_lens = np.full(B, LD, dtype=np.int32)
    params = scoring_to_params(AffineScoring.aligner_default())

    mesh = make_mesh(8)
    scores, ops, n_ops = length_sharded_align(
        mesh, refs, reads, ref_lens, read_lens, params,
        n1=LR + 1, n2=LD + 1)

    bw = np.maximum(ref_lens, read_lens)
    single, _ = align_batch_device(
        refs, reads, ref_lens, read_lens, bw, params, n1=LR + 1, n2=LD + 1)
    np.testing.assert_array_equal(np.asarray(scores),
                                  np.asarray(single.score))
    np.testing.assert_array_equal(np.asarray(n_ops),
                                  np.asarray(single.n_ops))
    np.testing.assert_array_equal(np.asarray(ops), np.asarray(single.ops))
