"""Pair-HMM forward routing tests."""

import numpy as np
import pytest

from clique_tpu.align.hmm import HmmRouter, default_hmm_params, hmm_forward_batch

RNG = np.random.default_rng(9)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def rand_seq(n):
    return RNG.choice(BASES, size=n).tobytes()


def noisy(seq, sub=0.08, indel=0.03):
    out = bytearray()
    for b in seq:
        r = RNG.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(RNG.choice(BASES))
        out.append(RNG.choice(BASES) if RNG.random() < sub else b)
    return bytes(out)


def test_forward_ll_prefers_true_reference():
    refs = [rand_seq(80) for _ in range(4)]
    router = HmmRouter(refs)
    reads = [noisy(refs[i % 4]) for i in range(12)]
    routed = router.route(reads)
    for i, (ref_id, ll) in enumerate(routed):
        assert ref_id == i % 4, f"read {i} routed to {ref_id}"
        assert np.isfinite(ll)


def test_forward_ll_exact_read_scores_higher_than_noisy():
    ref = rand_seq(60)
    router = HmmRouter([ref])
    exact = router.route([ref])[0][1]
    noisy_ll = router.route([noisy(ref, sub=0.2)])[0][1]
    assert exact > noisy_ll


def test_forward_handles_wildcards():
    # digit wildcards emit uniformly: a read matching through the wildcard
    # block should score comparably to a fully matching read
    ref = b"ACGTACGTACGT" + b"0" * 10 + b"TTGGCCAATTGG"
    router = HmmRouter([ref])
    read = b"ACGTACGTACGT" + rand_seq(10) + b"TTGGCCAATTGG"
    ref_id, ll = router.route([read])[0]
    assert ref_id == 0
    assert np.isfinite(ll)


def test_candidates_restriction():
    refs = [rand_seq(50) for _ in range(3)]
    router = HmmRouter(refs)
    read = noisy(refs[0])
    # restricted to wrong candidates: must pick among them
    routed = router.route([read], candidates=[[1, 2]])
    assert routed[0][0] in (1, 2)
