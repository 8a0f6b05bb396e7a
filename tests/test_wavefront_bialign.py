"""Bialign (O(s)-memory WFA traceback) tests — WFA2-lib's
wavefront_bialign.o equivalent (SURVEY 2.9).

The midpoint kernel (wfa_affine_mid_batch) must report the exact optimal
penalty (same contract as wfa_affine_batch) plus an on-path split cell,
and the recursive driver (wfa_bialign_affine_pairs) must return CIGARs
whose replayed penalty equals that optimum — checked against the O(nm)
golden DP (affine_penalty_golden) and the direct traceback engine.
"""

import numpy as np
import pytest

from clique_tpu.align.wavefront import (
    _MID_ENC,
    affine_penalty_golden,
    cigar_penalty,
    wfa_affine_align_pairs,
    wfa_affine_mid_batch,
    wfa_bialign_affine_pairs,
)

X, O, E = 4, 6, 2


def _mutate(rng, seq: bytes, sub_p=0.05, ind_p=0.02) -> bytes:
    bases = b"ACGT"
    out = bytearray()
    for c in seq:
        r = rng.random()
        if r < ind_p / 2:
            continue                       # deletion
        if r < ind_p:
            out.append(bases[rng.integers(4)])   # insertion
        if rng.random() < sub_p:
            out.append(bases[rng.integers(4)])
        else:
            out.append(c)
    return bytes(out)


def _rand(rng, n: int) -> bytes:
    return bytes(bytes(b"ACGT")[i] for i in rng.integers(0, 4, n))


def _run_mid(a: bytes, b: bytes, smax: int = 256):
    L = max(64, len(a), len(b))
    av = np.zeros((32, L), np.uint8)
    bv = np.zeros((32, L), np.uint8)
    la = np.zeros(32, np.int32)
    lb = np.zeros(32, np.int32)
    av[0, :len(a)] = np.frombuffer(a, np.uint8)
    bv[0, :len(b)] = np.frombuffer(b, np.uint8)
    la[0], lb[0] = len(a), len(b)
    pen, pay = wfa_affine_mid_batch(av, bv, la, lb, n1=L, n2=L, smax=smax,
                                    x=X, o=O, e=E)
    return int(np.asarray(pen)[0]), int(np.asarray(pay)[0])


def test_mid_kernel_penalty_matches_golden():
    rng = np.random.default_rng(7)
    for trial in range(12):
        a = _rand(rng, int(rng.integers(20, 200)))
        b = _mutate(rng, a)
        pen, pay = _run_mid(a, b)
        assert pen == affine_penalty_golden(a, b, x=X, o=O, e=E)
        assert pay >= 0


def test_mid_kernel_split_is_on_an_optimal_path():
    """Splitting at the reported cell and summing the halves' optimal
    penalties must reproduce the pair's optimum (the defining property
    of a correct breakpoint)."""
    rng = np.random.default_rng(11)
    for trial in range(10):
        a = _rand(rng, int(rng.integers(30, 160)))
        b = _mutate(rng, a, sub_p=0.1, ind_p=0.05)
        pen, pay = _run_mid(a, b, smax=512)
        h, v = pay // _MID_ENC, pay % _MID_ENC
        assert 0 <= h <= len(a) and 0 <= v <= len(b)
        # split cell is at/before the middle anti-diagonal
        assert h + v <= (len(a) + len(b)) // 2
        left = affine_penalty_golden(a[:h], b[:v], x=X, o=O, e=E)
        right = affine_penalty_golden(a[h:], b[v:], x=X, o=O, e=E)
        assert left + right == pen


def test_mid_kernel_identical_pair():
    a = b"ACGTACGTACGTACGT" * 4
    pen, pay = _run_mid(a, a)
    assert pen == 0
    h, v = pay // _MID_ENC, pay % _MID_ENC
    assert h == v == len(a) // 2


def test_bialign_random_pairs_match_golden():
    rng = np.random.default_rng(23)
    pairs_a, pairs_b = [], []
    for trial in range(16):
        a = _rand(rng, int(rng.integers(10, 300)))
        b = _mutate(rng, a, sub_p=0.08, ind_p=0.04)
        pairs_a.append(a)
        pairs_b.append(b)
    out = wfa_bialign_affine_pairs(pairs_a, pairs_b, x=X, o=O, e=E, leaf=48)
    for a, b, (pen, cig) in zip(pairs_a, pairs_b, out):
        assert pen == affine_penalty_golden(a, b, x=X, o=O, e=E)
        assert cigar_penalty(cig, a, b, x=X, o=O, e=E) == pen
        assert sum(n for n, op in cig if op in "MD") == len(a)
        assert sum(n for n, op in cig if op in "MI") == len(b)
        # runs are merged: no two adjacent ops equal
        assert all(cig[i][1] != cig[i + 1][1] for i in range(len(cig) - 1))


def test_bialign_agrees_with_direct_engine():
    rng = np.random.default_rng(31)
    pairs_a, pairs_b = [], []
    for trial in range(8):
        a = _rand(rng, int(rng.integers(100, 400)))
        b = _mutate(rng, a)
        pairs_a.append(a)
        pairs_b.append(b)
    lo = wfa_bialign_affine_pairs(pairs_a, pairs_b, x=X, o=O, e=E, leaf=64)
    hi = wfa_affine_align_pairs(pairs_a, pairs_b, x=X, o=O, e=E)
    for (pl, cl), (ph, ch) in zip(lo, hi):
        assert pl == ph
        # both CIGARs are optimal; penalties must agree even if the
        # co-optimal op runs differ
        assert cl is not None and ch is not None


def test_bialign_edge_cases():
    out = wfa_bialign_affine_pairs(
        [b"", b"ACGT", b"", b"A"],
        [b"ACGT", b"", b"", b"A"], x=X, o=O, e=E)
    assert out[0] == (O + 4 * E, [(4, "I")])
    assert out[1] == (O + 4 * E, [(4, "D")])
    assert out[2] == (0, [])
    assert out[3] == (0, [(1, "M")])


def test_bialign_long_center_gap():
    """A structural deletion longer than `leaf` forces the degenerate-
    split fallback on some segment; the result must stay optimal."""
    rng = np.random.default_rng(47)
    flank1 = _rand(rng, 80)
    flank2 = _rand(rng, 80)
    gap = _rand(rng, 120)
    a = flank1 + gap + flank2
    b = flank1 + flank2
    out = wfa_bialign_affine_pairs([a], [b], x=X, o=O, e=E, leaf=64)
    pen, cig = out[0]
    assert pen == affine_penalty_golden(a, b, x=X, o=O, e=E)
    assert cigar_penalty(cig, a, b, x=X, o=O, e=E) == pen


def test_bialign_deep_recursion_small_leaf():
    """leaf far below the pair length exercises several split levels."""
    rng = np.random.default_rng(53)
    a = _rand(rng, 500)
    b = _mutate(rng, a, sub_p=0.06, ind_p=0.03)
    out = wfa_bialign_affine_pairs([a], [b], x=X, o=O, e=E, leaf=32)
    pen, cig = out[0]
    assert pen == affine_penalty_golden(a, b, x=X, o=O, e=E)
    assert cigar_penalty(cig, a, b, x=X, o=O, e=E) == pen


def test_engine_routes_over_budget_pairs_to_bialign(monkeypatch):
    """A WfaAligner without a DP fallback must finish pairs whose op
    store would blow CLIQUE_WFA_MEM_BUDGET via the bialign engine, with
    penalties identical to the unconstrained run."""
    from clique_tpu.align.wavefront import WfaAligner

    rng = np.random.default_rng(61)
    refs, reads = [], []
    for _ in range(4):
        a = _rand(rng, 1500)
        # heavy divergence + a structural deletion: a high penalty bound
        b = _mutate(rng, a[:600] + a[1000:], sub_p=0.15, ind_p=0.05)
        refs.append(a)
        reads.append(b)
    free = WfaAligner(model="affine", wildcards=False)
    got_free = free.align_pairs(refs, reads)
    monkeypatch.setenv("CLIQUE_WFA_MEM_BUDGET", str(1 << 20))  # 1MB
    tight = WfaAligner(model="affine", wildcards=False)
    got_tight = tight.align_pairs(refs, reads)
    for a, b, (_, _, cig_f, sc_f), (ra, da, cig_t, sc_t) in zip(
            refs, reads, got_free, got_tight):
        assert sc_t == sc_f
        assert cigar_penalty(cig_t, a, b, x=4, o=6, e=2) == -sc_t
        assert len(ra) == len(da)


def test_bialign_wildcards():
    a = b"ACGT" + b"0" * 8 + b"TTTTGGGG"
    b = b"ACGT" + b"CCAACCAA" + b"TTTTGGGG"
    out = wfa_bialign_affine_pairs([a], [b], x=X, o=O, e=E,
                                   wildcards=True, leaf=8)
    pen, cig = out[0]
    assert pen == 0
    assert cigar_penalty(cig, a, b, x=X, o=O, e=E, wildcards=True) == 0
