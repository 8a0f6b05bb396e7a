"""Pigeonhole candidate generation: the vectorized packed-key build must
produce exactly the dict build's pair set, and must stay a complete
superset of all truly-close pairs (the pigeonhole guarantee)."""

from collections import defaultdict

import numpy as np
import pytest

from clique_tpu.collapse.distance import (
    _candidate_pairs_np,
    candidate_pairs,
    edit_distance_rows,
)

RNG = np.random.default_rng(5)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _dict_build(tags, d):
    """The python bucket build (kept as the specification). Shifts are
    bounded by floor(d/2) as in _candidate_pairs_np: these tags are all
    equal length, so Levenshtein <= d pairs every insertion with a
    deletion and the alignment offset never exceeds floor(d/2) (the
    completeness tests below independently verify no close pair is
    missed)."""
    n_pieces = d + 1
    buckets = defaultdict(list)
    for idx, t in enumerate(tags):
        L = len(t)
        bounds = [round(i * L / n_pieces) for i in range(n_pieces + 1)]
        for p in range(n_pieces):
            lo, hi = bounds[p], bounds[p + 1]
            for sh in range(-(d // 2), d // 2 + 1):
                s, e = lo + sh, hi + sh
                if s < 0 or e > L:
                    continue
                buckets[(p, sh, t[s:e])].append(idx)
    pairs = set()
    for (p, sh, _pc), mem in buckets.items():
        if sh:
            continue
        for i in mem:
            pairs.update((min(i, j), max(i, j)) for j in mem if j != i)
    unsh = defaultdict(list)
    for (p, sh, pc), mem in buckets.items():
        if sh == 0:
            unsh[(p, pc)].extend(mem)
    for (p, sh, pc), mem in buckets.items():
        if sh == 0:
            continue
        base = unsh.get((p, pc))
        if not base:
            continue
        for i in mem:
            pairs.update((min(i, j), max(i, j)) for j in base if j != i)
    return sorted(pairs)


def _mutated_tags(n, L, d):
    base = [RNG.choice(BASES, L).tobytes() for _ in range(max(2, n // 4))]
    tags = list(base)
    while len(tags) < n:
        t = bytearray(base[int(RNG.integers(len(base)))])
        for _ in range(int(RNG.integers(0, d + 1))):
            t[int(RNG.integers(L))] = int(RNG.choice(BASES))
        tags.append(bytes(t))
    return tags


@pytest.mark.parametrize("L,d", [(8, 1), (12, 2), (16, 2), (26, 3), (30, 3)])
def test_np_build_matches_dict_build(L, d):
    # L=26/30 with d=3 gives pieces wider than 8 bytes -> unique fallback
    for _ in range(6):
        tags = _mutated_tags(int(RNG.integers(2, 120)), L, d)
        arr = _candidate_pairs_np(tags, d)
        got = list(zip(arr[:, 0].tolist(), arr[:, 1].tolist()))
        assert got == _dict_build(tags, d)


def test_completeness_all_close_pairs_present():
    import itertools

    tags = _mutated_tags(120, 16, 2)
    got = set(candidate_pairs(tags, 2))
    pairs = list(itertools.combinations(range(len(tags)), 2))
    a = [tags[i] for i, _ in pairs]
    b = [tags[j] for _, j in pairs]
    A = np.frombuffer(b"".join(a), np.uint8).reshape(len(pairs), 16)
    B = np.frombuffer(b"".join(b), np.uint8).reshape(len(pairs), 16)
    ln = np.full(len(pairs), 16, np.int32)
    dists = edit_distance_rows(np.pad(A, ((0, 0), (0, 16))),
                               np.pad(B, ((0, 0), (0, 16))), ln, ln)
    for (i, j), dd in zip(pairs, dists):
        if dd <= 2:
            assert (i, j) in got, (i, j, dd)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[-1]


@pytest.mark.parametrize("L,d", [(10, 1), (12, 2), (15, 3), (9, 4)])
def test_bounded_shifts_complete_brute_force(L, d):
    """The floor(d/2) shift bound must not lose any equal-length pair at
    Levenshtein <= d (checked against a plain DP, incl. odd d where the
    bound is strictly tighter than d)."""
    import itertools

    rng = np.random.default_rng(11 * L + d)
    base = [rng.choice(BASES, L).tobytes() for _ in range(12)]
    tags = set(base)
    for t in base:
        for _ in range(5):
            x = bytearray(t)
            for _ in range(int(rng.integers(1, d + 1))):
                op = rng.random()
                p = int(rng.integers(len(x)))
                if op < 0.5:
                    x[p] = int(rng.choice(BASES))
                elif op < 0.75 and len(x) > 1:
                    del x[p]
                else:
                    x.insert(p, int(rng.choice(BASES)))
            if len(x) == L:
                tags.add(bytes(x))
    tags = sorted(tags)
    cand = {tuple(p) for p in _candidate_pairs_np(tags, d).tolist()}
    for i, j in itertools.combinations(range(len(tags)), 2):
        if _lev(tags[i], tags[j]) <= d:
            assert (i, j) in cand, (tags[i], tags[j])


def test_edit_distance_rows_mixed_lengths():
    a = np.zeros((3, 32), np.uint8)
    b = np.zeros((3, 32), np.uint8)
    a[0, :4] = np.frombuffer(b"ACGT", np.uint8)
    b[0, :4] = np.frombuffer(b"AGGT", np.uint8)       # 1 sub
    a[1, :6] = np.frombuffer(b"ACGTAC", np.uint8)
    b[1, :5] = np.frombuffer(b"ACGTA", np.uint8)      # 1 del
    a[2, :3] = np.frombuffer(b"AAA", np.uint8)
    b[2, :3] = np.frombuffer(b"TTT", np.uint8)        # 3 subs
    la = np.array([4, 6, 3], np.int32)
    lb = np.array([4, 5, 3], np.int32)
    assert edit_distance_rows(a, b, la, lb).tolist() == [1, 1, 3]


def _edit_dp(a: bytes, b: bytes) -> int:
    """Scalar Levenshtein specification (exact-byte, unit costs)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_myers_host_matches_dp_random():
    """The host bit-parallel Myers kernel must equal the scalar DP on
    random byte rows with mixed lengths (including empty and 64-long
    patterns - the uint64 boundary)."""
    from clique_tpu.collapse.distance import _edit_distance_myers_host

    rng = np.random.default_rng(11)
    P = 300
    la = rng.integers(0, 65, P)
    lb = rng.integers(0, 60, P)
    la[:3] = [0, 64, 64]
    lb[:3] = [5, 0, 64]
    a = np.zeros((P, 64), np.uint8)
    b = np.zeros((P, 64), np.uint8)
    for i in range(P):
        a[i, :la[i]] = rng.choice(BASES, la[i])
        b[i, :lb[i]] = rng.choice(BASES, lb[i])
    got = _edit_distance_myers_host(a, b, la, lb)
    for i in range(P):
        want = _edit_dp(a[i, :la[i]].tobytes(), b[i, :lb[i]].tobytes())
        assert got[i] == min(want, 255), (i, la[i], lb[i])


def test_myers_host_matches_device_kernel():
    """Routing equivalence: the host path and the jax kernel agree on the
    exact padded-row inputs the degenerate level sends."""
    import os

    from clique_tpu.collapse.distance import _edit_distance_kernel

    rng = np.random.default_rng(12)
    P, L = 64, 18
    a = rng.choice(BASES, (P, L)).astype(np.uint8)
    b = rng.choice(BASES, (P, L)).astype(np.uint8)
    la = np.full(P, L, np.int32)
    host = edit_distance_rows(a, b, la, la)          # routes to Myers
    apad = np.pad(a, ((0, 256 - P), (0, 0)))
    bpad = np.pad(b, ((0, 256 - P), (0, 0)))
    lpad = np.pad(la, (0, 256 - P))
    dev = np.asarray(_edit_distance_kernel(apad, bpad, lpad, lpad,
                                           L1=L, L2=L))[:P]
    assert host.tolist() == dev.tolist()


@pytest.mark.parametrize("L,d", [(12, 2), (16, 2), (16, 1)])
def test_count_restricted_superset_and_identical_corrections(L, d):
    """The count-aware join (counts/ratio) must (a) contain every pair
    that can pass ratio absorption, and (b) leave the end-to-end
    degenerate correction maps identical to the all-pairs build."""
    from clique_tpu.collapse.correct import correct_degenerate_groups

    rng = np.random.default_rng(7 * L + d)
    for trial in range(4):
        # realistic skew: a few high-count centers + a count-1 error halo
        centers = [rng.choice(BASES, L).tobytes() for _ in range(6)]
        counts = {}
        for c in centers:
            counts[c] = int(rng.integers(20, 60))
            for _ in range(30):
                x = bytearray(c)
                for _ in range(int(rng.integers(1, d + 1))):
                    x[int(rng.integers(L))] = int(rng.choice(BASES))
                t = bytes(x)
                if t not in counts:
                    counts[t] = int(rng.integers(1, 3))
        tags = sorted(counts)
        cnt = np.array([counts[t] for t in tags], np.int64)
        ratio = 5.0
        full = _candidate_pairs_np(tags, d)
        restricted = _candidate_pairs_np(tags, d, counts=cnt, ratio=ratio)
        enc = lambda p: {(min(a, b), max(a, b)) for a, b in p.tolist()
                         if a != b}
        full_set, restr_set = enc(full), enc(restricted)
        # (a) superset of qualifying pairs
        for i, j in full_set:
            ci, cj = cnt[i], cnt[j]
            if ci != cj and max(ci, cj) >= ratio * min(ci, cj):
                assert (i, j) in restr_set, (tags[i], tags[j], ci, cj)
        assert restr_set <= full_set
        # (b) identical correction maps through the group path (which
        # uses the restricted join for >4096 and H x ALL below that)
        # vs the brute-force all-pairs single-group path
        from clique_tpu.collapse.correct import correct_degenerate

        got = correct_degenerate_groups([counts], d, L, ratio)[0]
        want = correct_degenerate(counts, d, L, ratio)
        assert got == want
