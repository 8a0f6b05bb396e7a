"""WFA wavefront kernel tests: edit distances vs the DP kernel, affine
penalties vs a reference computation."""

import numpy as np
import pytest

from clique_tpu.align.wavefront import (
    wfa_affine_batch,
    wfa_edit_batch,
    wfa_edit_distances,
)

RNG = np.random.default_rng(11)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _lev(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), dtype=int)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return d[m, n]


def _affine_penalty(a, b, x, o, e):
    """Reference gap-affine minimal penalty (match 0, mismatch x, gap
    o + k*e) via plain 3-matrix DP."""
    INF = 1 << 28
    m, n = len(a), len(b)
    M = np.full((m + 1, n + 1), INF, dtype=int)
    I = np.full((m + 1, n + 1), INF, dtype=int)
    D = np.full((m + 1, n + 1), INF, dtype=int)
    M[0, 0] = 0
    for i in range(1, m + 1):
        D[i, 0] = o + i * e
    for j in range(1, n + 1):
        I[0, j] = o + j * e
    for i in range(m + 1):
        for j in range(n + 1):
            if i > 0:
                D[i, j] = min(D[i, j], min(M[i - 1, j], D[i - 1, j] - o) + o + e)
            if j > 0:
                I[i, j] = min(I[i, j], min(M[i, j - 1], I[i, j - 1] - o) + o + e)
            if i > 0 and j > 0:
                sub = 0 if a[i - 1] == b[j - 1] else x
                M[i, j] = min(M[i, j],
                              min(M[i - 1, j - 1], I[i - 1, j - 1],
                                  D[i - 1, j - 1]) + sub)
            M[i, j] = min(M[i, j], I[i, j], D[i, j])
    return min(M[m, n], I[m, n], D[m, n])


def mutate(seq, sub=0.05, indel=0.02):
    out = bytearray()
    for c in seq:
        r = RNG.random()
        if r < indel / 2:
            continue
        if r < indel:
            out.append(RNG.choice(BASES))
        out.append(RNG.choice(BASES) if RNG.random() < sub else c)
    return bytes(out)


def test_wfa_edit_random_pairs():
    pa, pb = [], []
    for _ in range(16):
        a = RNG.choice(BASES, int(RNG.integers(10, 60))).tobytes()
        pa.append(a)
        pb.append(mutate(a, sub=0.1, indel=0.06))
    out = wfa_edit_distances(pa, pb)
    for a, b, d in zip(pa, pb, out):
        assert d == _lev(a, b), (a, b, int(d), _lev(a, b))


def test_wfa_edit_identical_and_empty_ish():
    s = RNG.choice(BASES, 40).tobytes()
    assert wfa_edit_distances([s], [s])[0] == 0
    assert wfa_edit_distances([s], [s[:-3]])[0] == 3


def test_wfa_edit_censoring():
    a = b"A" * 30
    b = b"T" * 30
    out = wfa_edit_distances([a], [b], smax=5)
    assert out[0] == 6  # censored at smax + 1


def test_wfa_affine_random_pairs():
    L = 48
    x, o, e = 4, 6, 2
    pairs = []
    for _ in range(8):
        a = RNG.choice(BASES, L).tobytes()
        b = mutate(a, sub=0.08, indel=0.04)
        pairs.append((a, b))
    P = len(pairs)
    Lm = max(max(len(a), len(b)) for a, b in pairs)
    arr_a = np.zeros((8, Lm), dtype=np.uint8)
    arr_b = np.zeros((8, Lm), dtype=np.uint8)
    la = np.zeros(8, dtype=np.int32)
    lb = np.zeros(8, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        arr_a[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        arr_b[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        la[i], lb[i] = len(a), len(b)
    out = np.asarray(wfa_affine_batch(arr_a, arr_b, la, lb, n1=Lm, n2=Lm,
                                      smax=400, x=x, o=o, e=e))
    for i, (a, b) in enumerate(pairs):
        expect = _affine_penalty(a, b, x, o, e)
        assert out[i] == expect, (i, int(out[i]), expect)


def _affine2p_penalty(a, b, x, o1, e1, o2, e2):
    INF = 1 << 28
    m, n = len(a), len(b)
    M = np.full((m + 1, n + 1), INF, dtype=int)
    I1 = np.full((m + 1, n + 1), INF, dtype=int)
    D1 = np.full((m + 1, n + 1), INF, dtype=int)
    I2 = np.full((m + 1, n + 1), INF, dtype=int)
    D2 = np.full((m + 1, n + 1), INF, dtype=int)
    M[0, 0] = 0
    for i in range(m + 1):
        for j in range(n + 1):
            if i > 0:
                D1[i, j] = min(D1[i, j], min(M[i-1, j], D1[i-1, j] - o1) + o1 + e1)
                D2[i, j] = min(D2[i, j], min(M[i-1, j], D2[i-1, j] - o2) + o2 + e2)
            if j > 0:
                I1[i, j] = min(I1[i, j], min(M[i, j-1], I1[i, j-1] - o1) + o1 + e1)
                I2[i, j] = min(I2[i, j], min(M[i, j-1], I2[i, j-1] - o2) + o2 + e2)
            if i > 0 and j > 0:
                sub = 0 if a[i-1] == b[j-1] else x
                M[i, j] = min(M[i, j], min(M[i-1, j-1], I1[i-1, j-1],
                                           D1[i-1, j-1], I2[i-1, j-1],
                                           D2[i-1, j-1]) + sub)
            M[i, j] = min(M[i, j], I1[i, j], D1[i, j], I2[i, j], D2[i, j])
    return min(M[m, n], I1[m, n], D1[m, n], I2[m, n], D2[m, n])


def test_wfa_affine2p_long_gap_cheaper():
    from clique_tpu.align.wavefront import wfa_affine2p_batch

    L = 40
    x, o1, e1, o2, e2 = 4, 6, 2, 24, 1
    a = RNG.choice(BASES, L).tobytes()
    # one long deletion of 12bp: class-2 gap should win
    b = a[:10] + a[22:]
    arr_a = np.zeros((8, L), dtype=np.uint8)
    arr_b = np.zeros((8, L), dtype=np.uint8)
    la = np.zeros(8, dtype=np.int32)
    lb = np.zeros(8, dtype=np.int32)
    pairs = []
    for i in range(8):
        aa = RNG.choice(BASES, L).tobytes()
        bb = aa[:10] + aa[10 + int(RNG.integers(1, 14)):] if i % 2 else \
            mutate(aa, sub=0.1, indel=0.0)
        pairs.append((aa, bb))
        arr_a[i, :len(aa)] = np.frombuffer(aa, dtype=np.uint8)
        arr_b[i, :len(bb)] = np.frombuffer(bb, dtype=np.uint8)
        la[i], lb[i] = len(aa), len(bb)
    out = np.asarray(wfa_affine2p_batch(arr_a, arr_b, la, lb, n1=L, n2=L,
                                        smax=300, x=x, o1=o1, e1=e1,
                                        o2=o2, e2=e2))
    for i, (aa, bb) in enumerate(pairs):
        expect = _affine2p_penalty(aa, bb, x, o1, e1, o2, e2)
        assert out[i] == expect, (i, int(out[i]), expect)


# --- traceback ----------------------------------------------------------------

def test_wfa_traceback_random_pairs():
    """wfa_affine_tb_batch + backtrace + replay: the CIGAR must be a valid
    alignment whose affine penalty equals the kernel's returned penalty,
    which must equal the O(nm) golden (wavefront_backtrace.o /
    wavefront_pcigar.o parity, SURVEY 2.9)."""
    from clique_tpu.align.wavefront import (
        cigar_penalty,
        wfa_affine_align_pairs,
    )

    x, o, e = 4, 6, 2
    pairs = []
    for i in range(24):
        L = int(RNG.integers(8, 48))
        a = RNG.choice(BASES, L).tobytes()
        b = mutate(a, sub=0.08, indel=0.05)
        pairs.append((a, b))
    out = wfa_affine_align_pairs([p[0] for p in pairs],
                                 [p[1] for p in pairs], x=x, o=o, e=e)
    for (a, b), (pen, cig) in zip(pairs, out):
        expect = _affine_penalty(a, b, x, o, e)
        assert pen == expect, (a, b, pen, expect)
        assert cig is not None
        assert cigar_penalty(cig, a, b, x=x, o=o, e=e) == pen
        # cigar consumes both sequences exactly
        assert sum(n for n, op in cig if op in "MD") == len(a)
        assert sum(n for n, op in cig if op in "MI") == len(b)


def test_wfa_traceback_pure_match_and_single_ops():
    from clique_tpu.align.wavefront import wfa_affine_align_pairs

    a = b"ACGTACGTACGT"
    cases = [
        (a, a, []),                       # all matches
        (a, a[:4] + b"T" + a[5:], None),  # one substitution
        (a, a[:6] + a[8:], None),         # 2bp deletion in read
        (a[:6] + a[8:], a, None),         # 2bp insertion in read
    ]
    out = wfa_affine_align_pairs([c[0] for c in cases],
                                 [c[1] for c in cases])
    pen0, cig0 = out[0]
    assert pen0 == 0 and cig0 == [(len(a), "M")]
    pen1, cig1 = out[1]
    assert pen1 == 4 and cig1 == [(len(a), "M")]
    pen2, cig2 = out[2]
    assert pen2 == 6 + 2 * 2
    assert [(n, op) for n, op in cig2 if op != "M"] == [(2, "D")]
    pen3, cig3 = out[3]
    assert pen3 == 6 + 2 * 2
    assert [(n, op) for n, op in cig3 if op != "M"] == [(2, "I")]


def test_wfa_traceback_wildcards():
    """Capture wildcards (digits, N) extend as matches when wildcards=True
    (scoring_functions.rs:100-102 special-character approximation)."""
    from clique_tpu.align.wavefront import wfa_affine_align_pairs

    ref = b"ACGTACGT" + b"0" * 8 + b"TTGGCCAA"
    read = b"ACGTACGT" + b"GATCGATC" + b"TTGGCCAA"
    (pen, cig), = wfa_affine_align_pairs([ref], [read], wildcards=True)
    assert pen == 0
    assert cig == [(len(ref), "M")]
    # without wildcards the digit zone costs 8 mismatches
    (pen2, _cig2), = wfa_affine_align_pairs([ref], [read], wildcards=False)
    assert pen2 == 8 * 4


def test_wfa_traceback_censoring():
    from clique_tpu.align.wavefront import wfa_affine_align_pairs

    a = RNG.choice(BASES, 40).tobytes()
    b = RNG.choice(BASES, 40).tobytes()
    out = wfa_affine_align_pairs([a], [b], smax=6)
    pen, cig = out[0]
    assert pen == 7 and cig is None


# --- dual-affine ("convex") traceback ----------------------------------------

def test_wfa_affine2p_traceback_random_pairs():
    """wfa_affine2p_tb_batch + 5-state backtrace + replay: the CIGAR must
    be a valid alignment whose dual-affine penalty equals the kernel's
    returned penalty, which must equal the O(nm) 5-plane golden
    (wavefront_compute_affine2p.o parity, SURVEY 2.9)."""
    from clique_tpu.align.wavefront import (
        cigar_penalty_2p,
        wfa_affine2p_tb_batch,
        wfa_backtrace_ops_2p,
        wfa_replay_cigar,
    )

    x, o1, e1, o2, e2 = 4, 6, 2, 24, 1
    pairs = []
    for i in range(24):
        L = int(RNG.integers(8, 48))
        a = RNG.choice(BASES, L).tobytes()
        if i % 3 == 0 and L > 20:
            # long deletion: exercises the class-2 gap states
            cut = int(RNG.integers(8, L // 2))
            b = a[:5] + a[5 + cut:]
        else:
            b = mutate(a, sub=0.08, indel=0.05)
        pairs.append((a, b))
    Lm = max(max(len(a), len(b)) for a, b in pairs)
    B = 32
    arr_a = np.zeros((B, Lm), dtype=np.uint8)
    arr_b = np.zeros((B, Lm), dtype=np.uint8)
    la = np.zeros(B, dtype=np.int32)
    lb = np.zeros(B, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        arr_a[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        arr_b[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        la[i], lb[i] = len(a), len(b)
    pen, ops = wfa_affine2p_tb_batch(arr_a, arr_b, la, lb, n1=Lm, n2=Lm,
                                     smax=300, x=x, o1=o1, e1=e1, o2=o2,
                                     e2=e2)
    pen = np.asarray(pen)[:len(pairs)]
    skels = wfa_backtrace_ops_2p(np.asarray(ops)[:, :len(pairs)], pen,
                                 (la - lb)[:len(pairs)], x=x, o1=o1, e1=e1,
                                 o2=o2, e2=e2)
    for i, (a, b) in enumerate(pairs):
        expect = _affine2p_penalty(a, b, x, o1, e1, o2, e2)
        assert pen[i] == expect, (i, int(pen[i]), expect)
        cig = wfa_replay_cigar(a, b, skels[i])
        assert cigar_penalty_2p(cig, a, b, x=x, o1=o1, e1=e1, o2=o2,
                                e2=e2) == expect
        assert sum(n for n, op in cig if op in "MD") == len(a)
        assert sum(n for n, op in cig if op in "MI") == len(b)


def test_wfa_affine2p_golden_matches_test_dp():
    """Product golden (affine2p_penalty_golden) agrees with the
    independently-written test DP, wildcards included."""
    from clique_tpu.align.wavefront import affine2p_penalty_golden

    for _ in range(6):
        L = int(RNG.integers(8, 30))
        a = RNG.choice(BASES, L).tobytes()
        b = mutate(a, sub=0.1, indel=0.08)
        assert affine2p_penalty_golden(
            a, b, x=4, o1=6, e1=2, o2=24, e2=1) == \
            _affine2p_penalty(a, b, 4, 6, 2, 24, 1)
    ref = b"ACGT" + b"0" * 6 + b"TTGG"
    read = b"ACGT" + b"GATCGA" + b"TTGG"
    assert affine2p_penalty_golden(ref, read, x=4, o1=6, e1=2, o2=24,
                                   e2=1, wildcards=True) == 0


def test_wfa_score_only_wildcards_match_tb_kernel():
    """Regression for the score-only screen: wfa_affine_batch with
    wildcards=True must agree with the traceback kernel's penalties (the
    screen used to run the tb kernel just for wildcard support,
    allocating a dead op store per dispatch)."""
    from clique_tpu.align.wavefront import (
        wfa_affine_batch,
        wfa_affine_tb_batch,
    )

    L = 48
    B = 32
    arr_a = np.zeros((B, L), dtype=np.uint8)
    arr_b = np.zeros((B, L), dtype=np.uint8)
    la = np.zeros(B, dtype=np.int32)
    lb = np.zeros(B, dtype=np.int32)
    n = 12
    for i in range(n):
        a = bytearray(RNG.choice(BASES, L).tobytes())
        a[10:18] = b"01234567"  # capture wildcard zone
        b = mutate(bytes(a), sub=0.06, indel=0.04)[:L]
        arr_a[i, :len(a)] = np.frombuffer(bytes(a), dtype=np.uint8)
        arr_b[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        la[i], lb[i] = len(a), len(b)
    score_only = np.asarray(wfa_affine_batch(
        arr_a, arr_b, la, lb, n1=L, n2=L, smax=200, wildcards=True))
    with_tb = np.asarray(wfa_affine_tb_batch(
        arr_a, arr_b, la, lb, n1=L, n2=L, smax=200, wildcards=True)[0])
    assert (score_only[:n] == with_tb[:n]).all()


def test_wfa_aligner_convex_model():
    """WfaAligner(model='affine2p'): CIGARs satisfy the dual-affine
    penalty invariant and a long deletion stays one gap (class-2 slope)
    instead of fragmenting."""
    from clique_tpu.align.wavefront import WfaAligner, cigar_penalty_2p

    alin = WfaAligner(model="affine2p")
    refs, reads = [], []
    for i in range(6):
        L = 120
        a = RNG.choice(BASES, L).tobytes()
        if i % 2:
            b = a[:30] + a[78:]  # 48bp structural deletion
        else:
            b = mutate(a, sub=0.05, indel=0.02)
        refs.append(a)
        reads.append(b)
    out = alin.align_pairs(refs, reads)
    for a, b, r in zip(refs, reads, out):
        ra, da, cig, score = r
        pen = cigar_penalty_2p(cig, a, b, x=alin.x, o1=alin.o, e1=alin.e,
                               o2=alin.o2, e2=alin.e2, wildcards=True)
        assert pen == -score
        expect = _affine2p_penalty(a, b, alin.x, alin.o, alin.e,
                                   alin.o2, alin.e2)
        assert pen == expect
    # the 48bp deletion must be one D run (o2 + 48*e2 = 72 beats
    # o1 + 48*e1 = 102; either way a single run, penalty from class 2)
    _, _, cig1, score1 = out[1]
    dels = [(n, op) for n, op in cig1 if op == "D"]
    assert dels == [(48, "D")]
    assert -score1 == 24 + 48 * 1


def _linear_penalty(a, b, x, e):
    """Reference gap-linear minimal penalty (match 0, mismatch x, indel e
    per base, no open) via plain DP - the wavefront_compute_linear.o
    golden."""
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), dtype=int)
    d[:, 0] = np.arange(m + 1) * e
    d[0, :] = np.arange(n + 1) * e
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = 0 if a[i - 1] == b[j - 1] else x
            d[i, j] = min(d[i - 1, j] + e, d[i, j - 1] + e,
                          d[i - 1, j - 1] + sub)
    return d[m, n]


def test_wfa_linear_random_pairs():
    from clique_tpu.align.wavefront import wfa_linear_batch

    L = 48
    for x, e in ((4, 2), (3, 1), (2, 5)):
        refs, reads, la, lb, want = [], [], [], [], []
        for _ in range(12):
            a = RNG.choice(BASES, int(RNG.integers(12, L))).tobytes()
            b = mutate(a, sub=0.12, indel=0.08)[:L]
            refs.append(a)
            reads.append(b)
            want.append(_linear_penalty(a, b, x, e))
        B = len(refs)
        A = np.zeros((B, L), np.uint8)
        Bm = np.zeros((B, L), np.uint8)
        for i, (a, b) in enumerate(zip(refs, reads)):
            A[i, :len(a)] = np.frombuffer(a, np.uint8)
            Bm[i, :len(b)] = np.frombuffer(b, np.uint8)
        la = np.array([len(a) for a in refs], np.int32)
        lb = np.array([len(b) for b in reads], np.int32)
        got = np.asarray(wfa_linear_batch(A, Bm, la, lb, n1=L, n2=L,
                                          smax=256, x=x, e=e))
        assert got.tolist() == want, (x, e, got.tolist(), want)


def test_wfa_linear_censoring_and_identity():
    from clique_tpu.align.wavefront import wfa_linear_batch

    a = np.frombuffer(b"ACGTACGTACGT", np.uint8)[None, :].copy()
    la = np.array([12], np.int32)
    assert int(np.asarray(wfa_linear_batch(
        a, a, la, la, n1=12, n2=12, smax=16, x=4, e=2))[0]) == 0
    b = np.frombuffer(b"TGCATGCATGCA", np.uint8)[None, :].copy()
    out = wfa_linear_batch(a, b, la, la, n1=12, n2=12, smax=7, x=4, e=2)
    assert int(np.asarray(out)[0]) == 8  # censored at smax + 1


def test_exact_kband_preserves_scores():
    """The exact diagonal band (exact_kband) must not change any score:
    A/B the affine kernel against a build with the band widened to the
    old smax clamp via the kband argument."""
    from clique_tpu.align.wavefront import wfa_affine_batch

    L, x, o, e = 64, 4, 6, 2
    refs, reads = [], []
    for _ in range(16):
        a = RNG.choice(BASES, L).tobytes()
        refs.append(a)
        reads.append(mutate(a, sub=0.1, indel=0.08)[:L])
    A = np.zeros((len(refs), L), np.uint8)
    Bm = np.zeros((len(refs), L), np.uint8)
    for i, (a, b) in enumerate(zip(refs, reads)):
        A[i, :len(a)] = np.frombuffer(a, np.uint8)
        Bm[i, :len(b)] = np.frombuffer(b, np.uint8)
    la = np.array([len(a) for a in refs], np.int32)
    lb = np.array([len(b) for b in reads], np.int32)
    smax = 128
    banded = np.asarray(wfa_affine_batch(A, Bm, la, lb, n1=L, n2=L,
                                         smax=smax, x=x, o=o, e=e))
    wide = np.asarray(wfa_affine_batch(A, Bm, la, lb, n1=L, n2=L,
                                       smax=smax, x=x, o=o, e=e,
                                       kband=smax))
    assert banded.tolist() == wide.tolist()
    for a, b, got in zip(refs, reads, banded):
        if got <= smax:
            assert got == _affine_penalty(a, b, x, o, e)


def test_heuristic_kband_censors_then_aligner_recovers():
    """A too-narrow heuristic band censors wide-wandering pairs; the
    WfaAligner retries without the band and still returns the exact
    penalty (wavefront_heuristic.o semantics with honest escalation)."""
    from clique_tpu.align.wavefront import (
        WfaAligner,
        cigar_penalty,
        wfa_affine_batch,
    )

    a = (b"ACGT" * 10) + b"GGGGGGGGGGGGGGGGGGGG" + (b"TTCA" * 10)
    b = (b"ACGT" * 10) + (b"TTCA" * 10)      # 20bp deletion
    L = 128
    A = np.zeros((1, L), np.uint8)
    Bm = np.zeros((1, L), np.uint8)
    A[0, :len(a)] = np.frombuffer(a, np.uint8)
    Bm[0, :len(b)] = np.frombuffer(b, np.uint8)
    la = np.array([len(a)], np.int32)
    lb = np.array([len(b)], np.int32)
    narrow = np.asarray(wfa_affine_batch(
        A, Bm, la, lb, n1=L, n2=L, smax=96, x=4, o=6, e=2, kband=4))[0]
    assert narrow == 97  # |k_target| = 20 > band -> censored

    aligner = WfaAligner(kband=4, batch_size=8)
    (ra, da, cig, score), = aligner.align_pairs([a], [b])
    want = _affine_penalty(a, b, 4, 6, 2)
    assert -score == want
    assert cigar_penalty(cig, a, b, x=4, o=6, e=2) == want


# --- on-device backtrace walk -------------------------------------------------

def test_wfa_walk_device_matches_host_backtrace():
    """wfa_walk_device (the on-device reverse-scan walk that replaced
    pulling backtrace windows to the host walkers, VERDICT r3 item 6)
    must be decision-identical to wfa_backtrace_ops / _2p on both penalty
    models, including gap-heavy pairs, empty skeletons, and censored
    lanes (returned as None)."""
    from clique_tpu.align.wavefront import (
        wfa_affine2p_tb_batch,
        wfa_affine_tb_batch,
        wfa_backtrace_ops,
        wfa_backtrace_ops_2p,
        wfa_walk_device,
    )

    pairs = []
    for i in range(24):
        L = int(RNG.integers(8, 48))
        a = RNG.choice(BASES, L).tobytes()
        if i % 4 == 0 and L > 20:
            cut = int(RNG.integers(8, L // 2))
            b = a[:5] + a[5 + cut:]
        elif i % 4 == 1:
            b = a                      # perfect match: empty skeleton
        else:
            b = mutate(a, sub=0.10, indel=0.06)
        pairs.append((a, b))
    # one deliberately-censored lane: heavy divergence under a low smax
    pairs.append((b"A" * 40, b"C" * 40))
    Lm = max(max(len(a), len(b)) for a, b in pairs)
    B = 32
    arr_a = np.zeros((B, Lm), dtype=np.uint8)
    arr_b = np.zeros((B, Lm), dtype=np.uint8)
    la = np.zeros(B, dtype=np.int32)
    lb = np.zeros(B, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        arr_a[i, :len(a)] = np.frombuffer(a, dtype=np.uint8)
        arr_b[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        la[i], lb[i] = len(a), len(b)
    smax = 96
    n = len(pairs)

    x, o, e = 4, 6, 2
    pen, ops = wfa_affine_tb_batch(arr_a, arr_b, la, lb, n1=Lm, n2=Lm,
                                   smax=smax, x=x, o=o, e=e)
    pen_np = np.asarray(pen)
    host = wfa_backtrace_ops(np.asarray(ops)[:, :n], pen_np[:n],
                             (la - lb)[:n], x=x, o=o, e=e)
    dev_ops, fin = wfa_walk_device(ops, pen, la - lb, model="affine",
                                   x=x, o1=o, e1=e)
    dev_np, fin_np = np.asarray(dev_ops), np.asarray(fin)
    censored = 0
    for i in range(n):
        if host[i] is None:
            assert fin_np[i] == -2
            censored += 1
            continue
        assert fin_np[i] == -1, (i, fin_np[i])
        row = dev_np[i]
        assert [chr(c) for c in row[row != 0]] == host[i], i
    assert censored >= 1

    x, o1, e1, o2, e2 = 4, 6, 2, 24, 1
    pen, ops = wfa_affine2p_tb_batch(arr_a, arr_b, la, lb, n1=Lm, n2=Lm,
                                     smax=smax, x=x, o1=o1, e1=e1, o2=o2,
                                     e2=e2)
    pen_np = np.asarray(pen)
    host = wfa_backtrace_ops_2p(np.asarray(ops)[:, :n], pen_np[:n],
                                (la - lb)[:n], x=x, o1=o1, e1=e1, o2=o2,
                                e2=e2)
    dev_ops, fin = wfa_walk_device(ops, pen, la - lb, model="affine2p",
                                   x=x, o1=o1, e1=e1, o2=o2, e2=e2)
    dev_np, fin_np = np.asarray(dev_ops), np.asarray(fin)
    for i in range(n):
        if host[i] is None:
            assert fin_np[i] == -2
            continue
        assert fin_np[i] == -1, (i, fin_np[i])
        row = dev_np[i]
        assert [chr(c) for c in row[row != 0]] == host[i], i
