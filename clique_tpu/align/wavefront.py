"""Wavefront alignment (WFA) kernels: O(ns) score-only alignment on device.

The reference ships WFA2-lib as its intended fast engine but never wires it
in (SURVEY 2.9: only .o artifacts remain, no FFI call sites). We implement
the wavefront algorithm (Marco-Sola et al.) natively for TPU:

- diagonals k = h - v (h = reference index, v = read index), offset = h;
- per score s, the furthest-reaching offsets advance by greedy match
  extension, then new wavefronts combine from s - x (mismatch),
  s - o - e (gap open), s - e (gap extend);
- the whole batch advances one score step per `lax.while_loop` iteration,
  each a [B, K] vector op - active lanes are the |k| <= s band, so total
  work is O(sum_b s_b * s_b) instead of the DP's O(B * n * m).

Edit-distance (`wfa_edit_batch`) and gap-affine (`wfa_affine_batch`)
penalties are provided; both are score-only (the collapse distance kernels
and HiFi verification paths need scores, not tracebacks - bit-compat
traceback stays with align/batch.py). Greedy extension advances one
character per inner iteration across all lanes, exiting as soon as no lane
can extend, so the inner loop runs ~(longest current run) times.

On WFA2-lib's remaining component set (SURVEY 2.9): the dual-affine
("convex") penalty model is wfa_affine2p_batch below; the adaptive
heuristics (wavefront_heuristic.o: band reduction, score cutoffs) are
deliberately NOT ported - they prune diagonals to save scalar work, but a
TPU batch advances all [B, K] lanes in fixed-shape vector ops, so masking
lanes saves nothing (the win here is the O(s^2) score bound itself plus
batching); and the bidirectional low-memory bialign variant targets
single gigabase-scale alignments, whereas amplicon batches bound s by
read length and fit comfortably in HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.int32(-(1 << 30))


def _extend(offsets, refs_i, reads_i, ks, l1, l2, valid):
    """Greedy match extension of furthest-reaching offsets: offsets [B, K]
    (h coordinates), diagonal values ks [K], per-element lengths l1/l2
    [B, 1]. Advances all extendable lanes one char per iteration."""
    B, K = offsets.shape
    n1 = refs_i.shape[1]
    n2 = reads_i.shape[1]

    def can_extend(off):
        h = off
        v = off - ks[None, :]
        ok = valid & (off > NEG) & (h < l1) & (v < l2) & (v >= 0) & (h >= 0)
        rh = jnp.take_along_axis(refs_i, jnp.clip(h, 0, n1 - 1), axis=1)
        rv = jnp.take_along_axis(reads_i, jnp.clip(v, 0, n2 - 1), axis=1)
        return ok & (rh == rv)

    def cond(state):
        off, any_ext = state
        return any_ext

    def body(state):
        off, _ = state
        ext = can_extend(off)
        off = jnp.where(ext, off + 1, off)
        return off, jnp.any(can_extend(off))

    off, _ = jax.lax.while_loop(cond, body,
                                (offsets, jnp.any(can_extend(offsets))))
    return off


@functools.partial(jax.jit, static_argnames=("n1", "n2", "smax"))
def wfa_edit_batch(refs, reads, ref_lens, read_lens, *, n1: int, n2: int,
                   smax: int):
    """Batched WFA edit distance. Returns [B] i32 (smax + 1 if censored)."""
    B = refs.shape[0]
    Kmax = n1 + n2  # |k| bound
    K = 2 * Kmax + 1
    ks = jnp.arange(K, dtype=jnp.int32) - Kmax

    refs_i = refs.astype(jnp.int32)
    reads_i = reads.astype(jnp.int32)
    l1 = ref_lens[:, None].astype(jnp.int32)
    l2 = read_lens[:, None].astype(jnp.int32)
    k_target = (l1 - l2)[:, 0]

    def diag_valid(s):
        return (jnp.abs(ks)[None, :] <= s) & \
            (ks[None, :] >= -l2) & (ks[None, :] <= l1)

    m0 = jnp.where((ks == 0)[None, :] & jnp.ones((B, 1), bool), 0, NEG)
    m0 = _extend(m0, refs_i, reads_i, ks, l1, l2, diag_valid(0))

    def done(m):
        tgt = jnp.take_along_axis(m, (k_target + Kmax)[:, None], axis=1)[:, 0]
        return tgt >= l1[:, 0]

    def cond(state):
        s, m, result = state
        return (s < smax) & jnp.logical_not(jnp.all(result >= 0))

    def body(state):
        s, m, result = state
        s1 = s + 1
        # M_{s+1}[k] = max(M_s[k] + 1, M_s[k-1] + 1, M_s[k+1])
        from_same = jnp.where(m > NEG, m + 1, NEG)
        shift_r = jnp.pad(m[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)
        from_del = jnp.where(shift_r > NEG, shift_r + 1, NEG)
        from_ins = jnp.pad(m[:, 1:], ((0, 0), (0, 1)), constant_values=NEG)
        new = jnp.maximum(from_same, jnp.maximum(from_del, from_ins))
        vld = diag_valid(s1)
        new = jnp.where(vld, new, NEG)
        # clamp to the rectangle
        v = new - ks[None, :]
        new = jnp.where((new <= l1) & (v <= l2), new, NEG)
        new = _extend(new, refs_i, reads_i, ks, l1, l2, vld)
        result = jnp.where((result < 0) & done(new), s1, result)
        return s1, new, result

    init_result = jnp.where(done(m0), 0, -1)
    s, m, result = jax.lax.while_loop(cond, body,
                                      (jnp.int32(0), m0, init_result))
    return jnp.where(result < 0, smax + 1, result)


@functools.partial(jax.jit,
                   static_argnames=("n1", "n2", "smax", "x", "o", "e"))
def wfa_affine_batch(refs, reads, ref_lens, read_lens, *, n1: int, n2: int,
                     smax: int, x: int = 4, o: int = 6, e: int = 2):
    """Batched gap-affine WFA: penalties mismatch=x, gap open=o, extend=e
    (match = 0). Returns the alignment penalty [B] i32 (smax+1 censored).

    Keeps a ring of the last `hist` wavefronts for the s-x / s-o-e / s-e
    lookbacks."""
    B = refs.shape[0]
    Kmax = n1 + n2
    K = 2 * Kmax + 1
    ks = jnp.arange(K, dtype=jnp.int32) - Kmax
    hist = max(x, o + e, e) + 1

    refs_i = refs.astype(jnp.int32)
    reads_i = reads.astype(jnp.int32)
    l1 = ref_lens[:, None].astype(jnp.int32)
    l2 = read_lens[:, None].astype(jnp.int32)
    k_target = (l1 - l2)[:, 0]

    def clamp(offs):
        v = offs - ks[None, :]
        return jnp.where((offs <= l1) & (v <= l2) & (v >= 0) &
                         (ks[None, :] >= -l2) & (ks[None, :] <= l1),
                         offs, NEG)

    def diag_valid(s):
        return (jnp.abs(ks)[None, :] <= s) & \
            (ks[None, :] >= -l2) & (ks[None, :] <= l1)

    neg_wf = jnp.full((B, K), NEG, jnp.int32)
    m0 = jnp.where((ks == 0)[None, :] & jnp.ones((B, 1), bool), 0, NEG)
    m0 = _extend(m0, refs_i, reads_i, ks, l1, l2, diag_valid(0))

    # ring buffers [hist, B, K] for M, I, D; index s % hist
    M = jnp.full((hist, B, K), NEG, jnp.int32).at[0].set(m0)
    I = jnp.full((hist, B, K), NEG, jnp.int32)
    D = jnp.full((hist, B, K), NEG, jnp.int32)

    def get(buf, s, back):
        idx = (s - back) % hist
        ok = s - back >= 0
        return jnp.where(ok, buf[idx], neg_wf)

    def done(m):
        tgt = jnp.take_along_axis(m, (k_target + Kmax)[:, None], axis=1)[:, 0]
        return tgt >= l1[:, 0]

    def cond(state):
        s, M, I, D, result = state
        return (s < smax) & jnp.logical_not(jnp.all(result >= 0))

    def body(state):
        s, M, I, D, result = state
        s1 = s + 1

        def sr(w):  # from diagonal k-1 (deletion direction, h+1)
            return jnp.pad(w[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)

        def sl(w):  # from diagonal k+1 (insertion direction)
            return jnp.pad(w[:, 1:], ((0, 0), (0, 1)), constant_values=NEG)

        m_oe = get(M, s1, o + e)
        i_e = get(I, s1, e)
        d_e = get(D, s1, e)
        m_x = get(M, s1, x)

        new_d = jnp.maximum(sr(m_oe), sr(d_e))
        new_d = jnp.where(new_d > NEG, new_d + 1, NEG)
        new_i = jnp.maximum(sl(m_oe), sl(i_e))
        mism = jnp.where(m_x > NEG, m_x + 1, NEG)
        new_m = jnp.maximum(mism, jnp.maximum(new_i, new_d))
        vld = diag_valid(s1)
        new_m = clamp(jnp.where(vld, new_m, NEG))
        new_i = clamp(jnp.where(vld, new_i, NEG))
        new_d = clamp(jnp.where(vld, new_d, NEG))
        new_m = _extend(new_m, refs_i, reads_i, ks, l1, l2, vld)

        idx = s1 % hist
        M = M.at[idx].set(new_m)
        I = I.at[idx].set(new_i)
        D = D.at[idx].set(new_d)
        result = jnp.where((result < 0) & done(new_m), s1, result)
        return s1, M, I, D, result

    init_result = jnp.where(done(m0), 0, -1)
    s, M, I, D, result = jax.lax.while_loop(
        cond, body, (jnp.int32(0), M, I, D, init_result))
    return jnp.where(result < 0, smax + 1, result)


@functools.partial(jax.jit,
                   static_argnames=("n1", "n2", "smax", "x", "o1", "e1",
                                    "o2", "e2"))
def wfa_affine2p_batch(refs, reads, ref_lens, read_lens, *, n1: int, n2: int,
                       smax: int, x: int = 4, o1: int = 6, e1: int = 2,
                       o2: int = 24, e2: int = 1):
    """Dual-affine ("convex" piecewise) WFA: gap cost is the minimum of two
    affine classes (o1 + k*e1, o2 + k*e2) - WFA2-lib's affine2p model
    (SURVEY 2.9), the practical convex-gap approximation. Returns the
    minimal penalty [B] i32 (smax + 1 censored)."""
    B = refs.shape[0]
    Kmax = n1 + n2
    K = 2 * Kmax + 1
    ks = jnp.arange(K, dtype=jnp.int32) - Kmax
    hist = max(x, o1 + e1, e1, o2 + e2, e2) + 1

    refs_i = refs.astype(jnp.int32)
    reads_i = reads.astype(jnp.int32)
    l1 = ref_lens[:, None].astype(jnp.int32)
    l2 = read_lens[:, None].astype(jnp.int32)
    k_target = (l1 - l2)[:, 0]

    def clamp(offs):
        v = offs - ks[None, :]
        return jnp.where((offs <= l1) & (v <= l2) & (v >= 0) &
                         (ks[None, :] >= -l2) & (ks[None, :] <= l1),
                         offs, NEG)

    def diag_valid(s):
        return (jnp.abs(ks)[None, :] <= s) & \
            (ks[None, :] >= -l2) & (ks[None, :] <= l1)

    neg_wf = jnp.full((B, K), NEG, jnp.int32)
    m0 = jnp.where((ks == 0)[None, :] & jnp.ones((B, 1), bool), 0, NEG)
    m0 = _extend(m0, refs_i, reads_i, ks, l1, l2, diag_valid(0))

    bufs = {name: jnp.full((hist, B, K), NEG, jnp.int32)
            for name in ("M", "I1", "D1", "I2", "D2")}
    bufs["M"] = bufs["M"].at[0].set(m0)

    def get(buf, s, back):
        ok = s - back >= 0
        return jnp.where(ok, buf[(s - back) % hist], neg_wf)

    def done(m):
        tgt = jnp.take_along_axis(m, (k_target + Kmax)[:, None], axis=1)[:, 0]
        return tgt >= l1[:, 0]

    def cond(state):
        s, M, I1, D1, I2, D2, result = state
        return (s < smax) & jnp.logical_not(jnp.all(result >= 0))

    def body(state):
        s, M, I1, D1, I2, D2, result = state
        s1 = s + 1

        def sr(w):
            return jnp.pad(w[:, :-1], ((0, 0), (1, 0)), constant_values=NEG)

        def sl(w):
            return jnp.pad(w[:, 1:], ((0, 0), (0, 1)), constant_values=NEG)

        vld = diag_valid(s1)
        new = {}
        for suffix, o, e in (("1", o1, e1), ("2", o2, e2)):
            m_oe = get(M, s1, o + e)
            i_e = get(I1 if suffix == "1" else I2, s1, e)
            d_e = get(D1 if suffix == "1" else D2, s1, e)
            nd = jnp.maximum(sr(m_oe), sr(d_e))
            new["D" + suffix] = clamp(jnp.where(
                vld, jnp.where(nd > NEG, nd + 1, NEG), NEG))
            new["I" + suffix] = clamp(jnp.where(
                vld, jnp.maximum(sl(m_oe), sl(i_e)), NEG))

        m_x = get(M, s1, x)
        mism = jnp.where(m_x > NEG, m_x + 1, NEG)
        nm = jnp.maximum(
            mism, jnp.maximum(jnp.maximum(new["I1"], new["D1"]),
                              jnp.maximum(new["I2"], new["D2"])))
        nm = clamp(jnp.where(vld, nm, NEG))
        nm = _extend(nm, refs_i, reads_i, ks, l1, l2, vld)

        idx = s1 % hist
        M = M.at[idx].set(nm)
        I1 = I1.at[idx].set(new["I1"])
        D1 = D1.at[idx].set(new["D1"])
        I2 = I2.at[idx].set(new["I2"])
        D2 = D2.at[idx].set(new["D2"])
        result = jnp.where((result < 0) & done(nm), s1, result)
        return s1, M, I1, D1, I2, D2, result

    init_result = jnp.where(done(m0), 0, -1)
    state = (jnp.int32(0), bufs["M"], bufs["I1"], bufs["D1"], bufs["I2"],
             bufs["D2"], init_result)
    s, M, I1, D1, I2, D2, result = jax.lax.while_loop(cond, body, state)
    return jnp.where(result < 0, smax + 1, result)


# --- host helpers ------------------------------------------------------------

def wfa_edit_distances(pairs_a, pairs_b, smax=None, pad_to: int = 64):
    """Host wrapper: exact edit distances via the wavefront kernel."""
    if not pairs_a:
        return np.zeros(0, dtype=np.int32)
    L = max(pad_to, max(max(len(a) for a in pairs_a),
                        max(len(b) for b in pairs_b)))
    P = len(pairs_a)
    Ppad = 32
    while Ppad < P:
        Ppad *= 2
    a = np.zeros((Ppad, L), dtype=np.uint8)
    b = np.zeros((Ppad, L), dtype=np.uint8)
    la = np.zeros(Ppad, dtype=np.int32)
    lb = np.zeros(Ppad, dtype=np.int32)
    for i, (s, t) in enumerate(zip(pairs_a, pairs_b)):
        a[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
        b[i, :len(t)] = np.frombuffer(t, dtype=np.uint8)
        la[i], lb[i] = len(s), len(t)
    if smax is None:
        smax = 2 * L
    return np.asarray(wfa_edit_batch(a, b, la, lb, n1=L, n2=L,
                                     smax=smax))[:P]
