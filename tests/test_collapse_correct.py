"""Tag-correction golden tests transcribed from the reference
(correct_tags.rs:520-638, known_list.rs tests) plus device-kernel checks."""

import numpy as np
import pytest

from clique_tpu.collapse.correct import (
    correct_degenerate,
    correct_known_hamming,
    correct_known_levenshtein,
)
from clique_tpu.collapse.distance import (
    candidate_pairs,
    edit_distance_pairs,
    hamming_hits,
)


def _lev_ref(a, b):
    # plain reference implementation for the kernel check
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), dtype=int)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return d[m, n]


def test_edit_distance_kernel_random():
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT-", dtype=np.uint8)
    pa, pb = [], []
    for _ in range(40):
        la = int(rng.integers(1, 20))
        lb = int(rng.integers(1, 20))
        pa.append(rng.choice(bases, la).tobytes())
        pb.append(rng.choice(bases, lb).tobytes())
    out = edit_distance_pairs(pa, pb)
    for a, b, d in zip(pa, pb, out):
        assert d == _lev_ref(a, b), (a, b, d, _lev_ref(a, b))


def test_hamming_hits_exact_byte_equality():
    allow = [b"AAAA", b"AAAT", b"CCCC", b"AA--"]
    tags = [b"AAAA", b"AA--", b"GGGG", b"AATT"]
    hits = hamming_hits(tags, allow, max_distance=1)
    assert hits[0] == [0, 1]          # AAAA: itself + AAAT
    assert 3 in hits[1] and 0 not in hits[1] or hits[1] == [3]  # AA-- matches AA-- exactly ('-'=='-')
    assert hits[2] == []
    assert hits[3] == [1]             # AATT ~ AAAT d=1... check below


def test_hamming_hits_distances():
    allow = [b"AAAA"]
    assert hamming_hits([b"AAAA"], allow, 0) == [[0]]
    assert hamming_hits([b"AAAT"], allow, 0) == [[]]
    assert hamming_hits([b"AAAT"], allow, 1) == [[0]]
    assert hamming_hits([b"AATT"], allow, 1) == [[]]


# --- correct_degenerate (correct_tags.rs:520-638) --------------------------

CFG = dict(max_distance=2, length=10, collapse_ratio=5.0)


def _counts(anchor_count):
    return {
        b"AAAAATTTTT": anchor_count,
        b"AAAAATTTGT": 1,
        b"GGGGGCCCCC": anchor_count,
        b"GCGGGCCCCC": 1,
    }


def test_degenerate_above_ratio_merges():
    out = correct_degenerate(_counts(10), **CFG)
    assert out[b"AAAAATTTTT"] == b"AAAAATTTTT"
    assert out[b"AAAAATTTGT"] == b"AAAAATTTTT"
    assert out[b"GGGGGCCCCC"] == b"GGGGGCCCCC"
    assert out[b"GCGGGCCCCC"] == b"GGGGGCCCCC"


def test_degenerate_below_ratio_keeps():
    out = correct_degenerate(_counts(3), **CFG)
    assert out[b"AAAAATTTGT"] == b"AAAAATTTGT"
    assert out[b"GCGGGCCCCC"] == b"GCGGGCCCCC"


def test_degenerate_gappy_variants_absorb():
    counts = _counts(10)
    counts[b"GGGGGCCCC-"] = 1
    counts[b"GGGGGCCCCA"] = 1
    counts[b"GGGGCCCCC-"] = 1
    out = correct_degenerate(counts, **CFG)
    # gap-stripped + padded keys
    assert out[b"GGGGGCCCC-"] == b"GGGGGCCCCC"
    assert out[b"GGGGGCCCCA"] == b"GGGGGCCCCC"
    assert out[b"GGGGCCCCC-"] == b"GGGGGCCCCC"


def test_degenerate_single_tag():
    out = correct_degenerate({b"AAAAATT": 3}, **CFG)
    # padded to length 10
    assert out == {b"AAAAATT---": b"AAAAATT---"}


def test_degenerate_transitive_absorption():
    # A(100) absorbs B(10); B absorbs C(1): C must resolve to A
    counts = {b"AAAAAAAAAA": 100, b"AAAAAAAATT": 10, b"AAAAAATTTT": 1}
    out = correct_degenerate(counts, **CFG)
    assert out[b"AAAAAAAATT"] == b"AAAAAAAAAA"
    # C is within d=2 of B but d=4 of A; absorbed into B, resolves to A
    assert out[b"AAAAAATTTT"] == b"AAAAAAAAAA"


# --- known lists ------------------------------------------------------------

def test_known_hamming_unique_and_ambiguous():
    allow = [b"AAAAAAAA", b"CCCCCCCC", b"TTTTAAAA"]
    counts = {b"AAAAAAAA": 5, b"AAAAAAAC": 2, b"GGGGGGGG": 1}
    out = correct_known_hamming(counts, allow, max_distance=1, length=8)
    assert out[b"AAAAAAAA"] == b"AAAAAAAA"
    # AAAAAAAC: d=1 to AAAAAAAA only -> unique hit accepted
    assert out[b"AAAAAAAC"] == b"AAAAAAAA"
    assert b"GGGGGGGG" not in out
    # ambiguity: equidistant to two allowlist entries -> dropped
    allow2 = [b"AAAAAAAA", b"AAAAAACC"]
    out2 = correct_known_hamming({b"AAAAAAAC": 1}, allow2,
                                 max_distance=1, length=8)
    assert out2 == {}


def test_known_hamming_ambiguous_dropped():
    allow = [b"AAAAAAAT", b"AAAAAAAG"]
    counts = {b"AAAAAAAA": 5}
    out = correct_known_hamming(counts, allow, max_distance=1, length=8)
    assert out == {}


def test_known_levenshtein_indel_match():
    allow = [b"ACGTACGTACGTACGT", b"TTTTTTTTTTTTTTTT"]
    # one deletion from allow[0], padded with '-'
    counts = {b"CGTACGTACGTACGT-": 3}
    out = correct_known_levenshtein(counts, allow, max_distance=2, length=16)
    assert out[b"CGTACGTACGTACGT-"] == b"ACGTACGTACGTACGT"


def test_known_levenshtein_unique_minimum():
    allow = [b"AAAAAAAA", b"AAAAAATT"]
    counts = {b"AAAAAAAT": 1}   # d=1 to both? A8 vs AAAAAAAT: d1; AAAAAATT: d1
    out = correct_known_levenshtein(counts, allow, max_distance=2, length=8)
    # two hits at equal minimal distance -> dropped
    assert b"AAAAAAAT" not in out


def test_candidate_pairs_superset():
    tags = [b"AAAAAAAAAA", b"AAAAAAAATT", b"GGGGGGGGGG", b"AAAAAAAAT-"]
    pairs = set(candidate_pairs(tags, 2))
    assert (0, 1) in pairs
    assert (0, 3) in pairs
    assert not any((2 in p) for p in pairs)
