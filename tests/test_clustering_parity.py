"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/umis/sequence_clustering.rs.

Distance-function notes: the reference's `string_distance_no_break` is an
exact-byte mismatch count over zipped positions (our hamming_distance);
its graph/max_set_distance callers only ever see equal-length tags, where
our Levenshtein-based StringGraph.max_set_distance produces the same
values (Levenshtein <= Hamming, equal on these fixtures).
`string_distance_break` (early-exit variant) and `average_dist` are
test-only helpers in the reference with no product call sites; the
perf-smoke `test_graph_creation_comp` is covered by tests/test_graph.py.
"""

import pytest

from clique_tpu.collapse.graph import StringGraph
from clique_tpu.utils.seq import edit_distance, hamming_distance


def test_string_distance():
    """string_distance_test (sequence_clustering.rs:273-291)."""
    assert hamming_distance(b"AAAA", b"AAAT") == 1
    assert hamming_distance(b"AAAA", b"AAAA") == 0
    assert hamming_distance(b"TTTT", b"AAAA") == 4


def test_edit_distance_degenerate():
    """test_edit_distance (sequence_clustering.rs:324-335)."""
    assert edit_distance(b"ACGTA", b"ACGTA") == 0
    assert edit_distance(b"ACGTA", b"TCGTA") == 1
    assert edit_distance(b"ACGTA", b"aCGTA") == 0
    assert edit_distance(b"ACGTA", b"RCGTA") == 0


def test_string_distance_break_early_exit():
    """test_string_distance_break_early_exit (sequence_clustering.rs:
    351-358): the reference's early-exit variant returns 2 on a distance-4
    pair with max_dist=1 (it stops as soon as the limit is exceeded); the
    contract its callers rely on is only `distance > max_dist`, which our
    full count preserves."""
    d = hamming_distance(b"AAAA", b"TTTT")
    assert d > 1          # the predicate the reference callers test
    assert d == 4         # our full count (reference early-exit stops at 2)


def test_string_distance_break_within_limit():
    """test_string_distance_break_within_limit
    (sequence_clustering.rs:360-365): within the limit the early-exit and
    full counts agree exactly."""
    assert hamming_distance(b"ACGT", b"TCGT") == 1


def _average_dist(strings, dist):
    # average_dist (sequence_clustering.rs test helper): mean over ALL
    # ordered pairs including self-pairs
    n = len(strings)
    return sum(dist(a, b) for a in strings for b in strings) / (n * n)


def test_average_dist_identical():
    """test_average_dist_identical (sequence_clustering.rs:438-448):
    average_dist is a test-only helper in the reference (no product call
    sites); transcribed against our hamming_distance."""
    assert _average_dist([b"AA", b"AA"], hamming_distance) == 0.0


def test_average_dist_all_different():
    """test_average_dist_all_different (sequence_clustering.rs:450-461):
    AA=0, AT=1, TA=1, TT=0 => 2/4 = 0.5."""
    assert _average_dist([b"A", b"T"], hamming_distance) == 0.5


def test_string_distance_no_break_identical():
    """test_string_distance_no_break_identical (sequence_clustering.rs:338-342)."""
    assert hamming_distance(b"ACGT", b"ACGT") == 0


def test_string_distance_no_break_all_different():
    """test_string_distance_no_break_all_different
    (sequence_clustering.rs:345-349)."""
    assert hamming_distance(b"AAAA", b"TTTT") == 4


def test_string_distance_empty():
    """test_string_distance_empty (sequence_clustering.rs:367-371)."""
    assert hamming_distance(b"", b"") == 0


def test_string_distance_different_lengths_deviation():
    """test_string_distance_different_lengths (sequence_clustering.rs:374-379)
    relies on Rust's zip silently truncating to the shorter string (distance
    0 for AC vs ACG) — a latent length bug. We assert instead of truncating;
    this is a documented deviation."""
    with pytest.raises(AssertionError):
        hamming_distance(b"AC", b"ACG")


def test_max_set_distance_identical():
    """test_max_set_distance_identical (sequence_clustering.rs:382-388)."""
    g = StringGraph([b"ACGT", b"ACGT"], None, 4)
    assert g.max_set_distance([b"ACGT", b"ACGT"]) == 0


def test_max_set_distance_varied():
    """test_max_set_distance_varied (sequence_clustering.rs:391-398)."""
    members = [b"AAAA", b"TTTT", b"AAAT"]
    g = StringGraph(members, None, 4)
    assert g.max_set_distance(members) == 4  # AAAA vs TTTT


def test_max_set_distance_single():
    """test_max_set_distance_single (sequence_clustering.rs:401-404)."""
    g = StringGraph([b"AC"], None, 4)
    assert g.max_set_distance([b"AC"]) == 0


def test_get_connected_components_single_component():
    """test_get_connected_components_single_component
    (sequence_clustering.rs:407-421)."""
    g = StringGraph([b"AA", b"AT"], None, 1)
    components = g.connected_components()
    assert len(components) == 1
    assert len(components[0]) == 2


def test_get_connected_components_two_components():
    """test_get_connected_components_two_components
    (sequence_clustering.rs:424-437)."""
    g = StringGraph([b"AAAA", b"TTTT"], None, 1)
    components = g.connected_components()
    assert len(components) == 2
