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
