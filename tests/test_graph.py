"""String-graph / clique / SymSpell aux-component tests (umis/
bronkerbosch.rs, umis/sequence_clustering.rs, sequence_lookup.rs)."""

import pytest

from clique_tpu.collapse.graph import BronKerbosch, KnownLookup, StringGraph


def test_bron_kerbosch_triangle_plus_edge():
    # triangle {1,2,3} plus pendant edge 3-4
    adj = {1: {2, 3}, 2: {1, 3}, 3: {1, 2, 4}, 4: {3}}
    cliques = BronKerbosch(adj).compute()
    as_sets = {frozenset(c) for c in cliques}
    assert frozenset({1, 2, 3}) in as_sets
    assert frozenset({3, 4}) in as_sets


def test_string_graph_components():
    strings = [b"AAAAAAAA", b"AAAAAAAT", b"AAAAAATT",
               b"GGGGGGGG", b"GGGGGGGC"]
    g = StringGraph(strings, None, max_distance=1)
    comps = sorted(g.connected_components(), key=len, reverse=True)
    assert len(comps) == 2
    assert set(comps[0]) == {b"AAAAAAAA", b"AAAAAAAT", b"AAAAAATT"}
    assert set(comps[1]) == {b"GGGGGGGG", b"GGGGGGGC"}


def test_string_graph_split_subgroup():
    # two tight clusters bridged by a single edge through a middle node
    left = [b"AAAAAAAA", b"AAAAAAAT"]
    right = [b"AATTTTTT", b"AATTTTTA"]
    bridge = [b"AAAATTTT"]
    g = StringGraph(left + bridge + right, None, max_distance=4)
    comps = g.connected_components()
    assert len(comps) == 1
    split = g.split_subgroup(comps[0])
    if split is not None:  # a valid balanced split exists
        assert len(split) == 2
        assert sum(len(s) for s in split) == 5


def test_known_lookup_symspell():
    known = [b"ACGTACGTACGT", b"TTTTTTTTTTTT"]
    kl = KnownLookup(known, max_distance=2)
    assert kl.correct(b"ACGTACGTACGT") == b"ACGTACGTACGT"
    assert kl.correct(b"ACGTACGTACG") == b"ACGTACGTACGT"     # 1 deletion
    assert kl.correct(b"ACGAACGTACGT") == b"ACGTACGTACGT"    # 1 sub
    assert kl.correct(b"GGGGGGGGGGGG") is None
    # ambiguous between two equally-distant entries
    kl2 = KnownLookup([b"AAAAAAAA", b"AAAAAACC"], max_distance=2)
    assert kl2.correct(b"AAAAAAAC") is None
    assert kl2.correct(b"AAAAAAAC", if_multiple_take_first=True) is not None
