"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/umis/bronkerbosch.rs and
/root/reference/rust_cmd/src/read_strategies/read_set.rs.

The read_set clone/Display/serde tests are Rust-trait plumbing; the
behavioral ones (construction and equality of the 4-slot container)
are transcribed against our frozen dataclass.
"""

from clique_tpu.collapse.graph import BronKerbosch
from clique_tpu.io.fastq import FastqRecord, ReadSetContainer


def _adj(edges, nodes=()):
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


# --- bronkerbosch.rs --------------------------------------------------------

def test_simple_wikipedia():
    """simple_wikipedia_test (bronkerbosch.rs): the canonical 6-node
    example with maximal cliques {1,2,5}, {2,3}, {3,4}, {4,5}, {4,6}."""
    edges = [("6", "4"), ("4", "5"), ("4", "3"), ("3", "2"), ("5", "2"),
             ("5", "1"), ("2", "1")]
    cliques = BronKerbosch(_adj(edges)).compute()
    assert len(cliques) == 5
    as_sets = [frozenset(c) for c in cliques]
    for expected in [{"1", "2", "5"}, {"2", "3"}, {"3", "4"}, {"4", "5"},
                     {"4", "6"}]:
        assert frozenset(expected) in as_sets


def test_empty_graph():
    """test_empty_graph (bronkerbosch.rs): P and X empty pushes the empty
    R as a clique."""
    cliques = BronKerbosch({}).compute()
    assert len(cliques) == 1
    assert cliques[0] == set()


def test_single_node():
    """test_single_node (bronkerbosch.rs)."""
    cliques = BronKerbosch(_adj([], nodes=[1])).compute()
    assert len(cliques) == 1
    assert 1 in cliques[0]


def test_single_edge():
    """test_single_edge (bronkerbosch.rs)."""
    cliques = BronKerbosch(_adj([(1, 2)])).compute()
    assert len(cliques) == 1
    assert cliques[0] == {1, 2}


def test_complete_graph_k4():
    """test_complete_graph_k4 (bronkerbosch.rs)."""
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cliques = BronKerbosch(_adj(edges)).compute()
    assert len(cliques) == 1
    assert len(cliques[0]) == 4


def test_triangle():
    """test_triangle (bronkerbosch.rs)."""
    cliques = BronKerbosch(_adj([(1, 2), (2, 3), (1, 3)])).compute()
    assert len(cliques) == 1
    assert len(cliques[0]) == 3


def test_disconnected_edges():
    """test_disconnected_edges (bronkerbosch.rs)."""
    cliques = BronKerbosch(_adj([(1, 2), (3, 4)])).compute()
    assert len(cliques) == 2
    for c in cliques:
        assert len(c) == 2


def test_star_graph():
    """test_star_graph (bronkerbosch.rs): each spoke is its own maximal
    clique containing the hub."""
    cliques = BronKerbosch(_adj([(0, i) for i in range(1, 5)])).compute()
    assert len(cliques) == 4
    for c in cliques:
        assert len(c) == 2
        assert 0 in c


# --- read_set.rs ------------------------------------------------------------

def test_read_set_container_new_from_read1():
    """test_read_set_container_new_from_read1 +
    test_read_set_container_clone_read_only (read_set.rs:138-162): a
    read1-only container keeps the other slots empty; copies compare
    equal (dataclass value semantics stand in for Rust Clone)."""
    rsc = ReadSetContainer(FastqRecord("read1", b"ACGT", b"HHHH"))
    assert rsc.read_one.name == "read1"
    assert rsc.read_two is None
    assert rsc.index_one is None
    assert rsc.index_two is None


def test_read_set_container_all_fields():
    """test_read_set_container_clone_all_fields (read_set.rs)."""
    rsc = ReadSetContainer(
        read_one=FastqRecord("r1", b"ACGT", b"HHHH"),
        read_two=FastqRecord("r2", b"TGCA", b"IIII"),
        index_one=FastqRecord("i1", b"AA", b"HH"),
        index_two=FastqRecord("i2", b"CC", b"HH"),
    )
    assert rsc.read_one.name == "r1"
    assert rsc.read_two.name == "r2"
    assert rsc.index_one.name == "i1"
    assert rsc.index_two.name == "i2"


def test_read_set_container_equality():
    """test_read_set_container_equality / test_read_set_container_inequality
    (read_set.rs:164-203)."""
    r1 = ReadSetContainer(FastqRecord("r1", b"ACGT", b"HHHH"))
    r2 = ReadSetContainer(FastqRecord("r1", b"ACGT", b"HHHH"))
    r3 = ReadSetContainer(FastqRecord("r2", b"TGCA", b"IIII"))
    assert r1 == r2
    assert r1 != r3


def test_read_set_container_display():
    """test_read_set_container_display (read_set.rs:181-195): the reference
    Display prints each present read; the dataclass repr carries the same
    fields."""
    rsc = ReadSetContainer(FastqRecord("r1", b"ACGT", b"HHHH"))
    assert "r1" in repr(rsc)
    assert "ACGT" in repr(rsc)


def test_read_set_container_serialize_deserialize():
    """test_read_set_container_serialize_deserialize (read_set.rs:204-236):
    the reference pins a serde round-trip; our containers cross process
    boundaries via pickle in the collapse worker pool, so pin that
    round-trip the same way."""
    import pickle

    rsc = ReadSetContainer(
        read_one=FastqRecord("r1", b"ACGT", b"HHHH"),
        read_two=FastqRecord("r2", b"TGCA", b"IIII"),
        index_one=FastqRecord("i1", b"AA", b"HH"),
        index_two=FastqRecord("i2", b"CC", b"HH"),
    )
    assert pickle.loads(pickle.dumps(rsc)) == rsc
