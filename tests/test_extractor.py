"""Extractor golden tests transcribed from
/root/reference/rust_cmd/src/extractor.rs:444-700."""

import pytest

from clique_tpu.extract.extractor import (
    extract_tagged_sequences,
    gap_proportion_per_tag,
    recover_aligned_sequences,
    recover_aligned_sequences_fast,
    stretch_sequence_to_alignment,
    stretch_sequence_to_alignment_fast,
)


def test_tagged_sequence_space():
    ref = b"AAATACTTGTACTTCGTTCAGTTACGTATTGCTAAGCAGTGGTAT111111111GAGTACC------TTA--CAGTTCGATCTA"
    read = b"-------------------------------CT-AGCAG----ATCACCGTAAGGACTACCAGACGTTTAGCC-----------"
    kv = extract_tagged_sequences(read, ref)
    assert kv[ord("1")] == "CACCGTAAG"


def test_real_example():
    ref = b"tcgtcggcagcgtcagatgtgtataagagacagctagcagATCACCGTAAGGACTACCAGACGTTTAGCTGCCGGCGGAATGCTATTACTGCATTTAATGGAAGACGTTTCCGCTAAGCTCTATTTAATGTCGGGAGCCGCTTTGTAACCTGATTTACAGTCTGAGTTCATGCGAGAGAACTCTTTAATGAGTGGCCTCTCGAATCACTGAGATTTAGAGTTATCCGACACATCAAAAGGATCTTTAATGAGATGGATCGCATACTAGACAGTTGCCANNNNNNNNNNNNgcttgcactgtactctacgcgactc111111111111agatcg"
    read = b"-----------------------------------AGCAGATCACCGTAAGGACTACCAGACGTTTAGCTGCCGGCGGAATGCTATTACTGCATTTAATGGAAGACGTTTCCGCTAAGCTCTATTTAATGTCGGGAGCCGCTTTGTAACCTGATTTACAGTCTGAGTTCATGCGAGAGAACTCTTTAATGAGTGGCCTCTCGAATCACTGAGATTTAGAGTTATCCGACA-------AGGATCTTTAATGAGATG--------------------CCACCTAGTCTCCAGGCTTGCACTGTACTCTACGCGACTCTCACCAACCGAAA----"
    kv = extract_tagged_sequences(read, ref)
    assert kv[ord("1")] == "TCACCAACCGAA"


def test_lower_and_uppercase_zones():
    ref = b"aaatacttgtacttcgttcaGTTACGTATTGCTAAGCAGTGGTAT111111111GAGTACC------TTA--caaaaaaaaaaa"
    read = b"AAATACTTGTACTTCGTTCA-----------CT-AGCAG----ATCACCGTAAGGACTACCAGACGTTTAGCC-----------"
    kv = extract_tagged_sequences(read, ref)
    assert kv[ord("A")] == "GTTACGTATTGCTAAGCAGTGGTAT111111111GAGTACC------TTA--"
    assert kv[ord("a")] == "-----------CT-AGCAG----ATCACCGTAAGGACTACCAGACGTTTAGC"


def test_stretch_sequence_basic():
    assert stretch_sequence_to_alignment(b"AC-GT-A", b"ACGTA") == b"AC-GT-A"
    assert stretch_sequence_to_alignment(b"ACGT", b"ACGT") == b"ACGT"
    assert stretch_sequence_to_alignment(b"-ACGT", b"ACGT") == b"-ACGT"
    # loop exits when native is consumed: trailing gaps dropped (reference
    # behavior, extractor.rs:222-251)
    assert stretch_sequence_to_alignment(b"ACGT-", b"ACGT") == b"ACGT"
    assert stretch_sequence_to_alignment(b"----", b"") == b""


def test_stretch_sequence_native_longer_raises():
    with pytest.raises(AssertionError):
        stretch_sequence_to_alignment(b"AC", b"ACGT")


def test_gap_proportion():
    assert gap_proportion_per_tag({ord("0"): "ACGT"}) == [0.0]
    assert gap_proportion_per_tag({ord("0"): "----"}) == [1.0]
    props = gap_proportion_per_tag({ord("0"): "ACGT", ord("1"): "AC--"})
    assert max(props) == 0.5


def test_recover_aligned_sequences_simple():
    # read fully matches reference from position 3 (1-based)
    ref = b"AAACGTACGTAA"
    read = b"ACGTACGT"
    aligned_read, aligned_ref = recover_aligned_sequences(
        read, 3, [(8, "M")], ref)
    assert aligned_ref == ref
    assert aligned_read == b"--ACGTACGT--"


def test_recover_aligned_sequences_indels():
    ref = b"AACGTACGTAA"
    read = b"ACGTCCACG"
    # 1-based pos 2: 4M 2I 3M, then 2 ref bases left
    aligned_read, aligned_ref = recover_aligned_sequences(
        read, 2, [(4, "M"), (2, "I"), (3, "M")], ref)
    assert aligned_ref == b"AACGT--ACGTAA"
    assert aligned_read == b"-ACGTCCACG---"


def test_recover_fast_matches_slow():
    import numpy as np

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, 80).tobytes()
    for cigar, pos in [
        ([(30, "M")], 5),
        ([(10, "M"), (4, "I"), (20, "M")], 1),
        ([(10, "M"), (6, "D"), (10, "M")], 12),
        ([(8, "M"), (2, "I"), (5, "M"), (3, "D"), (7, "M")], 3),
        ([(15, "M"), (2, "H"), (5, "M")], 1),
    ]:
        read_len = sum(c for c, op in cigar if op in "MI=X")
        read = rng.choice(bases, read_len).tobytes()
        slow = recover_aligned_sequences(read, pos, cigar, ref,
                                         soft_clip="Realign")
        fast = recover_aligned_sequences_fast(read, pos, cigar, ref)
        assert fast is not None
        assert fast == slow, (cigar, pos)
    # soft clips fall back
    assert recover_aligned_sequences_fast(b"ACGT", 1, [(4, "S")], ref) is None


def test_stretch_fast_matches_slow():
    cases = [
        (b"AC-GT-A", b"ACGTA"),
        (b"ACGT", b"ACGT"),
        (b"-ACGT", b"ACGT"),
        (b"ACGT-", b"ACGT"),
        (b"----", b""),
        (b"A--CG--T", b"NN12"),
    ]
    for aligned, native in cases:
        assert stretch_sequence_to_alignment_fast(aligned, native) == \
            stretch_sequence_to_alignment(aligned, native), (aligned, native)


def test_custom_umi_score():
    from clique_tpu.extract.extractor import custom_umi_score

    assert custom_umi_score(ord("A"), ord("A")) == 10
    assert custom_umi_score(ord("a"), ord("A")) == 10
    assert custom_umi_score(ord("A"), ord("T")) == -8
    assert custom_umi_score(ord("N"), ord("A")) == 7   # N not a known base
    assert custom_umi_score(ord("*"), ord("A")) == 7
