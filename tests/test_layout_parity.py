"""Transcriptions of the inline tests of
/root/reference/rust_cmd/src/read_strategies/sequence_layout.rs not
already covered by tests/test_layout.py (yaml readback, invalid ordering,
missing target). The serde round-trip tests translate to enum-distinctness
checks on our enums.
"""

from clique_tpu.config.layout import (
    AlignedReadOrientation,
    MergeStrategy,
    SequenceLayout,
    TargetType,
    UMIConfiguration,
    UMIPadding,
    UMISortType,
)


def _umi(symbol: str, sort_type=UMISortType("DegenerateTag"), length=10,
         order=0, max_distance=2) -> UMIConfiguration:
    return UMIConfiguration(symbol=symbol, sort_type=sort_type,
                            length=length, order=order,
                            max_distance=max_distance)


def test_validate_reference_sequence_all_present():
    """test_validate_reference_sequence_all_present
    (sequence_layout.rs:231-251)."""
    configs = {"umi1": _umi("*")}
    assert SequenceLayout.validate_reference_sequence(b"ACGT*ACGT", configs)


def test_validate_reference_sequence_missing_symbol():
    """test_validate_reference_sequence_missing_symbol
    (sequence_layout.rs:253-272)."""
    configs = {"umi1": _umi("#")}
    assert not SequenceLayout.validate_reference_sequence(b"ACGTACGT", configs)


def test_validate_reference_sequence_multiple_configs():
    """test_validate_reference_sequence_multiple_configs
    (sequence_layout.rs:275-312)."""
    configs = {
        "umi1": _umi("*"),
        "umi2": _umi("#", sort_type=UMISortType("KnownTag"), length=5,
                     order=1, max_distance=1),
    }
    assert not SequenceLayout.validate_reference_sequence(b"ACG*TACGT",
                                                          configs)
    assert SequenceLayout.validate_reference_sequence(b"ACG*T#ACGT", configs)


def test_validate_reference_sequence_empty_configs():
    """test_validate_reference_sequence_empty_configs
    (sequence_layout.rs:315-319)."""
    assert SequenceLayout.validate_reference_sequence(b"ACGT", {})


def test_umi_sort_type_distinct():
    """test_umi_sort_type_serialization (sequence_layout.rs:322-330)."""
    assert UMISortType("KnownTag") != UMISortType("DegenerateTag")
    assert UMISortType("KnownTag") is UMISortType("KnownTag")


def test_merge_strategy_distinct():
    """test_merge_strategy_serialization (sequence_layout.rs:333-341)."""
    assert MergeStrategy("Align") != MergeStrategy("Concatenate")
    assert MergeStrategy("Concatenate") != MergeStrategy("ConcatenateBothForward")


def test_aligned_read_orientation_variants():
    """test_aligned_read_orientation_variants (sequence_layout.rs:344-348)."""
    assert AlignedReadOrientation("Forward") != AlignedReadOrientation("Reverse")
    assert (AlignedReadOrientation("Reverse")
            != AlignedReadOrientation("ReverseComplement"))
    assert (AlignedReadOrientation("ReverseComplement")
            != AlignedReadOrientation("Unknown"))


def test_target_type_variants():
    """test_target_type_variants (sequence_layout.rs:351-364): all eleven
    chemistry variants exist and are distinct."""
    names = ["Static", "Cas9WT", "Cas12AWT", "Cas9ABE", "Cas9CBE",
             "Cas9ABECBE", "Cas12ABE", "Cas12CBE", "Cas12ABECBE",
             "Cas9Homing", "Cas9ABEPalindrome"]
    types = [TargetType(n) for n in names]
    assert len(set(types)) == len(types)


def test_umi_padding_variants():
    """test_umi_padding_variants (sequence_layout.rs:367-369)."""
    assert UMIPadding("Left") != UMIPadding("Right")
