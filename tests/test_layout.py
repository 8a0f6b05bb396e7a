"""Layout schema tests: canonical + legacy YAML forms."""

import pytest

from clique_tpu.config.layout import (
    MergeStrategy,
    SequenceLayout,
    UMISortType,
)


def test_canonical_reference_layout():
    """test_basic_yaml_readback (sequence_layout.rs:207-216) on the same
    mounted test_data/test_layout.yaml fixture."""
    lay = SequenceLayout.from_yaml(
        "/root/reference/rust_cmd/test_data/test_layout.yaml")
    assert lay.merge == MergeStrategy.CONCATENATE
    assert lay.known_strand is True
    ref = lay.references["shorter_reference"]
    assert ref.umi_configurations["cell_id"].symbol == "*"
    assert lay.get_sorting_order("shorter_reference") == ["*", "&", "$"]
    assert ref.target_locations == [0]


def test_legacy_mouse_lineage_layout():
    # maryam_fwd_both.yaml uses the older schema (top-level
    # umi_configurations, known_orientation, bare READ1 items) that the
    # reference's current serde types reject; we parse it
    lay = SequenceLayout.from_yaml(
        "/root/reference/rust_cmd/mouse_lineage_test/maryam_fwd_both.yaml")
    assert lay.merge == MergeStrategy.CONCATENATE_BOTH_FORWARD
    assert lay.known_strand is True
    assert [r.kind for r in lay.reads] == ["Read1", "Read2"]
    ref = lay.references["default"]
    cfg = ref.umi_configurations
    assert cfg["cell_id"].sort_type == UMISortType.KNOWN_TAG
    assert cfg["cell_id"].length == 16
    assert cfg["cell_umi"].maximum_subsequences == 250000
    assert cfg["static_id"].order == 2


def test_invalid_ordering_rejected():
    """test_basic_yaml_readback_invalid_ordering{,2}
    (sequence_layout.rs:218-229): the reference's should_panic fixtures
    test_layout_invalid{,2}.yaml are absent from the snapshot, so the
    equivalent broken layout is inlined (UMI orders must be sequential
    from 0, sequence_layout.rs:56-62)."""
    bad = """
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  r:
    sequence: "AAAA00"
    targets: []
    target_types: []
    umi_configurations:
      a: {symbol: '0', sort_type: "DegenerateTag", length: 2, order: 1, max_distance: 1}
"""
    with pytest.raises(ValueError):
        SequenceLayout.from_yaml_string(bad)


def test_missing_target_rejected():
    bad = """
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  r:
    sequence: "AAAA"
    targets: ["CCCC"]
    target_types: ["Cas9WT"]
    umi_configurations: {}
"""
    with pytest.raises(ValueError):
        SequenceLayout.from_yaml_string(bad)
