"""Analysis-layer tests: lineage BAM views, cell aggregation, integration-ID
clustering (working versions of the reference's views.py/cell.py)."""

import numpy as np
import pytest

from clique_tpu.caller.cells import CellManager
from clique_tpu.caller.views import (
    BaseEditingCellList,
    CliqueReadSet,
    cluster_integration_ids,
    lineage_bam_reads,
)
from clique_tpu.io.sam import BamWriter, SamRecord

RNG = np.random.default_rng(41)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _write_bam(path, records):
    with BamWriter(str(path), [("amp1", 200)]) as w:
        for r in records:
            w.write(r)


def _rec(name, seq=b"ACGTACGTACGT", rm="0.97", rc="5", e0=None, e1=None):
    tags = {"rm": rm, "rc": rc}
    if e0:
        tags["e0"] = e0
    if e1:
        tags["e1"] = e1
    return SamRecord(name=name, flag=0, reference_name="amp1", pos=1,
                     mapq=255, cigar=[(len(seq), "M")], seq=seq,
                     qual=b"I" * len(seq), tags=tags)


def test_lineage_bam_reads_filters(tmp_path):
    bam = tmp_path / "x.bam"
    _write_bam(bam, [
        _rec("keep", e0="AAAA", e1="CCCC"),
        _rec("low_rm", rm="0.5"),
        _rec("low_rc", rc="1"),
        _rec("no_anchor", seq=b"TTTTTTTTTTTT", e0="GGGG"),
    ])
    reads = list(lineage_bam_reads(str(bam), None, 0.9, 2,
                                   anchors=["ACGT"]))
    assert [r.name for r in reads] == ["keep"]
    assert reads[0].e0 == "AAAA"
    assert reads[0].e1 == "CCCC"
    assert reads[0].read_count == 5


def test_base_editing_cell_list(tmp_path):
    bam = tmp_path / "y.bam"
    _write_bam(bam, [
        _rec("r1", e0="CELL1", e1="INT1"),
        _rec("r2", e0="CELL1", e1="INT1"),
        _rec("r3", e0="CELL1", e1="INT2"),
        _rec("r4", e0="CELLX", e1="INT1"),
    ])
    reads = lineage_bam_reads(str(bam), None, 0.9, 1)
    becl = BaseEditingCellList(reads, ["CELL1", "CELL2"], "e0", "e1")
    assert becl.matched_cell_barcodes == 3
    assert becl.unmatched_cell_barcodes == 1
    cell = becl.matched_cells["CELL1"]
    assert set(cell.integration_ids) == {"INT1", "INT2"}
    assert cell.read_counts[cell.integration_ids.index("INT1")] == 10


def test_cell_manager(tmp_path):
    bam = tmp_path / "z.bam"
    _write_bam(bam, [
        _rec("r1", e0="AAAA", e1="X1"),
        _rec("r2", e0="AAAA", e1="X2"),
        _rec("r3", e0="CCCC", e1="X1"),
    ])
    cm = CellManager(str(bam), ["e0"], ["e1"])
    assert len(cm.cells) == 2
    assert len(cm.cells["AAAA"].barcode_sequences) == 2
    cm.add_known_cell_id_list(["AAAA", "GGGG"])
    assert cm.intersection() == (1, 1)


def test_cluster_integration_ids():
    ids = ["ACGTACGTACGT", "ACGTACGTACGA", "TTTTGGGGCCCC", "TTTTGGGGCCCA"]
    labels = cluster_integration_ids(ids, distance_threshold=2.0)
    assert labels["ACGTACGTACGT"] == labels["ACGTACGTACGA"]
    assert labels["TTTTGGGGCCCC"] == labels["TTTTGGGGCCCA"]
    assert labels["ACGTACGTACGT"] != labels["TTTTGGGGCCCC"]
