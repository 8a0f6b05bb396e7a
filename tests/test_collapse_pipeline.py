"""End-to-end collapse test: align a synthetic UMI dataset, collapse it, and
check group counts, corrected tags, and consensus sequences (BASELINE
config 3 shape: hierarchical cell_id / umi correction + consensus)."""

import gzip

import numpy as np
import pytest

from clique_tpu.align.pipeline import align_reads
from clique_tpu.collapse.pipeline import collapse
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.io.sam import BamReader
from clique_tpu.reference.manager import ReferenceManager

RNG = np.random.default_rng(77)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

A5 = "TTCAGACGTGTGCTCTTCCGATCT"
A3 = "AGATCGGAAGAGCACACGTCTGAA"
TARGET = "GGCACTGCGGCTGGAGGTGG"


def rand_seq(n):
    return RNG.choice(BASES, size=n).tobytes().decode()


def build_layout(tmp_path, known_file=None):
    known_part = f'file: "{known_file}"\n        ' if known_file else ""
    text = f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{A5}{'0' * 16}{'1' * 12}{TARGET}{A3}"
    targets: ["{TARGET}"]
    target_types: ["Cas9WT"]
    umi_configurations:
      cell_id:
        symbol: '0'
        {known_part}sort_type: "{'KnownTag' if known_file else 'DegenerateTag'}"
        length: 16
        order: 0
        max_distance: 2
      cell_umi:
        symbol: '1'
        sort_type: "DegenerateTag"
        length: 12
        order: 1
        max_distance: 2
"""
    p = tmp_path / "layout.yaml"
    p.write_text(text)
    return str(p)


def test_collapse_end_to_end(tmp_path):
    # two cells x two UMIs each; each (cell, umi) group has several reads,
    # one of which carries a UMI error that should be corrected in
    cells = [rand_seq(16), rand_seq(16)]
    umis = [rand_seq(12), rand_seq(12)]
    layout_path = build_layout(tmp_path)
    fq = tmp_path / "reads.fastq.gz"
    idx = 0
    with gzip.open(fq, "wt") as fh:
        for cell in cells:
            for umi in umis:
                for k in range(6):
                    u = umi
                    if k == 5:  # one erroneous copy of the umi
                        u = ("A" if umi[0] != "A" else "C") + umi[1:]
                    read = A5 + cell + u + TARGET + A3
                    fh.write(f"@r{idx}\n{read}\n+\n{'I' * len(read)}\n")
                    idx += 1

    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)

    out_bam = tmp_path / "collapsed.bam"
    stats = collapse(str(out_bam), layout, str(aligned_bam))
    assert stats.passing == 24

    with BamReader(str(out_bam)) as reader:
        records = list(reader)

    # 2 cells x 2 umis -> 4 collapsed consensus reads
    assert len(records) == 4
    seen = set()
    for rec in records:
        assert rec.tags["rc"] == "6"          # all 6 copies grouped
        assert rec.tags["dc"] == "6"
        assert rec.tags["e0"] in [c.encode().decode() for c in cells]
        assert rec.tags["e1"] in [u.encode().decode() for u in umis]
        seen.add((rec.tags["e0"], rec.tags["e1"]))
        # consensus sequence must contain the anchors and target
        assert TARGET.encode() in rec.seq
        assert rec.name.startswith("r")
        assert len(rec.tags["ar"].split(",")) == 6
    assert len(seen) == 4


def test_collapse_out_of_core_equivalent(tmp_path):
    """Spill mode must produce the same record multiset as the in-RAM path
    (record order may differ: shard order vs global key sort)."""
    cells = [rand_seq(16) for _ in range(3)]
    umis = [rand_seq(12) for _ in range(3)]
    layout_path = build_layout(tmp_path)
    fq = tmp_path / "reads.fastq.gz"
    idx = 0
    with gzip.open(fq, "wt") as fh:
        for cell in cells:
            for umi in umis:
                for k in range(5):
                    u = umi
                    if k == 4:
                        u = ("A" if umi[0] != "A" else "C") + umi[1:]
                    read = A5 + cell + u + TARGET + A3
                    fh.write(f"@r{idx}\n{read}\n+\n{'I' * len(read)}\n")
                    idx += 1

    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)

    ram_bam = tmp_path / "ram.bam"
    ooc_bam = tmp_path / "ooc.bam"
    s1 = collapse(str(ram_bam), layout, str(aligned_bam))
    s2 = collapse(str(ooc_bam), layout, str(aligned_bam),
                  temp_dir=str(tmp_path), out_of_core=True)
    assert s1.passing == s2.passing

    def snapshot(path):
        with BamReader(str(path)) as reader:
            return sorted(
                (r.name, r.seq, r.qual, r.cigar_string,
                 tuple(sorted(r.tags.items())))
                for r in reader)

    assert snapshot(ram_bam) == snapshot(ooc_bam)


def test_collapse_parallel_equivalent(tmp_path):
    """The host-parallel path (spawned jax-free workers for ingest +
    consensus, collapse/workers.py) must produce the same record multiset
    as the single-process in-RAM path."""
    cells = [rand_seq(16) for _ in range(3)]
    umis = [rand_seq(12) for _ in range(3)]
    layout_path = build_layout(tmp_path)
    fq = tmp_path / "reads.fastq.gz"
    idx = 0
    with gzip.open(fq, "wt") as fh:
        for cell in cells:
            for umi in umis:
                for k in range(5):
                    u = umi
                    if k == 4:
                        u = ("A" if umi[0] != "A" else "C") + umi[1:]
                    read = A5 + cell + u + TARGET + A3
                    fh.write(f"@r{idx}\n{read}\n+\n{'I' * len(read)}\n")
                    idx += 1

    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)

    ram_bam = tmp_path / "ram.bam"
    par_bam = tmp_path / "par.bam"
    s1 = collapse(str(ram_bam), layout, str(aligned_bam))
    s2 = collapse(str(par_bam), layout, str(aligned_bam),
                  temp_dir=str(tmp_path), n_workers=2)
    assert s1.passing == s2.passing

    def snapshot(path):
        with BamReader(str(path)) as reader:
            return sorted(
                (r.name, r.seq, r.qual, r.cigar_string,
                 tuple(sorted(r.tags.items())))
                for r in reader)

    assert snapshot(ram_bam) == snapshot(par_bam)

    import json

    with open(str(par_bam) + ".collapse_metrics.json") as fh:
        m = json.load(fh)
    assert m["n_workers"] == 2
    assert m["read_stats"]["passing"] == s1.passing


def _build_umi_dataset(tmp_path, n_cells=3, n_umis=3, reads_per=5):
    cells = [rand_seq(16) for _ in range(n_cells)]
    umis = [rand_seq(12) for _ in range(n_umis)]
    layout_path = build_layout(tmp_path)
    fq = tmp_path / "reads.fastq.gz"
    idx = 0
    with gzip.open(fq, "wt") as fh:
        for cell in cells:
            for umi in umis:
                for k in range(reads_per):
                    u = umi
                    if k == reads_per - 1:
                        u = ("A" if umi[0] != "A" else "C") + umi[1:]
                    read = A5 + cell + u + TARGET + A3
                    fh.write(f"@r{idx}\n{read}\n+\n{'I' * len(read)}\n")
                    idx += 1
    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)
    return layout, str(aligned_bam)


def _snapshot(path):
    with BamReader(str(path)) as reader:
        return sorted(
            (r.name, r.seq, r.qual, r.cigar_string,
             tuple(sorted(r.tags.items())))
            for r in reader)


def test_collapse_parallel_spill_equivalent(tmp_path):
    """Workers + out-of-core unified (collapse_parallel_spill): an
    explicit out_of_core + n_workers>1 run fans every stage over the
    pool while streaming, with records identical to the in-RAM path."""
    import json

    layout, aligned_bam = _build_umi_dataset(tmp_path)
    ram_bam = tmp_path / "ram.bam"
    par_bam = tmp_path / "par_spill.bam"
    s1 = collapse(str(ram_bam), layout, aligned_bam)
    s2 = collapse(str(par_bam), layout, aligned_bam,
                  temp_dir=str(tmp_path), n_workers=2, out_of_core=True)
    assert s1.passing == s2.passing
    assert _snapshot(ram_bam) == _snapshot(par_bam)
    with open(str(par_bam) + ".collapse_metrics.json") as fh:
        m = json.load(fh)
    assert m["n_workers"] == 2 and m["out_of_core"] is True


def test_collapse_parallel_fanout_range_ingest(tmp_path, monkeypatch):
    """Force the worker ingest fanout on a small BAM (inline threshold
    0): with the .cqi sidecar present, workers seek + inflate their own
    byte ranges (ingest_range_reads_task); records must match the
    single-process path exactly."""
    from clique_tpu.io.sam import read_cqi

    layout, aligned_bam = _build_umi_dataset(tmp_path)
    assert read_cqi(aligned_bam)            # align minted the index
    monkeypatch.setenv("CLIQUE_PAR_INGEST_MIN", "0")
    ram_bam = tmp_path / "ram.bam"
    par_bam = tmp_path / "par_range.bam"
    s1 = collapse(str(ram_bam), layout, aligned_bam)
    s2 = collapse(str(par_bam), layout, aligned_bam,
                  temp_dir=str(tmp_path), n_workers=2)
    assert s1.passing == s2.passing
    assert _snapshot(ram_bam) == _snapshot(par_bam)


def test_collapse_caps_keep_workers(tmp_path):
    """maximum_subsequences + n_workers>1 no longer downgrades to
    single-process: it routes through collapse_parallel_spill, honors
    the cap (nothing dropped), and matches the unbounded in-RAM run."""
    import json

    layout, aligned_bam = _build_umi_dataset(tmp_path, n_cells=2,
                                             n_umis=2, reads_per=7)
    capped_layout_path = build_layout(tmp_path)
    text = open(capped_layout_path).read().replace(
        "max_distance: 2",
        "max_distance: 2\n        maximum_subsequences: 2")
    open(capped_layout_path, "w").write(text)
    capped_layout = SequenceLayout.from_yaml(capped_layout_path)

    ram_bam = tmp_path / "ram.bam"
    cap_bam = tmp_path / "cap_workers.bam"
    s1 = collapse(str(ram_bam), layout, aligned_bam)
    s2 = collapse(str(cap_bam), capped_layout, aligned_bam,
                  temp_dir=str(tmp_path), n_workers=2)
    assert s1.passing == s2.passing
    assert _snapshot(ram_bam) == _snapshot(cap_bam)
    with open(str(cap_bam) + ".collapse_metrics.json") as fh:
        m = json.load(fh)
    assert m["n_workers"] == 2 and m["out_of_core"] is True
    with BamReader(str(cap_bam)) as reader:
        assert all(r.tags["rc"] == "7" for r in reader)


def test_collapse_correct_only(tmp_path):
    layout_path = build_layout(tmp_path)
    fq = tmp_path / "reads.fastq.gz"
    cell, umi = rand_seq(16), rand_seq(12)
    with gzip.open(fq, "wt") as fh:
        for k in range(3):
            read = A5 + cell + umi + TARGET + A3
            fh.write(f"@q{k}\n{read}\n+\n{'I' * len(read)}\n")

    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)

    out_bam = tmp_path / "corrected.bam"
    collapse(str(out_bam), layout, str(aligned_bam), correct_only=True)
    with BamReader(str(out_bam)) as reader:
        records = list(reader)
    # correct-only: one output per input read, tags corrected but no merge
    assert len(records) == 3
    for rec in records:
        assert rec.tags["rc"] == "1"
        assert rec.tags["e0"] == cell
        assert rec.tags["o1"] == umi


def test_collapse_known_list(tmp_path):
    # cell barcodes corrected against an allowlist; off-list cells dropped
    allow = [rand_seq(16) for _ in range(4)]
    known_file = tmp_path / "allow.txt"
    known_file.write_text("\n".join(allow) + "\n")
    layout_path = build_layout(tmp_path, known_file=str(known_file))

    fq = tmp_path / "reads.fastq.gz"
    umi = rand_seq(12)
    with gzip.open(fq, "wt") as fh:
        # 3 reads with allow[0] (one with a 1-bp error), 2 with a random cell
        for k in range(3):
            cell = allow[0]
            if k == 2:
                cell = ("A" if cell[0] != "A" else "C") + cell[1:]
            read = A5 + cell + umi + TARGET + A3
            fh.write(f"@k{k}\n{read}\n+\n{'I' * len(read)}\n")
        bogus = "ACGT" * 4
        read = A5 + bogus + umi + TARGET + A3
        fh.write(f"@bogus\n{read}\n+\n{'I' * len(read)}\n")

    layout = SequenceLayout.from_yaml(layout_path)
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)

    out_bam = tmp_path / "collapsed.bam"
    collapse(str(out_bam), layout, str(aligned_bam))
    with BamReader(str(out_bam)) as reader:
        records = list(reader)
    # the 3 allow[0] reads collapse to one record; the bogus cell is dropped
    # (assuming it's > max_distance from every allowlist entry)
    assert len(records) == 1
    assert records[0].tags["e0"] == allow[0]
    assert records[0].tags["rc"] == "3"


def test_flanking_degenerate_base_filter():
    from clique_tpu.collapse.pipeline import (
        SortingRead,
        flanking_degenerate_base_filter,
    )

    def mk(read, ref):
        return SortingRead(
            read_name="x", reference_name="r", reference_aligned=ref,
            read_aligned=read, read_quals=None, cigar=[], reference_start=1,
            score=0.0)

    # the reference's quirky semantics (collapse.rs:284-344): the left-flank
    # check fires when a DIGIT wildcard (< 59) is reached with history;
    # N zones only start a countdown when no history is buffered
    ref = b"ACGTACGTAC" + b"0" * 8 + b"GTACGTACGT"
    read = b"ACGTACGTAC" + b"TTTTTTTT" + b"GTACGTACGT"
    assert flanking_degenerate_base_filter(mk(read, ref)) is True
    # garbage left flank before the digit zone: drop
    bad = b"TTTTTTTTTT" + b"TTTTTTTT" + b"GTACGTACGT"
    assert flanking_degenerate_base_filter(mk(bad, ref)) is False
    # leading-N countdown: bad window right after an N zone at read start
    ref2 = b"N" * 5 + b"ACGTACGTACGT"
    ok2 = b"GGGGG" + b"ACGTACGTACGT"
    bad2 = b"GGGGG" + b"TTTTTTTTTTTT"
    assert flanking_degenerate_base_filter(mk(ok2, ref2)) is True
    assert flanking_degenerate_base_filter(mk(bad2, ref2)) is False


def test_level0_spill_partitions_across_shards(tmp_path):
    """Level-0 spill keys include the next raw tag, so reads spread over
    shards instead of all hashing to the empty key tuple (advisor finding:
    a single-shard level 0 defeats the out-of-core memory bound)."""
    import os

    from clique_tpu.collapse.pipeline import SortingRead
    from clique_tpu.collapse.shards import ShardWriter, shard_paths
    from collections import deque

    d = str(tmp_path / "spill")
    with ShardWriter(d, n_shards=8) as sw:
        for i in range(256):
            r = SortingRead(
                read_name=f"r{i}", reference_name="amp",
                reference_aligned=b"ACGT", read_aligned=b"ACGT",
                read_quals=None, cigar=[], reference_start=1, score=0.0,
                unsorted_keys=deque([("0", rand_seq(16).encode())]))
            assert r.key_tuple() == ()       # level 0: no corrected keys yet
            sw.push(r.spill_key(), r)
    nonempty = [p for p in shard_paths(d) if os.path.getsize(p) > 16]
    assert len(nonempty) >= 6, f"level-0 reads all hashed to {nonempty}"


def test_collapse_maximum_subsequences_cap(tmp_path):
    """maximum_subsequences caps per-bin RESIDENT reads (the reference
    spills past the cap and never drops, collapse.rs:884-888). Setting it
    must auto-route collapse through the streaming out-of-core path and
    leave the output identical to the unbounded in-RAM run."""
    cells = [rand_seq(16) for _ in range(2)]
    umis = [rand_seq(12) for _ in range(2)]
    layout_path = build_layout(tmp_path)
    # add the cap to both umi configurations
    text = open(layout_path).read().replace(
        "max_distance: 2", "max_distance: 2\n        maximum_subsequences: 2")
    open(layout_path, "w").write(text)
    fq = tmp_path / "reads.fastq.gz"
    idx = 0
    with gzip.open(fq, "wt") as fh:
        for cell in cells:
            for umi in umis:
                for _ in range(7):   # 7 reads per bin, far above the cap
                    read = A5 + cell + umi + TARGET + A3
                    fh.write(f"@m{idx}\n{read}\n+\n{'I' * len(read)}\n")
                    idx += 1

    layout = SequenceLayout.from_yaml(layout_path)
    cfgs = layout.get_sorted_umi_configurations("amp1")
    assert all(c.maximum_subsequences == 2 for c in cfgs)
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)

    capped_bam = tmp_path / "capped.bam"
    stats = collapse(str(capped_bam), layout, str(aligned_bam),
                     temp_dir=str(tmp_path))

    # uncapped, in-RAM run for comparison
    layout2 = SequenceLayout.from_yaml(build_layout(tmp_path))
    ram_bam = tmp_path / "ram.bam"
    stats2 = collapse(str(ram_bam), layout2, str(aligned_bam))
    assert stats.passing == stats2.passing == 28

    def snapshot(path):
        with BamReader(str(path)) as reader:
            return sorted(
                (r.name, r.seq, r.cigar_string,
                 tuple(sorted(r.tags.items())))
                for r in reader)

    cap_records = snapshot(capped_bam)
    assert cap_records == snapshot(ram_bam)
    # nothing dropped: every bin keeps all 7 reads (cap bounds residency,
    # not data)
    with BamReader(str(capped_bam)) as reader:
        assert all(r.tags["rc"] == "7" for r in reader)


def test_collapse_multi_reference_single_pass(tmp_path, monkeypatch):
    """A multi-reference panel must be ingested in ONE streaming pass (the
    reference re-queries the indexed BAM per reference,
    collapse.rs:437-491 - O(refs x filesize))."""
    import clique_tpu.collapse.pipeline as cp

    n_refs = 5
    refs = {}
    cells = {}
    for i in range(n_refs):
        body = rand_seq(40)
        refs[f"amp{i}"] = (A5 + "0" * 12 + body + A3, body)
    lines = ["known_strand: true", "reads:", "  - !Read1",
             "    orientation: Forward", "references:"]
    for name, (seq, _b) in refs.items():
        lines += [
            f"  {name}:",
            f'    sequence: "{seq}"',
            "    umi_configurations:",
            "      umi:",
            "        symbol: '0'",
            '        sort_type: "DegenerateTag"',
            "        length: 12",
            "        order: 0",
            "        max_distance: 2",
        ]
    layout_path = tmp_path / "panel.yaml"
    layout_path.write_text("\n".join(lines) + "\n")

    fq = tmp_path / "reads.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        idx = 0
        for name, (seq, body) in refs.items():
            cells[name] = rand_seq(12)
            for _ in range(4):
                read = A5 + cells[name] + body + A3
                fh.write(f"@p{idx}\n{read}\n+\n{'I' * len(read)}\n")
                idx += 1

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    aligned_bam = tmp_path / "aligned.bam"
    align_reads(layout, rm, str(aligned_bam), read1=str(fq), batch_size=8)

    opens = []
    orig_init = cp.BamReader.__init__

    def counting_init(self, path, *a, **k):
        opens.append(path)
        return orig_init(self, path, *a, **k)

    monkeypatch.setattr(cp.BamReader, "__init__", counting_init)
    out_bam = tmp_path / "collapsed.bam"
    collapse(str(out_bam), layout, str(aligned_bam))
    assert len(opens) == 1, f"BAM opened {len(opens)} times for {n_refs} refs"

    with BamReader(str(out_bam)) as reader:
        records = list(reader)
    by_ref = {}
    for rec in records:
        by_ref.setdefault(rec.reference_name, []).append(rec)
    assert set(by_ref) == set(refs)
    for name, recs in by_ref.items():
        assert len(recs) == 1 and recs[0].tags["rc"] == "4"
        assert recs[0].tags["e0"] == cells[name]
