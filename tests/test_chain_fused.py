"""Fused align->collapse chain parity (VERDICT r3 item 1).

run_chain (clique_tpu/chain.py) must produce a collapsed BAM byte-identical
to the two-stage align_reads + collapse path — the fusion deletes the BAM
re-ingestion, not any semantics. Covered shapes: the golden dataset
(KnownTag + Degenerate levels), an indel-bearing dataset (non-gapless
rows), and the WFA engine (AlignedRead sink path).
"""

import gzip
import importlib.util
import os
import struct

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(ROOT, "tests", "data", "golden")


def _load_make_golden():
    spec = importlib.util.spec_from_file_location(
        "make_golden", os.path.join(ROOT, "tools", "make_golden.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _payload(path):
    out = []
    with open(path, "rb") as fh:
        raw = fh.read()
    p = 0
    while p < len(raw):
        assert raw[p:p + 4] == b"\x1f\x8b\x08\x04"
        xlen = struct.unpack_from("<H", raw, p + 10)[0]
        xp, bsize = p + 12, None
        while xp < p + 12 + xlen:
            si1, si2, slen = struct.unpack_from("<BBH", raw, xp)
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", raw, xp + 4)[0] + 1
            xp += 4 + slen
        out.append(gzip.decompress(raw[p:p + bsize]))
        p += bsize
    return b"".join(out)


def _golden_layout(tmp_path):
    mg = _load_make_golden()
    return mg._load_layout(str(tmp_path))


@pytest.mark.parametrize("engine", [None, "wfa"])
def test_fused_matches_two_stage_golden(tmp_path, engine):
    from clique_tpu.align.pipeline import align_reads
    from clique_tpu.chain import run_chain
    from clique_tpu.collapse.pipeline import collapse

    layout, rm = _golden_layout(tmp_path)
    reads = os.path.join(GOLDEN, "reads.fastq.gz")
    kwargs = {"batch_size": 16}
    if engine:
        kwargs["engine"] = engine

    a2 = str(tmp_path / "two_aligned.bam")
    c2 = str(tmp_path / "two_collapsed.bam")
    align_reads(layout, rm, a2, read1=reads, **kwargs)
    collapse(c2, layout, a2)

    a1 = str(tmp_path / "fused_aligned.bam")
    c1 = str(tmp_path / "fused_collapsed.bam")
    run_chain(layout, rm, a1, c1, read1=reads, **kwargs)

    assert _payload(a1) == _payload(a2), "fused align BAM drifted"
    assert _payload(c1) == _payload(c2), \
        "fused collapsed BAM differs from two-stage"


def test_fused_matches_two_stage_indels(tmp_path):
    """Indel-bearing reads exercise the non-gapless sink rows (gapped
    reference_aligned slices instead of the shared native object)."""
    from clique_tpu.align.pipeline import align_reads
    from clique_tpu.chain import run_chain
    from clique_tpu.collapse.pipeline import collapse
    from clique_tpu.config.layout import SequenceLayout
    from clique_tpu.reference.manager import ReferenceManager

    rng = np.random.default_rng(44)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    a5 = "TTCAGACGTGTGCTCTTCCGATCT"
    a3 = "AGATCGGAAGAGCACACGTCTGAA"
    core = rng.choice(bases, 80).tobytes().decode()
    ref_seq = a5 + "0" * 12 + core + a3
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp:
    sequence: "{ref_seq}"
    umi_configurations:
      umi: {{symbol: '0', sort_type: "DegenerateTag", length: 12,
            order: 0, max_distance: 2}}
""")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)

    umis = [rng.choice(bases, 12).tobytes().decode() for _ in range(4)]
    fq = tmp_path / "reads.fastq"
    with open(fq, "w") as fh:
        for i in range(24):
            read = ref_seq.replace("0" * 12, umis[i % 4])
            arr = np.frombuffer(read.encode(), np.uint8).copy()
            if i % 3 == 0:          # 2bp deletion mid-core
                arr = np.delete(arr, [60, 61])
            elif i % 3 == 1:        # 1bp insertion mid-core
                arr = np.insert(arr, 70, ord("A"))
            subs = rng.random(len(arr)) < 0.02
            arr[subs] = rng.choice(bases, int(subs.sum()))
            seq = arr.tobytes().decode()
            fh.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")

    a2 = str(tmp_path / "two_aligned.bam")
    c2 = str(tmp_path / "two_collapsed.bam")
    align_reads(layout, rm, a2, read1=str(fq), batch_size=8)
    collapse(c2, layout, a2)

    a1 = str(tmp_path / "fused_aligned.bam")
    c1 = str(tmp_path / "fused_collapsed.bam")
    run_chain(layout, rm, a1, c1, read1=str(fq), batch_size=8)

    assert _payload(a1) == _payload(a2)
    assert _payload(c1) == _payload(c2)


def test_fused_call_matches_bam_call(tmp_path):
    """run_chain's fused call (in-memory record tap) produces the same
    allele table as calling from the collapsed BAM."""
    from clique_tpu.caller.events import call_events_from_bam
    from clique_tpu.chain import run_chain

    layout, rm = _golden_layout(tmp_path)
    reads = os.path.join(GOLDEN, "reads.fastq.gz")
    c1 = str(tmp_path / "c1.bam")
    fused_tsv = str(tmp_path / "fused.tsv")
    run_chain(layout, rm, str(tmp_path / "a1.bam"), c1, read1=reads,
              batch_size=16, alleles_path=fused_tsv)
    bam_tsv = str(tmp_path / "from_bam.tsv")
    call_events_from_bam(layout, c1, bam_tsv, min_read_count=1)
    with open(fused_tsv) as fh:
        fused = fh.read()
    with open(bam_tsv) as fh:
        want = fh.read()
    assert fused == want
    with open(os.path.join(GOLDEN, "alleles.tsv")) as fh:
        golden = fh.read()
    assert fused == golden, "fused call drifted from the golden pin"


def test_fused_stats_match(tmp_path):
    """CollapseStats from the sink equal the two-stage ingestion's."""
    from clique_tpu.align.pipeline import align_reads
    from clique_tpu.chain import run_chain
    from clique_tpu.collapse.pipeline import collapse

    layout, rm = _golden_layout(tmp_path)
    reads = os.path.join(GOLDEN, "reads.fastq.gz")
    a2 = str(tmp_path / "a2.bam")
    c2 = str(tmp_path / "c2.bam")
    align_reads(layout, rm, a2, read1=reads, batch_size=16)
    s2 = collapse(c2, layout, a2)
    _astats, s1 = run_chain(layout, rm, str(tmp_path / "a1.bam"),
                            str(tmp_path / "c1.bam"), read1=reads,
                            batch_size=16)
    assert (s1.total_reads, s1.invalid_tags, s1.failed_filters,
            s1.passing) == \
        (s2.total_reads, s2.invalid_tags, s2.failed_filters, s2.passing)
