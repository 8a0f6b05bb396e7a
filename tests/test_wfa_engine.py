"""The WFA engine as a product path: `align_reads(engine="wfa")` must
produce the same extracted tags and gap-stripped sequences as the exact-DP
path, and the full chain through collapse must agree (VERDICT r1 item 3:
WFA promoted from ornament to engine; WFA2-lib component parity SURVEY
2.9)."""

import gzip

import numpy as np

from clique_tpu.align.pipeline import align_reads
from clique_tpu.collapse.pipeline import collapse
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.io.sam import BamReader
from clique_tpu.reference.manager import ReferenceManager

RNG = np.random.default_rng(31337)
BASES = np.frombuffer(b"ACGT", dtype=np.uint8)

A5 = "TTCAGACGTGTGCTCTTCCGATCT"
A3 = "AGATCGGAAGAGCACACGTCTGAA"
TARGET = "GGCACTGCGGCTGGAGGTGG"


def rand_seq(n):
    return RNG.choice(BASES, size=n).tobytes().decode()


def build_dataset(tmp_path, n_umis=3, reads_per=4, mutate=True):
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{A5}{'0' * 12}{TARGET}{A3}"
    targets: ["{TARGET}"]
    target_types: ["Cas9WT"]
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 12
        order: 0
        max_distance: 2
""")
    fq = tmp_path / "reads.fastq.gz"
    idx = 0
    with gzip.open(fq, "wt") as fh:
        for _u in range(n_umis):
            umi = rand_seq(12)
            for k in range(reads_per):
                read = A5 + umi + TARGET + A3
                if mutate and k == reads_per - 1:
                    # a substitution outside the UMI zone
                    pos = len(A5) + 14
                    ch = "T" if read[pos] != "T" else "G"
                    read = read[:pos] + ch + read[pos + 1:]
                fh.write(f"@r{idx}\n{read}\n+\n{'I' * len(read)}\n")
                idx += 1
    layout = SequenceLayout.from_yaml(str(layout_path))
    return layout, str(fq)


def read_bam(path):
    with BamReader(path) as reader:
        return list(reader)


def test_wfa_engine_matches_dp_tags(tmp_path):
    layout, fq = build_dataset(tmp_path)
    rm = ReferenceManager.from_layout(layout)

    dp_bam = tmp_path / "dp.bam"
    align_reads(layout, rm, str(dp_bam), read1=fq, batch_size=8,
                engine="dp")
    wfa_bam = tmp_path / "wfa.bam"
    align_reads(layout, rm, str(wfa_bam), read1=fq, batch_size=8,
                engine="wfa")

    dp = {r.name: r for r in read_bam(str(dp_bam))}
    wfa = {r.name: r for r in read_bam(str(wfa_bam))}
    assert set(dp) == set(wfa) and dp
    for name in dp:
        assert wfa[name].seq == dp[name].seq
        assert wfa[name].tags["e0"] == dp[name].tags["e0"], name
        # WFA path reports negated penalties; must be <= 0 and present
        assert float(wfa[name].tags["as"]) <= 0


def test_wfa_engine_full_chain_collapse(tmp_path):
    layout, fq = build_dataset(tmp_path)
    rm = ReferenceManager.from_layout(layout)
    aligned = tmp_path / "a.bam"
    align_reads(layout, rm, str(aligned), read1=fq, batch_size=8,
                engine="wfa")
    collapsed = tmp_path / "c.bam"
    collapse(str(collapsed), layout, str(aligned))
    records = read_bam(str(collapsed))
    assert len(records) == 3          # one consensus per UMI group
    for rec in records:
        assert int(rec.tags["rc"]) == 4


def test_hifi_mode_defaults_to_dp(tmp_path):
    """The HiFi default engine is the exact DP, per the recorded
    dp-vs-wfa A/B (BENCH_SECONDARY, VERDICT r3 item 2c); WFA stays the
    opt-in --engine wfa path."""
    layout, fq = build_dataset(tmp_path, n_umis=1, reads_per=2,
                               mutate=False)
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "hifi.bam"
    metrics = tmp_path / "m.json"
    align_reads(layout, rm, str(out), read1=fq, batch_size=8, mode="hifi",
                metrics_path=str(metrics))
    import json

    m = json.loads(metrics.read_text())
    assert m["engine"] == "dp"
    assert m["aligned"] == 2
    m2 = tmp_path / "m2.json"
    align_reads(layout, rm, str(tmp_path / "hifi_wfa.bam"), read1=fq,
                batch_size=8, mode="hifi", engine="wfa",
                metrics_path=str(m2))
    assert json.loads(m2.read_text())["engine"] == "wfa"


def test_wfa_engine_multi_reference_routing(tmp_path):
    """WFA screen + winner traceback must route each read to its true
    reference in an exhaustive search (two similar amplicons so the kmer
    vote is ambiguous and the exhaustive path engages)."""
    seq1 = A5 + "0" * 12 + TARGET + A3
    # second amplicon differs by a small internal block only
    seq2 = A5 + "0" * 12 + TARGET[:8] + "TTTTT" + TARGET[13:] + A3
    layout_path = tmp_path / "layout.yaml"
    umi_block = """
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 12
        order: 0
        max_distance: 2"""
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{seq1}"{umi_block}
  amp2:
    sequence: "{seq2}"{umi_block}
""")
    fq = tmp_path / "reads.fastq.gz"
    with gzip.open(fq, "wt") as fh:
        for i, template in enumerate([seq1, seq2] * 4):
            read = template.replace("0" * 12, rand_seq(12))
            fh.write(f"@t{i % 2}_{i}\n{read}\n+\n{'I' * len(read)}\n")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "multi.bam"
    align_reads(layout, rm, str(out), read1=fq, batch_size=8,
                engine="wfa")
    for rec in read_bam(str(out)):
        expect = "amp1" if rec.name.startswith("t0") else "amp2"
        assert rec.reference_name == expect, (rec.name, rec.reference_name)


def test_wfa_engine_high_divergence_falls_back(tmp_path):
    """A read far beyond the WFA score cap must still align (exact-DP
    fallback), not drop."""
    layout, fq = build_dataset(tmp_path, n_umis=1, reads_per=1,
                               mutate=False)
    # append a garbage read: random sequence of the same length
    ref_len = len(A5) + 12 + len(TARGET) + len(A3)
    with gzip.open(fq, "at") as fh:
        garbage = rand_seq(ref_len)
        fh.write(f"@garbage\n{garbage}\n+\n{'I' * ref_len}\n")
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "o.bam"
    stats = align_reads(layout, rm, str(out), read1=fq, batch_size=8,
                        engine="wfa")
    assert stats.aligned == 2
    names = {r.name for r in read_bam(str(out))}
    assert "garbage" in names


def test_wfa_aligner_adaptive_retry_and_mem_cap(monkeypatch):
    """WfaAligner unit paths: (a) a tiny initial score ceiling forces the
    adaptive 2x-retry loop; (b) a tiny CLIQUE_WFA_MEM_BUDGET forces the
    per-chunk dispatch split. Both must reproduce the unconstrained
    engine's CIGARs and scores exactly (wavefront_heuristic.o score-cutoff
    role, SURVEY 2.9)."""
    from clique_tpu.align.wavefront import WfaAligner

    rng = np.random.default_rng(5)
    L = 150
    pairs = []
    for _ in range(40):
        ref = rng.choice(BASES, L).tobytes()
        read = bytearray(ref)
        for p in rng.choice(L, 6, replace=False):   # ~4% divergence
            read[p] = BASES[rng.integers(4)]
        pairs.append((ref, bytes(read)))
    refs = [p[0] for p in pairs]
    reads = [p[1] for p in pairs]

    base = WfaAligner().align_pairs(refs, reads)
    assert all(r is not None for r in base)

    retry = WfaAligner(s0=2).align_pairs(refs, reads)
    for b, r in zip(base, retry):
        assert b[2] == r[2] and b[3] == r[3]

    monkeypatch.setenv("CLIQUE_WFA_MEM_BUDGET", str(1 << 19))  # 512KB
    # (the packed bitmap tables shrank the footprint ~4x in r4;
    # the budget here is sized so it still binds at B=64)
    capped_engine = WfaAligner()
    assert capped_engine._mem_cap(L, 64) == 32  # budget actually binds
    capped = capped_engine.align_pairs(refs, reads)
    for b, r in zip(base, capped):
        assert b[2] == r[2] and b[3] == r[3]

    # a budget below one floor chunk forces one-chunk-per-wave dispatch
    # (the HBM-bounded wave loop); output must still match exactly
    monkeypatch.setenv("CLIQUE_WFA_MEM_BUDGET", str(1 << 16))  # 64KB
    waved = WfaAligner().align_pairs(refs, reads)
    for b, r in zip(base, waved):
        assert b[2] == r[2] and b[3] == r[3]


def test_wfa_aligner_routes_ultra_long_pairs_to_dp_fallback():
    """Pairs wider than the i16 run table (~32.7kb padded) must never
    reach the wavefront kernels (run lengths would wrap negative); they
    go straight to the exact-DP fallback while normal pairs in the same
    call still take the WFA path."""
    from clique_tpu.align.wavefront import WfaAligner

    class FakeDP:
        def __init__(self):
            self.seen = []

        def align_pairs(self, refs, reads):
            self.seen.extend(refs)
            return [(r, d, [(len(r), "M")], 1.0)
                    for r, d in zip(refs, reads)]

    rng = np.random.default_rng(9)
    long_seq = rng.choice(BASES, 33000).tobytes()
    dp = FakeDP()
    engine = WfaAligner(dp_fallback=dp)
    out = engine.align_pairs([long_seq, b"ACGTACGT"],
                             [long_seq, b"ACGAACGT"])
    assert engine.fallbacks == 1 and dp.seen == [long_seq]
    assert out[0][3] == 1.0               # fallback result in place
    assert out[1][2] == [(8, "M")]        # short pair aligned by WFA


def test_convex_engine_end_to_end(tmp_path):
    """`align_reads(engine="convex")`: dual-affine wavefront engine as a
    product path — tags match the DP engine, and a read carrying a long
    structural deletion keeps it as ONE deletion run (the class-2 gap
    slope) in the written CIGAR."""
    layout, fq = build_dataset(tmp_path)
    rm = ReferenceManager.from_layout(layout)

    dp_bam = tmp_path / "dp.bam"
    align_reads(layout, rm, str(dp_bam), read1=fq, batch_size=8,
                engine="dp")
    cx_bam = tmp_path / "cx.bam"
    align_reads(layout, rm, str(cx_bam), read1=fq, batch_size=8,
                engine="convex")

    dp = {r.name: r for r in read_bam(str(dp_bam))}
    cx = {r.name: r for r in read_bam(str(cx_bam))}
    assert set(dp) == set(cx) and dp
    for name in dp:
        assert cx[name].seq == dp[name].seq
        assert cx[name].tags["e0"] == dp[name].tags["e0"], name
        assert float(cx[name].tags["as"]) <= 0


def test_convex_engine_structural_deletion(tmp_path):
    """A 40bp dropout aligns as a single 40D run under --engine convex
    (pays o2 + n*e2), not fragmented."""
    import gzip as _gzip

    layout_path = tmp_path / "layout.yaml"
    amp = A5 + "0" * 12 + TARGET + rand_seq(60) + A3
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{amp}"
    umi_configurations:
      umi:
        symbol: '0'
        sort_type: "DegenerateTag"
        length: 12
        order: 0
        max_distance: 2
""")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    umi = rand_seq(12)
    full = A5 + umi + TARGET + amp[len(A5) + 12 + len(TARGET):]
    cut = len(A5) + 12 + len(TARGET) + 8
    read = full[:cut] + full[cut + 40:]
    fq = tmp_path / "r.fastq.gz"
    with _gzip.open(fq, "wt") as fh:
        fh.write(f"@sv0\n{read}\n+\n{'I' * len(read)}\n")
    out = tmp_path / "cx.bam"
    align_reads(layout, rm, str(out), read1=str(fq), batch_size=8,
                engine="convex")
    (rec,) = read_bam(str(out))
    dels = [(n, op) for n, op in rec.cigar if op == "D"]
    assert dels == [(40, "D")]
    assert rec.tags["e0"] == umi


def test_long_pair_routing_respects_bialign_quantized_cap():
    """Regression: a pair whose RAW length passes a `< 32768` check but
    whose 128-quantized length hits the bialign split-encoding cap (raw
    32641..32767 -> quantized 32768) must NOT route to the bialign
    driver — _mid_split_batch rejects it with ValueError before any
    kernel dispatch. Pins both halves of the contract: the routing
    predicate and the split driver's early raise. (The end-to-end
    32.7kbp align_pairs repro passes but costs minutes of L=32768
    compiles; the predicate is the complete guard condition.)"""
    import pytest as _pytest

    from clique_tpu.align.wavefront import (
        _MID_ENC,
        _bialign_len_ok,
        wfa_bialign_affine_pairs,
    )

    assert _bialign_len_ok(32640)          # quantized 32640 < 32768
    assert _bialign_len_ok(1)
    assert not _bialign_len_ok(32641)      # quantizes UP to 32768
    assert not _bialign_len_ok(32700)      # the reproduced crash length
    assert not _bialign_len_ok(_MID_ENC)
    # the split driver refuses (early, pre-dispatch) exactly where the
    # predicate says it would
    with _pytest.raises(ValueError, match="bialign split encoding"):
        wfa_bialign_affine_pairs([b"A" * 32700], [b"A" * 32700])


def test_wfa_adaptive_trim_matches_exact():
    """wf-adaptive dynamic trim (wavefront_heuristic.o's wfadaptive,
    VERDICT r4 item 6): with a generous margin the trimmed engine's
    results are identical to the exact engine on low-divergence pairs;
    with a hostile margin, trimmed-out SV pairs CENSOR and the
    escalation retries them untrimmed, so end-to-end results still equal
    the exact engine's (only cost changes)."""
    from clique_tpu.align.wavefront import WfaAligner

    rng = np.random.default_rng(9)
    L = 200
    refs, reads = [], []
    for i in range(24):
        ref = rng.choice(BASES, L).tobytes()
        read = bytearray(ref)
        for p in rng.choice(L, 4, replace=False):
            read[p] = BASES[rng.integers(4)]
        if i % 3 == 0:
            # 40bp structural deletion - the case a tight trim starves
            start = 60 + int(rng.integers(40))
            del read[start:start + 40]
        refs.append(ref)
        reads.append(bytes(read))

    for model in ("affine", "affine2p"):
        base = WfaAligner(model=model).align_pairs(refs, reads)
        assert all(r is not None for r in base)
        for margin in (64, 2):
            trimmed = WfaAligner(model=model,
                                 adaptive=margin).align_pairs(refs, reads)
            for b, r in zip(base, trimmed):
                assert b[2] == r[2] and b[3] == r[3], (model, margin)


def test_wfa_adaptive_kernel_trim_censors_sv():
    """Kernel-level check that the trim actually trims: a tight margin
    censors a long-deletion pair at the first ceiling (the target
    diagonal is starved), while the untrimmed kernel finishes it."""
    from clique_tpu.align.wavefront import wfa_affine_tb_batch

    rng = np.random.default_rng(11)
    L = 160
    ref = rng.choice(BASES, L).tobytes()
    read = ref[:60] + ref[100:]           # clean 40bp deletion
    a = np.zeros((32, L), np.uint8)
    b = np.zeros((32, L), np.uint8)
    a[0, :len(ref)] = np.frombuffer(ref, np.uint8)
    b[0, :len(read)] = np.frombuffer(read, np.uint8)
    la = np.zeros(32, np.int32)
    lb = np.zeros(32, np.int32)
    la[0], lb[0] = len(ref), len(read)
    smax = 96
    s_exact, _ops = wfa_affine_tb_batch(a, b, la, lb, n1=L, n2=L,
                                        smax=smax, x=4, o=6, e=2)
    s_trim, _ops = wfa_affine_tb_batch(a, b, la, lb, n1=L, n2=L,
                                       smax=smax, x=4, o=6, e=2,
                                       adaptive=2)
    assert int(np.asarray(s_exact)[0]) <= smax       # exact finishes
    assert int(np.asarray(s_trim)[0]) == smax + 1    # trim censors
