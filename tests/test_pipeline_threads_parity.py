"""Byte-parity across the align writer-pipeline thread layouts.

The align pipeline can run its post-device work in several thread
configurations (reference behavior spec: alignment_functions.rs:63-257
drives one rayon worker per read; our pipeline is stage-threaded
instead): the default drain-thread + sink-thread layout, the round-4
deferred-drain-on-main-thread layout (CLIQUE_TPU_DRAIN_THREAD=0), and
inline sink consumption on the build thread (CLIQUE_TPU_SINK_THREAD=0).
All must produce byte-identical artifacts — thread layout is a
scheduling choice, never a semantics one. The baseline run PINS both
knobs to their defaults (ambient env must not leak in: a shell with
CLIQUE_TPU_DRAIN_THREAD=0 exported would otherwise make every variant
identical and the test vacuous)."""

import gzip

import numpy as np
import pytest

from clique_tpu.config.layout import SequenceLayout
from clique_tpu.reference.manager import ReferenceManager


@pytest.fixture()
def dataset(tmp_path):
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    a5 = "TTCAGACGTGTGCTCTTCCGATCT"
    a3 = "AGATCGGAAGAGCACACGTCTGAA"
    core = rng.choice(bases, 60).tobytes().decode()
    ref = f"{a5}{'0' * 8}{core}{a3}"
    layout_path = tmp_path / "layout.yaml"
    layout_path.write_text(f"""
known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp1:
    sequence: "{ref}"
    targets: []
    target_types: []
    umi_configurations:
      umi: {{symbol: '0', sort_type: "DegenerateTag", length: 8, order: 0, max_distance: 2}}
""")
    fq = tmp_path / "reads.fastq.gz"
    base = ref.replace("0" * 8, "")
    with gzip.open(fq, "wt") as fh:
        for i in range(40):
            umi = rng.choice(bases, 8).tobytes().decode()
            read = list(a5 + umi + core + a3)
            for p in rng.choice(len(read), 3, replace=False):
                read[p] = "ACGT"[rng.integers(4)]
            read = "".join(read)
            fh.write(f"@r{i:03d}\n{read}\n+\n{'I' * len(read)}\n")
    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    return layout, rm, str(fq)


def _payload(path):
    from clique_tpu.io.sam import read_voffset_range

    return read_voffset_range(path, 0)


def _chain(tmp_path, dataset, tag):
    from clique_tpu.chain import run_chain

    layout, rm, fq = dataset
    a = str(tmp_path / f"a_{tag}.bam")
    c = str(tmp_path / f"c_{tag}.bam")
    run_chain(layout, rm, a, c, read1=fq, batch_size=16)
    return _payload(a), _payload(c)


def test_thread_layouts_byte_identical(tmp_path, dataset, monkeypatch):
    # pin the baseline to the shipped defaults (drain + sink threads on)
    # regardless of ambient shell exports
    monkeypatch.setenv("CLIQUE_TPU_DRAIN_THREAD", "1")
    monkeypatch.setenv("CLIQUE_TPU_SINK_THREAD", "1")
    base = _chain(tmp_path, dataset, "default")

    monkeypatch.setenv("CLIQUE_TPU_DRAIN_THREAD", "0")
    no_drain = _chain(tmp_path, dataset, "nodrain")
    assert no_drain == base

    # inline sink consumption on the build thread
    monkeypatch.setenv("CLIQUE_TPU_DRAIN_THREAD", "1")
    monkeypatch.setenv("CLIQUE_TPU_SINK_THREAD", "0")
    inline_sink = _chain(tmp_path, dataset, "inlinesink")
    assert inline_sink == base

    # both fallbacks at once (the round-4 layout)
    monkeypatch.setenv("CLIQUE_TPU_DRAIN_THREAD", "0")
    both_off = _chain(tmp_path, dataset, "bothoff")
    assert both_off == base
