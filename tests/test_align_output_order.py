"""Output-order invariant of align_reads: BAM records come out in input
order even when deferred fast-path flushes interleave with non-deferred
emissions (anchored long reads / merge groups) — emit paths drain the
deferred queue first."""

import gzip

import numpy as np

from clique_tpu.align.pipeline import align_reads
from clique_tpu.config.layout import SequenceLayout
from clique_tpu.io.sam import BamReader
from clique_tpu.reference.manager import ReferenceManager


def test_mixed_short_long_reads_keep_input_order(tmp_path):
    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    ref = rng.choice(bases, 160).tobytes().decode()
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
    umi_configurations: {{}}
""")
    fq = tmp_path / "reads.fastq.gz"
    # flush threshold = batch_size * 8 = 16: reads 0-15 (all short) form
    # flush 1 (DEFERRED fast path); reads 16-23 include a long read at
    # 20, so flush 2 takes the non-deferred anchored-emission path —
    # without the emit-side drain, flush 2's records would land BEFORE
    # flush 1's
    with gzip.open(fq, "wt") as fh:
        for i in range(24):
            read = ref if i == 20 else ref[:120]
            fh.write(f"@q{i:03d}\n{read}\n+\n{'I' * len(read)}\n")

    layout = SequenceLayout.from_yaml(str(layout_path))
    rm = ReferenceManager.from_layout(layout)
    out = tmp_path / "a.bam"
    align_reads(layout, rm, str(out), read1=str(fq), batch_size=2,
                anchored_min_length=140, min_read_length=10)
    with BamReader(str(out)) as reader:
        names = [r.name for r in reader]
    # flush order preserved; within a mixed flush, anchored reads emit
    # after that flush's batched reads (long-standing within-flush rule)
    want = [f"q{i:03d}" for i in range(20)] + ["q021", "q022", "q023",
                                              "q020"]
    assert names == want
