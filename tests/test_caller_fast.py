"""call_events_fast == call_events on randomized gapped pairs.

The vectorized caller (numpy run detection) must emit byte-identical
allele strings to the reference-shaped per-column walk
(callers.py:276-356 semantics) across deletions, insertions,
substitution runs (base-editor targets), partial coverage, and
case/N handling.
"""

import numpy as np
import pytest

from clique_tpu.caller.events import EventCaller, Target, TargetType

BASES = "ACGT"


def _mutate(rng, ref: str):
    """Random gapped pair over ref: subs, deletion runs, insertion runs,
    and clipped (uncovered) flanks."""
    a_ref = []
    a_read = []
    i = 0
    n = len(ref)
    while i < n:
        roll = rng.random()
        if roll < 0.03:         # deletion run
            run = int(rng.integers(1, 6))
            for _ in range(min(run, n - i)):
                a_ref.append(ref[i])
                a_read.append("-")
                i += 1
        elif roll < 0.06:       # insertion run
            run = int(rng.integers(1, 4))
            for _ in range(run):
                a_ref.append("-")
                a_read.append(BASES[rng.integers(4)])
        elif roll < 0.12:       # substitution (sometimes N / lowercase)
            b = ref[i]
            choices = [c for c in BASES if c != b] + ["N", "a"]
            a_ref.append(ref[i])
            a_read.append(choices[rng.integers(len(choices))])
            i += 1
        else:
            a_ref.append(ref[i])
            a_read.append(ref[i])
            i += 1
    # uncovered flanks
    lead = int(rng.integers(0, 8))
    tail = int(rng.integers(0, 8))
    for k in range(lead):
        if k < len(a_read):
            a_read[k] = "-"
    for k in range(tail):
        if k < len(a_read):
            a_read[-1 - k] = "-"
    return "".join(a_ref), "".join(a_read)


@pytest.mark.parametrize("target_type",
                         [TargetType.CAS9_DSB, TargetType.CAS9_ABE])
def test_fast_matches_walk(target_type):
    rng = np.random.default_rng(7)
    guides = ["".join(BASES[rng.integers(4)] for _ in range(20)) + "TGG"
              for _ in range(4)]
    ref = "AATTCC" + "GAAA".join(guides) + "CCGGTT"
    targets = [Target(g, target_type, validate=False) for g in guides]
    caller = EventCaller(ref, targets)

    for _ in range(300):
        a_ref, a_read = _mutate(rng, ref)
        want = caller.call_events(a_ref, a_read)
        got = caller.call_events_fast(a_ref.encode(), a_read.encode())
        assert got == want, (a_ref, a_read)


def test_allele_memo_matches_uncached(tmp_path):
    """The non-sub allele memo in call_events_from_records gives the same
    rows as per-record calling: records sharing a CIGAR but differing in
    substituted bases memo-hit safely (subs don't enter non-sub alleles),
    and base-editor panels bypass the memo entirely."""
    from clique_tpu.caller.events import call_events_from_records
    from clique_tpu.config.layout import SequenceLayout
    from clique_tpu.io.sam import SamRecord

    rng = np.random.default_rng(3)
    guide = "".join(BASES[rng.integers(4)] for _ in range(20)) + "TGG"
    ref = "AATTCCGG" + guide + "CCGGTTAA"
    for ttype, differs in (("Cas9WT", False), ("Cas9ABE", True)):
        lp = tmp_path / f"l_{ttype}.yaml"
        lp.write_text(f"""known_strand: true
reads:
  - !Read1
    orientation: Forward
references:
  amp:
    sequence: "{ref}"
    targets: ["{guide}"]
    target_types: ["{ttype}"]
    umi_configurations: {{}}
""")
        layout = SequenceLayout.from_yaml(str(lp))
        L = len(ref)
        cut = 8 + 14
        seq_del = (ref[:cut] + ref[cut + 3:]).encode()
        cigar = [(cut, "M"), (3, "D"), (L - cut - 3, "M")]
        # same cigar, different substituted base inside the window
        seq_sub = bytearray(seq_del)
        seq_sub[cut - 2] = ord("A") if seq_sub[cut - 2] != ord("A") \
            else ord("C")
        recs = [
            SamRecord(name="r0", flag=0, reference_name="amp", pos=1,
                      mapq=255, cigar=cigar, seq=seq_del,
                      qual=b"H" * len(seq_del), tags={"rm": "1", "rc": "2"}),
            SamRecord(name="r1", flag=0, reference_name="amp", pos=1,
                      mapq=255, cigar=cigar, seq=bytes(seq_sub),
                      qual=b"H" * len(seq_sub), tags={"rm": "1", "rc": "2"}),
        ]
        out = tmp_path / f"a_{ttype}.tsv"
        call_events_from_records(layout, recs, str(out),
                                 min_alignment_rate=0.0, min_read_count=1)
        lines = out.read_text().strip().splitlines()[1:]
        alleles = [ln.split("\t")[2] for ln in lines]
        # ground truth per record through the walk
        from clique_tpu.caller.events import _build_callers
        from clique_tpu.extract.extractor import recover_aligned_sequences

        caller = _build_callers(layout)["amp"]
        want = []
        for rec in recs:
            ar, rf = recover_aligned_sequences(
                rec.seq, rec.pos, rec.cigar, ref.encode(), soft_clip="Clip")
            want.append(caller.call_events(rf.decode(), ar.decode()))
        assert alleles == want
        if differs:
            assert alleles[0] != alleles[1], \
                "ABE panel should see the substitution"


def test_fast_empty_coverage():
    ref = "ACGTACGTACGTACGTACGTTGGAAAA"
    t = Target(ref[:23], TargetType.CAS9_DSB, validate=False)
    caller = EventCaller(ref, [t])
    a_ref = ref
    a_read = "-" * len(ref)
    assert caller.call_events_fast(a_ref.encode(), a_read.encode()) == \
        caller.call_events(a_ref, a_read)
