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


def test_fast_empty_coverage():
    ref = "ACGTACGTACGTACGTACGTTGGAAAA"
    t = Target(ref[:23], TargetType.CAS9_DSB, validate=False)
    caller = EventCaller(ref, [t])
    a_ref = ref
    a_read = "-" * len(ref)
    assert caller.call_events_fast(a_ref.encode(), a_read.encode()) == \
        caller.call_events(a_ref, a_read)
