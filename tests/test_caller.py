"""Caller tests: grammar transcribed from the reference
(python_package/tests/test_callers.py) + event-calling tests for the
completed caller the reference only sketches."""

import pytest

from clique_tpu.caller.events import (
    Event,
    EventCaller,
    EventCigar,
    Target,
    TargetType,
    reverse_comp,
)


# --- TargetType (test_callers.py:10-47) ------------------------------------

def test_cas9_dsb():
    t = TargetType.CAS9_DSB
    assert t.length() == 23
    assert t.validate_sequence("ACGTAACGTAACGTAACGTACGG") is True
    assert t.validate_sequence("ACGTAACGTAACGTAACGTACAT") is False
    assert t.validate_sequence("CCGTAACGTAACGTAACGTACAT") is True


def test_cas12a():
    t = TargetType.CAS12A_DSB
    assert t.length() == 24
    assert t.validate_sequence("TTTACGTAACGTAACGTAACGTAC") is True
    assert t.validate_sequence("ACGTAACGTAACGTAACGTACAAT") is False
    assert t.validate_sequence("TTAACGTAACGTAACGTACATAAA") is True


def test_cas9_pal_abe():
    t = TargetType.CAS9_PAL_ABE
    assert t.length() == 26
    assert t.validate_sequence("CCAAAAAATTTTTAAAAATTTTTCGG") is True
    assert t.validate_sequence("CAAAAAAATTTTTAAAAATTTTTCGG") is False
    assert t.validate_sequence("CCAAAAAATTTTTAAAAATTTTTCGA") is False


# --- EventCigar / Event grammar (test_callers.py:50-110) --------------------

def test_event_cigar_parse():
    assert EventCigar.from_str("D") == EventCigar.D
    assert EventCigar.from_str("d") == EventCigar.D
    assert EventCigar.from_str("NonE") == EventCigar.NONE
    assert EventCigar.from_str("UnKNOWN") == EventCigar.UNKNOWN
    assert EventCigar.from_str("wt") == EventCigar.WT
    for bad in ("e", "DD", "II", "iI", "notathing"):
        with pytest.raises(TypeError):
            EventCigar.from_str(bad)


def test_event_parse():
    assert Event.parse_event_string("5D+100") == \
        [Event(EventCigar.D, 5, 100, None)]
    assert Event.parse_event_string("4I+10+AAAA") == \
        [Event(EventCigar.I, 4, 10, "AAAA")]
    assert Event.parse_event_string("5S+120+TTTTT") == \
        [Event(EventCigar.S, 5, 120, "TTTTT")]
    assert Event.parse_event_string("NONE") == \
        [Event(EventCigar.NONE, None, -1, None)]
    assert Event.parse_event_string("5D+5&WT") == \
        [Event(EventCigar.D, 5, 5, None), Event(EventCigar.WT, None, -1, None)]
    for bad in ("5I+100", "5I+100+A", "5S+100+A", "5D", "5S", "AS",
                "5I+100+AZ"):
        with pytest.raises(TypeError):
            Event.parse_event_string(bad)
    with pytest.raises(ValueError):
        Event.parse_event_string("WT+5")


def test_event_roundtrip():
    for s in ("5D+100", "4I+10+AAAA", "5S+120+TTTTT", "NONE", "WT",
              "UNKNOWN"):
        [ev] = Event.parse_event_string(s)
        assert str(ev) == s


def test_reverse_comp():
    assert reverse_comp("AAAAaaaa") == "ttttTTTT"
    assert reverse_comp("AAAAzzzZ") == "NnnnTTTT"
    assert reverse_comp("ACGTAacgt") == "acgtTACGT"


# --- target discovery + overlap (test_callers.py:131-175) ------------------

def test_find_targets_in_reference():
    target = Target("ACGTAACGTAACGTAACGTACGG", TargetType.CAS9_DSB)
    ec = EventCaller(
        "ACGTAACGTAACGTAACGTACGGAAAACGTAACGTAACGTAACGTACGGAAA", [target])
    assert len(ec.target_locations) == 1
    assert len(ec.target_locations[target]) == 2


def test_overlapping_targets():
    t1 = Target("ACGTAACGTAACGTAACGTACGG", TargetType.CAS9_DSB)
    t2 = Target("ACGTAACGTAACGTAACGTTAAAA", TargetType.CAS12A_DSB)
    ec = EventCaller(
        "ACGTAACGTAACGTAACGTACGGACGTAACGTAACGTAACGTTAAAAAAAACGTAACGTAACGTAACGTACGGAAACCGTACGTTACGTTACGTTACGT",
        [t1, t2])
    assert ec.overlapping_targets(10, 20) is True
    assert ec.overlapping_targets(30, 40) is True
    assert ec.overlapping_targets(47, 49) is False
    assert ec.overlapping_targets(45, 50) is True
    assert ec.overlapping_targets(75, 80) is False


# --- completed event calling ------------------------------------------------

REF = "CCGG" + "ACGTAACGTAACGTAACGTACGG" + "TTTTGGGG"
# target at position 4; CAS9 forward window [14,19] -> ref positions 18..23


def _caller():
    target = Target("ACGTAACGTAACGTAACGTACGG", TargetType.CAS9_DSB,
                    rc_valid=False)
    return EventCaller(REF, [target])


def test_call_no_edit_is_none():
    ec = _caller()
    assert ec.call_events(REF, REF) == "NONE"


def test_call_deletion_in_window():
    ec = _caller()
    # delete ref positions 18-20 (inside window 18..23)
    read = REF[:18] + "---" + REF[21:]
    allele = ec.call_events(REF, read)
    assert allele == "3D+18"


def test_call_deletion_outside_window():
    ec = _caller()
    read = REF[:1] + "--" + REF[3:]  # positions 1-2, outside window
    assert ec.call_events(REF, read) == "NONE"


def test_call_insertion_in_window():
    ec = _caller()
    aligned_ref = REF[:20] + "--" + REF[20:]
    read = REF[:20] + "TT" + REF[20:]
    allele = ec.call_events(aligned_ref, read)
    assert allele == "2I+20+TT"


def test_call_uncovered_is_unknown():
    ec = _caller()
    # read covers only the first 10 reference bases
    read = REF[:10] + "-" * (len(REF) - 10)
    assert ec.call_events(REF, read) == "UNKNOWN"


def test_call_compound_events():
    ec = _caller()
    # deletion at 18-19 and insertion at 22 both in window
    aligned_ref = REF[:22] + "-" + REF[22:]
    read = REF[:18] + "--" + REF[20:22] + "A" + REF[22:]
    allele = ec.call_events(aligned_ref, read)
    assert allele == "2D+18&1I+22+A"


def test_call_multi_target_string():
    t = Target("ACGTAACGTAACGTAACGTACGG", TargetType.CAS9_DSB,
               rc_valid=False)
    ref2 = REF + "AAAA" + "ACGTAACGTAACGTAACGTACGG" + "TT"
    ec = EventCaller(ref2, [t])
    # two occurrences -> two '_'-joined fields; edit only the first window
    read = ref2[:18] + "---" + ref2[21:]
    assert ec.call_events(ref2, read) == "3D+18_NONE"
