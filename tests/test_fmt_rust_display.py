"""Pin _fmt to Rust f64 `Display` semantics at the edges.

Rust Display (std fmt, via ryu-style shortest round-trip) never emits
scientific notation; the rm/as tags written at reference
alignment_matrix.rs:741-771 go through `format!("{}", x)`. The expected
strings below were derived from Rust's documented Display behavior:
shortest decimal that round-trips, expanded positionally, "-0" for
negative zero, "NaN"/"inf"/"-inf" for specials.
"""

import math

import pytest

from clique_tpu.align.pipeline import _fmt

CASES = [
    (0.0, "0"),
    (-0.0, "-0"),
    (1.0, "1"),
    (290.0, "290"),
    (-5.5, "-5.5"),
    (0.25, "0.25"),
    (0.1, "0.1"),                      # shortest round-trip, not 0.1000000000000000055...
    (1 / 3, "0.3333333333333333"),
    (1e15, "1000000000000000"),
    (1e16, "10000000000000000"),       # Python repr says '1e+16'; Rust expands
    (2.5e16, "25000000000000000"),
    (-1e16, "-10000000000000000"),
    (1e21, "1000000000000000000000"),
    (1e-4, "0.0001"),
    (1.5e-7, "0.00000015"),            # Python repr says '1.5e-07'
    (-1.5e-7, "-0.00000015"),
    (5e-324, "0." + "0" * 323 + "5"),  # smallest subnormal
    (1e300, "1" + "0" * 300),
    (float("nan"), "NaN"),
    (float("inf"), "inf"),
    (float("-inf"), "-inf"),
]


@pytest.mark.parametrize("value,expected", CASES,
                         ids=[e[:24] for _, e in CASES])
def test_fmt_matches_rust_display(value, expected):
    assert _fmt(value) == expected


def test_fmt_round_trips():
    # Every finite rendering must parse back to the identical float.
    for value, _ in CASES:
        if math.isfinite(value):
            s = _fmt(value)
            assert float(s) == value
            assert math.copysign(1.0, float(s)) == math.copysign(1.0, value)
