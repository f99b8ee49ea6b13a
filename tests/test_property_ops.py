"""Property-based tests (hypothesis) for the session-2 operators'
pure-python kernels — no Spark session, millisecond-fast."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from azuresearchcrawlervector_spark.operators.hll import (
    estimate_from_registers, register_update,
)
from azuresearchcrawlervector_spark.operators.pq import quantize_py

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
values = st.lists(words, min_size=0, max_size=300)


@given(values, values)
@settings(max_examples=100)
def test_hll_register_merge_is_union(a, b):
    # folding a then b into one array == elementwise max of the two
    # separate arrays (the mergeability the Spark/streaming ops rely on)
    both = bytearray(256)
    for v in a + b:
        register_update(both, v)
    ra, rb = bytearray(256), bytearray(256)
    for v in a:
        register_update(ra, v)
    for v in b:
        register_update(rb, v)
    assert bytes(both) == bytes(bytearray(max(x, y) for x, y in zip(ra, rb)))


@given(values)
@settings(max_examples=100)
def test_hll_duplicate_insensitive_and_monotone(vs):
    # duplicates never change the sketch; adding a value never lowers
    # any register
    once = bytearray(256)
    for v in vs:
        register_update(once, v)
    twice = bytearray(256)
    for v in vs + vs:
        register_update(twice, v)
    assert bytes(once) == bytes(twice)
    grown = bytearray(once)
    register_update(grown, "extra-value")
    assert all(g >= o for g, o in zip(grown, once))
    assert estimate_from_registers(grown) >= 0.0


@given(st.lists(st.integers(0, 53), min_size=256, max_size=256))
@settings(max_examples=100)
def test_hll_estimate_total_and_positive(regs):
    est = estimate_from_registers(regs)
    assert est >= 0.0
    # empty sketch estimates zero distinct (linear counting of p zeros)
    assert estimate_from_registers([0] * 256) == 0.0


@given(st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False, allow_infinity=False))
@settings(max_examples=300)
def test_quantize_py_half_away_and_bounded(x):
    q = quantize_py(x)
    # |round error| <= 0.5 fixed-point units
    assert abs(q - x * 1000) <= 0.5 + 1e-6
    # sign symmetry: round-half-away-from-zero
    assert quantize_py(-x) == -q
