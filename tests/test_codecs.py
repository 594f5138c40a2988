"""Codec goldens ported 1:1 from the reference unit tests
(VariableByteCompressorTest.java:10-21, UnaryCompressorTest.java:11-22)
plus property-based round-trips."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from searchengine_spark.functions.codecs import (
    gaps_decode,
    gaps_encode,
    unary_decode,
    unary_encode,
    vb_decode,
    vb_encode,
)


def test_vb_goldens():
    assert vb_encode([5]) == bytes([0x85])
    assert vb_encode([824]) == bytes([0x06, 0xB8])
    assert vb_encode([824, 5]) == bytes([0x06, 0xB8, 0x85])
    assert vb_encode([0]) == bytes([0x00])  # reference quirk


def test_vb_roundtrip_goldens():
    assert list(vb_decode(bytes([0x06, 0xB8, 0x85]), 2)) == [824, 5]
    assert list(vb_decode(vb_encode([1, 127, 128, 16383, 16384, 2**31 - 1]), 6)) == [
        1, 127, 128, 16383, 16384, 2**31 - 1,
    ]


def test_vb_power_of_128_boundaries():
    vals = [1, 127, 128, 129, 128**2 - 1, 128**2, 128**3 - 1, 128**3, 128**4]
    assert list(vb_decode(vb_encode(vals), len(vals))) == vals


def test_vb_widths_exact_to_int64_max():
    # A float log128 fails twice at the extremes: it rounds UP at the
    # ulp-band just below 128**8 (emitting a phantom leading 0x00), and
    # its power-of-128 bump guard overflows int64 at 128**9 == 2**63
    # (width 10 for every value >= 128**8). The exact searchsorted
    # widths must match the encoder's real byte output AND the DuckDB
    # oracle's 9-way CASE for every int64.
    from searchengine_spark.functions.codecs import _vb_widths

    cases = {
        128**7 - 1: 7, 128**7: 8, 128**8 - 1: 8, 128**8: 9,
        10**17: 9, 2**62: 9, 2**63 - 1: 9,
    }
    for v, want in cases.items():
        got = int(_vb_widths(np.array([v], dtype=np.int64))[0])
        assert got == want, (v, got, want)
        enc = vb_encode([v])
        assert len(enc) == want, (v, len(enc), want)
        assert list(vb_decode(enc, 1)) == [v]


def test_unary_goldens():
    assert unary_encode([32]) == bytes([0xFF, 0xFF, 0xFF, 0xFE])
    assert unary_encode([3, 5, 11, 1, 6]) == bytes([0xDE, 0xFF, 0xCF, 0x80])
    assert unary_encode([1, 2, 1, 1, 3]) == bytes([0x46])


def test_unary_roundtrip_goldens():
    assert list(unary_decode(bytes([0x46]), 5)) == [1, 2, 1, 1, 3]
    assert list(unary_decode(unary_encode([3, 5, 11, 1, 6]), 5)) == [3, 5, 11, 1, 6]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200))
def test_vb_roundtrip_property(vals):
    # skip the 0-quirk in round-trip (0 encodes unterminated, like reference)
    vals = [v if v > 0 else 1 for v in vals]
    assert list(vb_decode(vb_encode(vals), len(vals))) == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=200))
def test_unary_roundtrip_property(vals):
    assert list(unary_decode(unary_encode(vals), len(vals))) == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**40), min_size=1, max_size=100, unique=True))
def test_gap_roundtrip(vals):
    vals = sorted(vals)
    assert list(gaps_decode(gaps_encode(vals))) == vals


def test_empty_arrays():
    assert vb_encode([]) == b""
    assert unary_encode([]) == b""
    assert list(vb_decode(b"", 0)) == []
    assert list(unary_decode(b"", 0)) == []
    assert list(gaps_encode(np.array([], dtype=np.int64))) == []
