"""Property-based round-trip tests (hypothesis) — the systematic
batch-boundary/content fuzzing the reference does with its size sweeps
(operation_testing.h:36-66), generalized to arbitrary content."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from supersonic_spark.codecs import decode_column, encode_column
from supersonic_spark.codecs.bitutil import (pack_ints_block, pack_uints,
                                             unpack_ints_block, unpack_uints,
                                             zigzag_decode, zigzag_encode)
from supersonic_spark.selector import choose_codec

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=300))
def test_pack_ints_block_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    out, _ = unpack_ints_block(pack_ints_block(arr))
    assert np.array_equal(out, arr)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1),
                max_size=300))
def test_pack_ints_block_int32_roundtrip(vals):
    arr = np.array(vals, dtype=np.int32)
    out, _ = unpack_ints_block(pack_ints_block(arr))
    assert np.array_equal(out, arr.astype(np.int64))


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=64),
       st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_pack_uints_roundtrip(width, vals):
    vals = [v & ((1 << width) - 1) if width else 0 for v in vals]
    arr = np.array(vals, dtype=np.uint64)
    out = unpack_uints(pack_uints(arr, width), len(arr), width)
    assert np.array_equal(out, arr)


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=100))
def test_zigzag_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(zigzag_decode(zigzag_encode(arr)), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=50)), max_size=100))
def test_string_codecs_roundtrip(vals):
    arr = pa.array(vals, type=pa.string())
    for codec in ["plain", "dict", "rle", "fsst", "tokdict"]:
        buf = encode_column(arr, codec)
        out, used = decode_column(buf)
        assert used == len(buf)
        assert out.equals(arr), f"{codec} failed on {vals[:5]}..."


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.none(), I64), max_size=100))
def test_int_codecs_roundtrip(vals):
    arr = pa.array(vals, type=pa.int64())
    for codec in ["plain", "dict", "rle", "for_bitpack", "delta_bitpack"]:
        buf = encode_column(arr, codec)
        out, used = decode_column(buf)
        assert used == len(buf)
        assert out.equals(arr), f"{codec} failed"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)), max_size=200))
def test_selector_choice_roundtrips(vals):
    """Whatever the selector picks must round-trip bit-identically."""
    arr = pa.array(vals, type=pa.string())
    codec, _stats = choose_codec(arr)
    out, _ = decode_column(encode_column(arr, codec))
    assert out.equals(arr), f"selector chose {codec} which corrupted data"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.binary(max_size=60), max_size=80))
def test_binary_fsst_roundtrip(vals):
    arr = pa.array(vals, type=pa.binary())
    out, _ = decode_column(encode_column(arr, "fsst"))
    assert out.equals(arr)
