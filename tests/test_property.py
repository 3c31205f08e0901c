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


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=8, max_value=64), st.data())
def test_pack_uints_sliced_matches_container(width, data):
    from supersonic_spark.codecs.bitutil import (pack_uints_sliced,
                                                 unpack_uints_sliced)
    vals = np.array(
        data.draw(st.lists(st.integers(min_value=0,
                                       max_value=(1 << width) - 1),
                           max_size=200)), dtype=np.uint64)
    if len(vals) == 0:
        return
    sliced = pack_uints_sliced(vals, width)
    # identical total size to the container layout, identical values back
    assert len(sliced) == len(pack_uints(vals, width))
    assert np.array_equal(unpack_uints_sliced(sliced, len(vals), width), vals)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_decode_block_projection_property(data):
    from supersonic_spark.codecs import decode_block, encode_block
    from supersonic_spark.selector import choose_codecs
    n = data.draw(st.integers(min_value=1, max_value=120))
    tbl = pa.table({
        "a": pa.array(data.draw(st.lists(I64, min_size=n, max_size=n)),
                      pa.int64()),
        "b": pa.array(data.draw(st.lists(
            st.text(max_size=12), min_size=n, max_size=n)), pa.string()),
        "c": pa.array(data.draw(st.lists(
            st.floats(allow_nan=False), min_size=n, max_size=n)),
            pa.float64()),
    })
    buf = encode_block(tbl, choose_codecs(tbl))
    cols = data.draw(st.lists(st.sampled_from(["a", "b", "c"]),
                              min_size=1, max_size=3, unique=True))
    out, used = decode_block(buf, columns=cols)
    assert used == len(buf)
    assert set(out.column_names) == set(cols)
    for c in cols:
        assert out.column(c).combine_chunks().equals(
            tbl.column(c).combine_chunks()), c


@given(st.lists(
    st.one_of(st.none(),
              st.lists(st.floats(width=32, allow_nan=True,
                                 allow_infinity=True),
                       max_size=24)),
    max_size=80))
@settings(max_examples=60, deadline=None)
def test_vec_bss_roundtrip_property(vecs):
    """Property: any list<float32> column (NULL vectors, empty vectors,
    varying lengths, NaN/Inf/-0.0) round-trips BIT-exactly through the
    vec_bss block path."""
    import numpy as np
    import pyarrow as pa
    from supersonic_spark.codecs import decode_block, encode_block
    from supersonic_spark.selector import choose_codecs
    arr = pa.array(vecs, pa.list_(pa.float32()))
    tbl = pa.table({"v": arr})
    out, _ = decode_block(encode_block(tbl, choose_codecs(tbl),
                                       entropy="lz4"))
    b = out.column("v").combine_chunks()
    assert len(b) == len(arr)
    for i in range(len(arr)):
        if not arr[i].is_valid:
            assert not b[i].is_valid
    raw_a = np.asarray(arr.drop_null().flatten(), dtype="<f4").tobytes()
    raw_b = np.asarray(b.drop_null().flatten(), dtype="<f4").tobytes()
    assert raw_a == raw_b
