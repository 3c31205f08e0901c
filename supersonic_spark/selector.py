"""Per-(partition, column) codec auto-selection.

Samples value cardinality, mean run length and byte entropy per column chunk
and picks a codec by decision rules; the choice is recorded in the lineage
manifest. Precedent for cardinality-driven algorithm switching in the
reference: `Distinctness.estimated_distinct_threshold`
(reference: supersonic/proto/specification.proto:33-37).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs.kernels import (
    INT_TYPECODES,
    VARLEN_TYPECODES,
    typecode_of,
)

_SAMPLE_ROWS = 4096


@dataclass
class ColumnStats:
    n: int
    n_distinct: int          # sampled
    mean_run_len: float      # sampled
    byte_entropy: float      # bits/byte, varlen only (sampled)
    sortedness: float        # fraction of non-decreasing steps (ints, sampled)
    delta_bits: int          # bit width of max zigzag delta (ints, sampled)
    range_bits: int          # bit width of (max-min) (ints, sampled)
    pfor_gain: float = 1.0   # est. for_bitpack bits / PFOR-delta bits (ints)


def _sample(arr: pa.Array) -> pa.Array:
    if len(arr) <= _SAMPLE_ROWS:
        return arr
    step = len(arr) // _SAMPLE_ROWS
    return arr.take(np.arange(0, len(arr), step, dtype=np.int64)[:_SAMPLE_ROWS])


def _contig_sample(arr: pa.Array) -> pa.Array:
    """Contiguous mid-chunk window. Run-length / sortedness / adjacent-delta
    stats MUST be measured on contiguous rows — the strided cardinality
    sample destroys run structure (a sorted conv_id column with 16-turn
    runs looks runless at stride 64, mis-selecting fsst over rle)."""
    if len(arr) <= _SAMPLE_ROWS:
        return arr
    start = (len(arr) - _SAMPLE_ROWS) // 2
    return arr.slice(start, _SAMPLE_ROWS)


def column_stats(arr: pa.Array | pa.ChunkedArray) -> ColumnStats:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    dense = arr.drop_null() if arr.null_count else arr
    s = _sample(dense)
    ns = len(s)
    if ns == 0:
        return ColumnStats(n, 0, 0.0, 0.0, 1.0, 0, 0)
    n_distinct = pc.count_distinct(s).as_py()

    typecode = typecode_of(arr.type)
    c = _contig_sample(dense)   # adjacency-sensitive stats
    nc = len(c)
    sortedness, delta_bits, range_bits, entropy = 1.0, 0, 0, 0.0
    pfor_gain = 1.0
    if typecode in INT_TYPECODES:
        v = s.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        # Python-int subtraction: int64 extremes (e.g. INT64_MIN..MAX
        # property inputs) overflow a numpy scalar diff
        range_bits = (int(v.max()) - int(v.min())).bit_length()
        vc = c.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        if nc > 1:
            d = np.diff(vc)
            sortedness = float((d >= 0).mean())
            delta_bits = int(np.abs(d).max()).bit_length() + 1
            changes = int((d != 0).sum()) + 1
            # estimated PFOR-delta bits/value (optimal width + exception
            # cost) vs for_bitpack's range_bits/value
            from .codecs.bitutil import zigzag_encode
            from .codecs.kernels import _bit_lengths, pfor_width_cost
            zz = zigzag_encode(d)
            hist = np.bincount(_bit_lengths(zz), minlength=65)
            _w, cost_bits = pfor_width_cost(hist, nc - 1)
            pfor_per_val = cost_bits / (nc - 1)
            if pfor_per_val > 0:
                pfor_gain = range_bits / pfor_per_val
            elif range_bits > 0:
                pfor_gain = float("inf")
        else:
            changes = 1
        mean_run = nc / changes
    elif typecode in VARLEN_TYPECODES:
        enc = c.combine_chunks().dictionary_encode() \
            if isinstance(c, pa.ChunkedArray) else c.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False)
        changes = int((np.diff(idx) != 0).sum()) + 1 if nc > 1 else 1
        mean_run = nc / changes
        # byte entropy over a bounded sample of the payload
        buf = b"".join(x.as_py().encode("utf-8") if isinstance(x.as_py(), str)
                       else (x.as_py() or b"") for x in s.slice(0, 256))
        if buf:
            counts = np.bincount(np.frombuffer(buf, dtype=np.uint8), minlength=256)
            p = counts[counts > 0] / len(buf)
            entropy = float(-(p * np.log2(p)).sum())
    else:
        # floats/bools: adjacent-equality runs on the raw bit view so the
        # rle branch is reachable for repetitive float columns (and NaN
        # runs count — NaN != NaN at value level but bits are equal)
        v = c.to_numpy(zero_copy_only=False)
        if v.dtype == np.float64:
            bits = v.view(np.uint64)
        elif v.dtype == np.float32:
            bits = v.view(np.uint32)
        else:
            bits = v.astype(np.uint8)
        changes = int((bits[1:] != bits[:-1]).sum()) + 1 if nc > 1 else 1
        mean_run = nc / changes
    return ColumnStats(n, n_distinct, float(mean_run), entropy,
                       sortedness, delta_bits, range_bits, pfor_gain)


def _token_repeat_ratio(dense: pa.Array) -> float:
    """distinct-token / token ratio on a small sample; low = word-level
    symbol table (tokdict) wins over byte-level FSST."""
    s = _sample(dense).slice(0, 512)
    try:
        flat = pc.list_flatten(pc.split_pattern(s, " "))
    except pa.ArrowInvalid:
        return 1.0
    if len(flat) < 32:
        return 1.0
    return pc.count_distinct(flat).as_py() / len(flat)


def _float_trial(dense: pa.Array, typecode: int, entropy: str) -> str:
    """Measured selection for non-fixed-point floats: compress a sample
    under each byte-layout candidate through the entropy backend and keep
    the smallest. All three layouts are bit-exact permutations/involutions,
    so this is purely a size decision."""
    from .codecs.framing import _entropy_codec
    from .codecs.kernels import encode_bss, encode_plain, encode_xor_bss
    s = _sample(dense).slice(0, 1024)
    if len(s) < 64:
        return "plain"
    codec = _entropy_codec(entropy)
    sizes = {
        name: len(codec.compress(enc(s, typecode), asbytes=True))
        for name, enc in (("plain", encode_plain), ("bss", encode_bss),
                          ("xor_bss", encode_xor_bss))
    }
    return min(sizes.items(), key=lambda kv: (kv[1], kv[0]))[0]


def choose_codec(arr: pa.Array | pa.ChunkedArray,
                 stats: ColumnStats | None = None,
                 entropy: str | None = None) -> tuple[str, ColumnStats]:
    """Decision rules -> codec name. Deterministic given the chunk."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        typecode_of(t)   # validates list<float32>; raises otherwise
        # vector columns: one codec (plane-split values + tiny shape
        # header); run/cardinality stats are meaningless on embeddings
        return "vec_bss", ColumnStats(len(arr), len(arr), 1.0, 8.0,
                                      0.0, 0, 0)
    typecode = typecode_of(arr.type)
    st = stats or column_stats(arr)
    dense = arr.drop_null() if arr.null_count else arr
    dense_n = len(dense)

    if dense_n == 0:
        return "plain", st
    if st.n_distinct == 1 and (dense_n <= _SAMPLE_ROWS
                               or pc.count_distinct(dense).as_py() == 1):
        return "constant", st

    if typecode in INT_TYPECODES:
        if st.mean_run_len >= 4.0:
            return "rle", st
        if st.sortedness >= 0.95 and st.delta_bits + 2 < st.range_bits:
            return "delta_bitpack", st
        # heavy-tailed deltas (sorted-within-group data with group-boundary
        # jumps, e.g. conv-sorted ts): patched FOR over deltas beats packing
        # every value at range_bits. Threshold 1.15: conv-sorted ts chunks
        # hover around gain ~1.3-1.4 with window-to-window variation, and a
        # marginal pfor pick is still strictly smaller while a marginal
        # for_bitpack pick gets stickied across the whole partition
        if st.pfor_gain >= 1.15:
            return "pfor_delta", st
        if st.range_bits < 63:
            return "for_bitpack", st
        return "plain", st

    if typecode in VARLEN_TYPECODES:
        distinct_ratio = st.n_distinct / max(len(_sample(arr)), 1)
        # runs alone justify rle — no cardinality guard: a sorted
        # high-cardinality column (conv_id) is rle-perfect, and the old
        # strided-sample distinct_ratio check mis-routed it to fsst
        # (measured on real sorted transcripts: rle 124KB/10ms vs fsst
        # 128KB/631ms per 262k-row chunk)
        if st.mean_run_len >= 3.0:
            return "rle", st
        if distinct_ratio < 0.1 or st.n_distinct <= 256:
            return "dict", st
        from .codecs.kernels import T_STRING
        if typecode == T_STRING and _token_repeat_ratio(dense) < 0.5:
            return "tokdict", st
        if st.byte_entropy < 7.5:
            return "fsst", st
        return "plain", st

    # float: exact fixed-point (price-like) -> scaled-int bitpack
    from .codecs.kernels import T_FLOAT32, T_FLOAT64, fixedpoint_scale
    if typecode in (T_FLOAT32, T_FLOAT64):
        import numpy as _np
        v = dense.to_numpy(zero_copy_only=False).astype(_np.float64)
        if fixedpoint_scale(v) is not None:
            return "fixedpoint", st
        if st.mean_run_len >= 8.0:
            return "rle", st
        # without an entropy stage every byte permutation is size-identical
        # to plain, so the layout choice only matters (and is only measured)
        # when a backend is configured
        if entropy is not None:
            return _float_trial(dense, typecode, entropy), st
        return "plain", st
    # bool: plain (rle if very runny)
    if st.mean_run_len >= 8.0:
        return "rle", st
    return "plain", st


def choose_codecs(batch: pa.RecordBatch | pa.Table,
                  overrides: dict[str, str] | None = None,
                  entropy: str | None = None) -> dict[str, str]:
    """Codec per column for a row chunk; overrides pin specific columns."""
    overrides = overrides or {}
    out = {}
    for i, name in enumerate(batch.schema.names):
        col = batch.column(i)
        if name in overrides:
            out[name] = overrides[name]
        else:
            out[name], _ = choose_codec(col, entropy=entropy)
    return out
