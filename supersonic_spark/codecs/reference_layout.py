"""Python re-derivation of Supersonic's chunked columnar file layout.

This is the *size-parity yardstick* and the PLAIN codec: per column chunk
the reference writes [null bit array][u64 per-row lengths + concatenated
bytes if variable-length, else the raw fixed-width array]
(reference: supersonic/cursor/infrastructure/file_io.cc:16-29 format
comment, :122-148 varlen layout, :150-172 WriteColumn; chunk cap
kMaxChunkRowCount=8192 at file_io.cc:71).

Only the byte *layout* is re-derived here (from the format description);
no code is translated. Our encoded blocks must round-trip bit-identically
and come in at <= this layout's size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _varlen_lengths(arr: pa.Array) -> np.ndarray:
    """Per-row byte lengths of a string/binary array (nulls -> 0)."""
    combined = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_large_string(combined.type) or pa.types.is_large_binary(combined.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offsets_buf = combined.buffers()[1]
    offs = np.frombuffer(offsets_buf, dtype=off_dtype, count=len(combined) + 1,
                         offset=combined.offset * np.dtype(off_dtype).itemsize)
    return np.diff(offs).astype(np.int64)


def _concat_data(arr: pa.Array) -> bytes:
    """Concatenated value bytes of a string/binary array (no separators)."""
    combined = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if len(combined) == 0:
        return b""
    if pa.types.is_large_string(combined.type) or pa.types.is_large_binary(combined.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offs = np.frombuffer(combined.buffers()[1], dtype=off_dtype, count=len(combined) + 1,
                         offset=combined.offset * np.dtype(off_dtype).itemsize)
    data = combined.buffers()[2]
    return data.to_pybytes()[offs[0]:offs[-1]] if data is not None else b""


def reference_column_size(arr: pa.Array) -> int:
    """Byte size of this column chunk under the reference layout.

    null bit array (1 bit/row, present iff the schema column is nullable —
    we count it when the array has any null) + (varlen: 8 bytes/row length
    array + value bytes | fixed: itemsize * rows).
    """
    n = len(arr)
    size = 0
    if arr.null_count > 0:
        size += (n + 7) // 8
    typ = arr.type
    if pa.types.is_string(typ) or pa.types.is_binary(typ) or \
       pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
        lengths = _varlen_lengths(arr)
        size += 8 * n + int(lengths.sum())
    elif pa.types.is_boolean(typ):
        size += n  # reference stores bool as 1 byte per value in blocks
    elif (pa.types.is_list(typ) or pa.types.is_large_list(typ)
          or pa.types.is_fixed_size_list(typ)):
        # vector column: 8-byte length per row + element bytes (the
        # reference's varlen layout generalized to typed vectors)
        import pyarrow.compute as pc
        n_elems = int(pc.sum(pc.list_value_length(arr)).as_py() or 0)
        size += 8 * n + (typ.value_type.bit_width // 8) * n_elems
    else:
        size += typ.bit_width // 8 * n
    return size


def reference_table_size(tbl: pa.Table, chunk_rows: int = 8192) -> int:
    """Total reference-layout size of a table, chunked at 8192 rows
    (file_io.cc:71) with an 8-byte row-count header per chunk."""
    total = 0
    n = tbl.num_rows
    for start in range(0, max(n, 1), chunk_rows):
        chunk = tbl.slice(start, chunk_rows)
        if chunk.num_rows == 0:
            continue
        total += 8  # chunk row count
        for col in chunk.columns:
            total += reference_column_size(col.combine_chunks())
    return total
