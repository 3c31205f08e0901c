"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
decode/feature kernels run as Arrow-batched functions over mapInArrow so
the Spark-side plumbing (schema, partitioning, batch shape) is real and
tested even though the actual media libs are absent in this container —
the decode step is STUBBED with a deterministic fake, clearly marked.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = ("id long, n_bytes int, crc32 long, "
                     "width int, height int, fake_mean double")


def decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB: real implementation would decode via PIL/libvips.

    Deterministic fake: derives (width, height, mean) from the payload
    bytes so tests are stable. Raises on empty payloads the way a real
    decoder would.
    """
    if not payload:
        raise ValueError("empty media payload")
    h = zlib.crc32(payload)
    width = 64 + (h & 0x3FF)
    height = 64 + ((h >> 10) & 0x3FF)
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    return width, height, float(arr.mean())


def extract_media_meta(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """mapInArrow feature extraction over binary payloads, vectorized per
    batch; nulls/empties produce null metadata rows instead of failing."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .runtime import pin_worker_threads
        pin_worker_threads()
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            ids = tbl.column(id_col).to_pylist()
            payloads = tbl.column(payload_col).to_pylist()
            n_bytes, crcs, ws, hs, means = [], [], [], [], []
            for p in payloads:
                if not p:
                    n_bytes.append(None); crcs.append(None)
                    ws.append(None); hs.append(None); means.append(None)
                    continue
                w, h, m = decode_image_stub(p)
                n_bytes.append(len(p))
                crcs.append(zlib.crc32(p) & 0xFFFFFFFF)
                ws.append(w); hs.append(h); means.append(m)
            yield pa.RecordBatch.from_pydict({
                "id": pa.array(ids, pa.int64()),
                "n_bytes": pa.array(n_bytes, pa.int32()),
                "crc32": pa.array(crcs, pa.int64()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "fake_mean": pa.array(means, pa.float64()),
            })

    sel = df.select(df[id_col].alias(id_col), df[payload_col].alias(payload_col))
    return sel.mapInArrow(run, schema=MEDIA_META_SCHEMA)
