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


try:  # optional-dependency seam: real decode when PIL is importable
    from PIL import Image as _PIL_Image
except ImportError:  # this container has no media libs; the stub keeps
    _PIL_Image = None  # the Spark-side plumbing real and testable


def decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB: deterministic fake decode — derives (width, height, mean)
    from the payload bytes so tests are stable. Raises on empty payloads
    the way a real decoder would."""
    if not payload:
        raise ValueError("empty media payload")
    h = zlib.crc32(payload)
    width = 64 + (h & 0x3FF)
    height = 64 + ((h >> 10) & 0x3FF)
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    return width, height, float(arr.mean())


def decode_image_pil(payload: bytes) -> tuple[int, int, float]:
    """Real decode via PIL (only importable on clusters that install it):
    (width, height, grayscale mean)."""
    import io
    if not payload:
        raise ValueError("empty media payload")
    img = _PIL_Image.open(io.BytesIO(payload))
    gray = np.asarray(img.convert("L"), dtype=np.float64)
    return img.width, img.height, float(gray.mean())


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Dispatch: PIL when available, deterministic stub otherwise. Both
    branches share the (width, height, mean) contract, so the Spark-side
    schema/partitioning/batch shape is identical either way."""
    if _PIL_Image is not None:
        return decode_image_pil(payload)
    return decode_image_stub(payload)


def extract_media_meta(df: DataFrame, id_col: str, payload_col: str,
                       decoder=None) -> DataFrame:
    """mapInArrow feature extraction over binary payloads, vectorized per
    batch; nulls/empties produce null metadata rows instead of failing.
    `decoder` defaults to decode_image_stub (deterministic, what the
    oracle gate pins); pass decode_image for the PIL-when-available seam
    on clusters with real media payloads."""
    decoder = decoder or decode_image_stub

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
                w, h, m = decoder(p)
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
