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


# --- resize + frame sampling -------------------------------------------------

RESIZED_SCHEMA = ("id long, out_width int, out_height int, n_bytes int, "
                  "crc32 long, resized binary")


def resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic fake output bytes derived from the
    payload crc + target dims (length = width*height//16 + 8), so tests
    and oracles can pin sizes without a codec. Raises on empty payloads
    the way a real decoder would."""
    if not payload:
        raise ValueError("empty media payload")
    seed = zlib.crc32(payload) ^ (width << 16) ^ height
    n = width * height // 16 + 8
    out = (np.arange(n, dtype=np.uint32) * 2654435761 + seed) % 256
    return out.astype(np.uint8).tobytes()


def resize_image_pil(payload: bytes, width: int, height: int) -> bytes:
    """Real resize via PIL (clusters that install it): PNG bytes out."""
    import io
    img = _PIL_Image.open(io.BytesIO(payload)).resize((width, height))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def resize_images(df: DataFrame, id_col: str, payload_col: str,
                  width: int, height: int, resizer=None) -> DataFrame:
    """Arrow-batched image resize over binary payloads: (id, out dims,
    size, crc, resized bytes). resizer defaults to the deterministic
    stub; pass resize_image_pil on clusters with real images — the
    Spark-side schema/batching is identical either way. NULL/empty
    payloads produce NULL outputs instead of failing the batch."""
    resizer = resizer or resize_image_stub

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .runtime import pin_worker_threads
        pin_worker_threads()
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            ids = tbl.column(id_col).to_pylist()
            payloads = tbl.column(payload_col).to_pylist()
            outs = [resizer(p, width, height) if p else None
                    for p in payloads]
            yield pa.RecordBatch.from_pydict({
                "id": pa.array(ids, pa.int64()),
                "out_width": pa.array(
                    [width if o is not None else None for o in outs],
                    pa.int32()),
                "out_height": pa.array(
                    [height if o is not None else None for o in outs],
                    pa.int32()),
                "n_bytes": pa.array(
                    [len(o) if o is not None else None for o in outs],
                    pa.int32()),
                "crc32": pa.array(
                    [zlib.crc32(o) & 0xFFFFFFFF if o is not None else None
                     for o in outs], pa.int64()),
                "resized": pa.array(outs, pa.binary()),
            })

    sel = df.select(df[id_col].alias(id_col),
                    df[payload_col].alias(payload_col))
    return sel.mapInArrow(run, schema=RESIZED_SCHEMA)


def pack_frames(frames: list[bytes]) -> bytes:
    """Toy deterministic frame container: 4-byte big-endian length prefix
    per frame. Stands in for a real video container; a cluster with
    pyav/ffmpeg swaps iter_frames for a real demuxer and everything
    downstream (the explode plumbing) is unchanged."""
    out = bytearray()
    for f in frames:
        out += len(f).to_bytes(4, "big") + f
    return bytes(out)


def iter_frames(payload: bytes) -> Iterator[bytes]:
    """Parse a pack_frames container; raises on truncation."""
    off = 0
    while off < len(payload):
        if off + 4 > len(payload):
            raise ValueError("truncated frame header")
        n = int.from_bytes(payload[off:off + 4], "big")
        off += 4
        if off + n > len(payload):
            raise ValueError("truncated frame body")
        yield payload[off:off + n]
        off += n


FRAME_SCHEMA = "id long, frame_idx int, n_bytes int, frame binary"


def sample_frames(df: DataFrame, id_col: str, payload_col: str,
                  every_n: int = 1,
                  frame_len: int | None = None) -> DataFrame:
    """Frame sampling as a 1->N Arrow explode: every `every_n`-th frame
    of each payload becomes its own row (id, frame_idx, n_bytes, frame).

    frame_len=None parses the pack_frames container (the real-demuxer
    seam); frame_len=K treats the payload as fixed-K-byte frames — pure
    byte arithmetic, which is what the SQL oracle checks. Variable
    output batch sizes exercise the real explode plumbing either way."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .runtime import pin_worker_threads
        pin_worker_threads()
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            ids = tbl.column(id_col).to_pylist()
            payloads = tbl.column(payload_col).to_pylist()
            oid, oidx, olen, ofr = [], [], [], []
            for i, p in zip(ids, payloads):
                if not p:
                    continue
                frames = (iter_frames(p) if frame_len is None else
                          (p[o:o + frame_len]
                           for o in range(0, len(p), frame_len)))
                for j, f in enumerate(frames):
                    if j % every_n:
                        continue
                    oid.append(i); oidx.append(j)
                    olen.append(len(f)); ofr.append(f)
            yield pa.RecordBatch.from_pydict({
                "id": pa.array(oid, pa.int64()),
                "frame_idx": pa.array(oidx, pa.int32()),
                "n_bytes": pa.array(olen, pa.int32()),
                "frame": pa.array(ofr, pa.binary()),
            })

    sel = df.select(df[id_col].alias(id_col),
                    df[payload_col].alias(payload_col))
    return sel.mapInArrow(run, schema=FRAME_SCHEMA)
