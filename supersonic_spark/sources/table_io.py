"""Iceberg-or-parquet table seam.

The north rule targets Iceberg tables of transcripts; this sandbox has no
Iceberg catalog jars, so every call goes through one seam that prefers an
Iceberg catalog when the runtime has one and falls back to parquet paths
with identical semantics above the seam. Code above this module never
branches on the format.

Reference analogue: FileInput/FileOutput are the reference's only I/O
(supersonic/cursor/infrastructure/file_io.h); the schema travels with the
reader there, as it does here via table metadata.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe only
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref is either an Iceberg table identifier (catalog.db.table) or a
    parquet path. Paths win when they exist on disk."""
    if os.path.exists(ref) or ref.startswith(("/", "file:", "s3:", "hdfs:")):
        return spark.read.parquet(ref)
    if _iceberg_available(spark):
        return spark.read.table(ref)
    raise ValueError(f"table ref {ref!r} is not a path and no Iceberg "
                     "catalog is available")


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    if ref.startswith(("/", "file:", "s3:", "hdfs:")) or os.sep in ref:
        df.write.mode(mode).parquet(ref)
    elif _iceberg_available(df.sparkSession):
        df.writeTo(ref).createOrReplace()
    else:
        raise ValueError(f"cannot write table ref {ref!r}")


def table_fingerprint(spark: SparkSession, ref: str) -> str:
    """Stable identity of the input snapshot for checkpoint keying:
    Iceberg snapshot id when available, else a hash of (path, file names,
    sizes, mtimes)."""
    if os.path.isdir(ref):
        h = hashlib.md5()
        for name in sorted(os.listdir(ref)):
            p = os.path.join(ref, name)
            st = os.stat(p)
            h.update(f"{name}:{st.st_size}:{int(st.st_mtime)}".encode())
        return h.hexdigest()[:16]
    if _iceberg_available(spark):
        row = (spark.sql(f"SELECT snapshot_id FROM {ref}.snapshots "
                         "ORDER BY committed_at DESC LIMIT 1").collect())
        return str(row[0].snapshot_id) if row else "empty"
    return hashlib.md5(ref.encode()).hexdigest()[:16]
