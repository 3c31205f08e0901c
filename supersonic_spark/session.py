"""SparkSession factory tuned for the encode pipeline.

Single place for configs so bench runs at two parallelism levels are
identical apart from core count (scaling-efficiency evidence).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cores: int | None = None,
              shuffle_partitions: int | None = None,
              app_name: str = "supersonic_spark",
              arrow_batch_rows: int = 65536) -> SparkSession:
    """local[cores] session with AQE + Arrow enabled.

    arrow_batch_rows is the mapInArrow batch cap — the analogue of the
    reference's 8192-row file chunks / 1024-row cursor batches
    (file_io.cc:71, cursor.h:133), sized larger because Arrow transfer
    amortizes better at 64k.
    """
    # local-mode Python workers inherit the driver env: pin per-worker BLAS
    # threads to 1 so N workers don't run N*cpu_count() threads (see runtime.py)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
