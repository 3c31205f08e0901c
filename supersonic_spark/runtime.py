"""Worker runtime tuning.

Every Python worker process on a local[N] executor inherits pyarrow's
default thread pool of os.cpu_count() threads — N workers x N threads
oversubscribes the box N-fold and *inverts* scaling (measured: encode at
local[32] ran 3x slower than local[8] before pinning). Each mapInArrow
kernel is already one task on one core, so intra-kernel parallelism must
be 1. Call pin_worker_threads() first thing inside every worker kernel.
"""

from __future__ import annotations

import os

_PINNED = False


def pin_worker_threads() -> None:
    global _PINNED
    if _PINNED:
        return
    _PINNED = True
    import pyarrow as pa
    try:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
    except Exception:
        pass
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
