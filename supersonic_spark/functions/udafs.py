"""Arrow-batched grouped-aggregate pandas UDFs (SURVEY.md §2.9 — the
reference's ColumnAggregator extension point, column_aggregator.h:47-80,
re-expressed as GROUPED_AGG pandas UDFs).

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
real type hints, and stringified ones break inference.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted mean price, computed in exact integer cents so the
    float sum is order-independent (products stay < 2^53)."""
    wsum_cents = float(((price * 100).round() * qty).sum())
    w = float(qty.sum())
    return round(wsum_cents / w / 100, 4) if w else None


@pandas_udf("long")
def simhash60_agg(h: pd.Series) -> int:
    """SimHash over a group's 60-bit token hashes: per bit, majority vote
    (+1/-1) across the group; set the bit iff the vote is positive.
    Integer-exact, so it matches the SQL bit-explode oracle while moving
    60x fewer rows through the shuffle (one hash per token instead of one
    row per (token, bit))."""
    v = h.to_numpy(dtype=np.int64)
    bits = (v[:, None] >> np.arange(60, dtype=np.int64)) & 1
    votes = (2 * bits - 1).sum(axis=0)
    return int(((votes > 0).astype(np.int64)
                << np.arange(60, dtype=np.int64)).sum())
