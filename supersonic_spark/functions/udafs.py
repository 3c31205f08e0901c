"""Arrow-batched grouped-aggregate pandas UDFs (SURVEY.md §2.9 — the
reference's ColumnAggregator extension point, column_aggregator.h:47-80,
re-expressed as GROUPED_AGG pandas UDFs).

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
real type hints, and stringified ones break inference.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted mean price, computed in exact integer cents so the
    float sum is order-independent (products stay < 2^53)."""
    wsum_cents = float(((price * 100).round() * qty).sum())
    w = float(qty.sum())
    return round(wsum_cents / w / 100, 4) if w else None
