"""Custom stateful streaming operator via applyInPandasWithState.

Tracks per-conversation running state (turn count, last timestamp, last
role) across micro-batches — the streaming generalization of the
reference's stateful running expressions, whose state persists across
blocks within one binding (reference: supersonic/expression/core/
stateful_expressions.h:17-21); Structured Streaming's GroupState is the
distributed, fault-tolerant version of that per-binding state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

CONV_STATS_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", LongType()),
    StructField("max_turn_idx", IntegerType()),
    StructField("last_role", StringType()),
    StructField("last_ts", TimestampType()),
])

_STATE_SCHEMA = StructType([
    StructField("n_turns", LongType()),
    StructField("max_turn_idx", IntegerType()),
    StructField("last_role", StringType()),
    StructField("last_ts_us", LongType()),
])


def _update_conv(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    n_turns, max_turn, last_role, last_ts_us = (
        state.get if state.exists else (0, -1, None, None))
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        n_turns += len(pdf)
        mt = int(pdf["turn_idx"].max())
        if mt > max_turn:
            max_turn = mt
        last_role = str(pdf["role"].iloc[-1])
        last_ts_us = int(pdf["ts"].iloc[-1].value // 1000)
    state.update((n_turns, max_turn, last_role, last_ts_us))
    yield pd.DataFrame({
        "conv_id": [key[0]],
        "n_turns": [n_turns],
        "max_turn_idx": [max_turn],
        "last_role": [last_role],
        "last_ts": [pd.Timestamp(last_ts_us * 1000)],
    })


def running_conv_stats(stream: DataFrame) -> DataFrame:
    """Per-conversation running stats, updated every micro-batch.
    Input needs (conv_id, turn_idx, role, ts)."""
    return (stream.groupBy("conv_id")
            .applyInPandasWithState(
                _update_conv,
                outputStructType=CONV_STATS_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
