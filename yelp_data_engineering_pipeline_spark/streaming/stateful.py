"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 extensions; the "custom stateful operators" lane of the
engine's streaming surface).

``running_user_stats`` keeps per-user running (count, sum, max) across
micro-batches — the streaming generalization of the reference's
resume-state (which it keeps as "what's already in the output file",
web_scraping.py:517-521), upgraded to arbitrary per-key state with
timeout-based eviction.

Scale: state is hash-partitioned by user across executors and persisted
in the state store per checkpoint; ProcessingTimeTimeout + the idle
horizon bound state size for abandoned keys.

API note: Spark 4 also ships ``transformWithStateInPandas`` (the
successor API: typed value/list/map state, timers, TTL). It is NOT used
here because its driver-side Python runner requires ``google.protobuf``,
which this container lacks (probed: StreamingPythonRunner init fails
with ImportError) — ``applyInPandasWithState`` expresses the same
per-key state semantics without that dependency. On a cluster with
protobuf installed, ``running_user_stats`` ports 1:1 to a
StatefulProcessor with a single value state.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        StructField("n", LongType()),
        StructField("total", DoubleType()),
        StructField("peak", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("peak_value", DoubleType()),
    ]
)


def _make_update_fn(evict_after_ms: int | None):
    def update_user_stats(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # idle key: emit final state and evict
            n, total, peak = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total_value": total, "peak_value": peak}]
            )
            return
        n, total, peak = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                peak = max(peak, float(pdf["value"].max()))
        state.update((n, total, peak))
        if evict_after_ms is not None:
            state.setTimeoutDuration(evict_after_ms)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total, "peak_value": peak}]
        )

    return update_user_stats


def running_user_stats(events_stream: DataFrame, evict_after_ms: int | None = None) -> DataFrame:
    """Per-user running stats with custom state (streaming input:
    columns user_id, value).

    ``evict_after_ms`` enables ProcessingTimeTimeout state eviction for
    continuous pipelines. Leave it None for availableNow batch drains:
    with a processing-time timeout set, an availableNow query keeps
    issuing "cleaning up state" batches until every key's timer fires —
    minutes of idle spin after the data is done (observed).
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(evict_after_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
