"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.J meets §7.6).

The template for operators Spark's built-in windows can't express:
arbitrary per-key state evolved batch by batch. The example keeps a
running per-user profile (event count, value sum, last seen) — the
"user state store" shape that backs online feature computation.

Scale notes: state lives in the state store keyed by the groupBy
key — shuffle once per micro-batch on user_id; state size is
O(distinct keys), eviction via the timeout conf. The same function
body works unchanged on a 1000-executor cluster because all
cross-row communication is the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": total, "last_seen_us": last}]
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user profile over a stream of
    (user_id, ts, value) events."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
