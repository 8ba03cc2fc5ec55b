"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` (SURVEY §2.8 superset — the reference has no
stateful processing at all).

The operator keeps one state row per user (event count, exact value total
as integer cents, last-seen timestamp) and emits the updated snapshot for
every user touched in each micro-batch. State is Spark-managed (HDFS-
checkpointed, rescalable by key): the same code runs AvailableNow over a
landing directory or continuously over Kafka.

Scale: state is hash-partitioned by user key across executors; each
micro-batch shuffles only the batch's events, and the value total is kept
in INTEGER CENTS so the running sum stays exact and order-independent —
the streaming twin of the engine's exact-decimal batch aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
)
STATE_SCHEMA = "n bigint, cents bigint, last_us bigint"


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming per-user running totals with explicit keyed state.
    Input schema: (user_id bigint, ts timestamp, value double).

    The state-update function is defined locally so cloudpickle ships it
    by value to workers (a module-level function would be pickled by
    reference and require this package on every worker's PYTHONPATH)."""

    def update_user_state(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, cents, last_us = state.get if state.exists else (0, 0, 0)
        for pdf in batches:
            n += len(pdf)
            # exact accumulation: each 2-decimal value -> integer cents,
            # then integer sum (order-independent, no fp drift)
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, cents, last_us))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [cents / 100.0],
                "last_ts": [_pd.Timestamp(last_us, unit="us")],
            }
        )

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
