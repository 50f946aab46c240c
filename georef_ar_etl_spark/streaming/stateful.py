"""Custom stateful streaming operator: running per-key ingest statistics
via ``applyInPandasWithState``.

The engine's exactly-once state lives in the snapshot table; this operator
covers the OTHER stateful-streaming need a WAL tail has — continuously
maintained per-key telemetry (events seen, last seq, deletes seen) that
should NOT pay a table read per trigger. It is the pattern slot for any
custom stateful operator Spark lacks as a builtin (the task's
``applyInPandasWithState`` surface): state is a per-key tuple updated from
Arrow batches, emitted as a changelog per trigger.

Semantics: for each key (default ``source``), the running count of events,
the max ``seq`` seen, and the delete count — across ALL triggers since the
stream started. GroupStateTimeout is not used: keys are low-cardinality
dimensions (sources), so state is bounded by design; for unbounded key
domains pass a timeout and let idle state expire.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATS_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("max_seq", T.LongType()),
    T.StructField("n_deletes", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType()),
    T.StructField("max_seq", T.LongType()),
    T.StructField("n_deletes", T.LongType()),
])


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_events, max_seq, n_deletes = (
        state.get if state.exists else (0, -1, 0)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        if len(pdf):
            max_seq = max(max_seq, int(pdf["seq"].max()))
            n_deletes += int((pdf["op"] == "delete").sum())
    state.update((n_events, max_seq, n_deletes))
    yield pd.DataFrame(
        {"key": [key[0]], "n_events": [n_events], "max_seq": [max_seq],
         "n_deletes": [n_deletes]}
    )


def running_key_stats(events: DataFrame, key: str = "source") -> DataFrame:
    """Streaming DataFrame of per-key running stats (one changelog row per
    key per trigger). Works on a streaming ``events`` frame carrying at
    least (``key``, seq, op)."""
    return (
        events.select(key, "seq", "op")
        .groupBy(key)
        .applyInPandasWithState(
            _update,
            outputStructType=STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
