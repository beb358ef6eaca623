"""Custom stateful streaming operators (applyInPandasWithState).

Nothing in the reference requires streaming state (SURVEY §2.11), but a
training-data ingest pipeline does: exact first-seen dedup over an
unbounded stream is the streaming twin of the batch ``d_exact_dup``
operator. State per key is a single marker (seen), bounded by the
processing-time timeout — the standard Spark recipe for stateful ops the
built-in aggregations can't express.

At scale: state is partitioned by the dedup key across executors and
checkpointed; the timeout bounds state size for keys that stop arriving.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_new", T.LongType()),
        T.StructField("n_dropped", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("seen", T.LongType())])


#: processing-time timeout for expiring idle keys; module-level so the
#: closure shipped to executors carries the configured value.
_TIMEOUT_MS = 3_600_000


def _make_dedup_fn(timeout_ms: int | None):
    def _dedup_fn(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # Expired key: drop the marker and emit nothing — a timeout
        # invocation carries no input rows, so any output would be a
        # spurious (0, 0) record.
        if timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        n = sum(len(p) for p in pdfs)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n,))
            out = pd.DataFrame({"key": [key[0]], "n_new": [0], "n_dropped": [n]})
        else:
            # first batch for this key: first row is new, the rest are dups
            state.update((n,))
            out = pd.DataFrame({"key": [key[0]], "n_new": [1], "n_dropped": [n - 1]})
        if timeout_ms is not None:
            # re-arm on every update: state expires only after the key has
            # been idle for the full window, bounding total state size
            state.setTimeoutDuration(timeout_ms)
        yield out

    return _dedup_fn


def streaming_first_seen_dedup(
    stream: DataFrame,
    key_col: str,
    timeout: str = "NoTimeout",
    timeout_ms: int = _TIMEOUT_MS,
) -> DataFrame:
    """Emit, per key and micro-batch, how many rows were first-seen vs
    dropped as duplicates. Downstream joins/filters keep only `n_new > 0`
    keys — streaming exact dedup with O(1) state per key; with
    ``timeout="ProcessingTimeTimeout"`` idle keys expire after
    ``timeout_ms`` so state stays bounded on unbounded key domains."""
    # groupBy for applyInPandasWithState needs a resolved column, not an
    # alias expression — materialize the key first.
    keyed = stream.withColumn("key", stream[key_col]).groupBy("key")
    return keyed.applyInPandasWithState(
        _make_dedup_fn(timeout_ms if timeout == "ProcessingTimeTimeout" else None),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
