"""Custom stateful streaming operators via applyInPandasWithState (C6+).

Beyond the built-in windowed aggregations, arbitrary per-key state
machines run as Arrow-batched Python with managed state: the canonical
example here is a per-user running profile (event count, value total,
last-seen timestamp) that survives across micro-batches and expires via
an OPT-IN processing-time timeout (see user_profile_stream — the
default is unbounded state so finite drives can quiesce). State lives
in the state store (checkpointed,
recovered on restart); each key's batch crosses the JVM→Python boundary
once per trigger — the 100 TB streaming posture for logic the built-ins
can't express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

PROFILE_OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, last_ts TIMESTAMP"
)
PROFILE_STATE_SCHEMA = "n_events BIGINT, total_value DOUBLE, last_ts_us BIGINT"


def user_profile_stream(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Running per-user profile over an unbounded event stream.

    Emits the updated profile row for every user seen in each
    micro-batch (update semantics). The updater closure is
    self-contained (stdlib/pandas only) so executors don't need this
    package on their PYTHONPATH.

    State expiry is OPT-IN: pass ``idle_timeout_ms`` and a user idle
    longer than that of PROCESSING time is dropped (``state.remove()``
    on the timeout callback) — production streams with churning /
    unbounded key cardinality need this or the state store and its
    checkpoints grow without bound. The default is no timeout because
    pending processing-time timeouts keep the query scheduling
    micro-batches forever, so ``processAllAvailable()`` (the
    batch-drive / test pattern) never sees the stream quiesce — a
    finite drive of the operator needs the timeout off."""
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def update(key, pdfs, state):
        import datetime

        import pandas as pd

        (user_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle key: drop the state entry; emit nothing
            state.remove()
            return
        n, total, last_us = (
            state.get if state.exists else (0, 0.0, 0)
        )
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            ts_max = pd.to_datetime(pdf["ts"]).max()
            last_us = max(last_us, int(ts_max.value // 1000))
        state.update((n, total, last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        # exact micros reconstruction — utcfromtimestamp(us/1e6) floats
        # away the last microsecond digit at 2024-scale epochs
        last_dt = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=last_us
        )
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts": [last_dt],
            }
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=PROFILE_OUTPUT_SCHEMA,
            stateStructType=PROFILE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
