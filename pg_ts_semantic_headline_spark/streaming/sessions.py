"""Sessionization over an event stream — the canonical CUSTOM STATEFUL
operator (gap-based sessions cannot be expressed as a fixed window
aggregation, because a session's extent depends on the data itself).

Two physical forms with one contract:

- `sessionize` (batch): lag() gap detection + a running sum of
  session-break flags per user — two window passes over the same
  (user_id, ts) sort, so ONE shuffle; pure column algebra, DuckDB-oracle
  checkable. This is also the correctness reference for the stream.
- `sessionize_stream` (streaming): `applyInPandasWithState` keeps one
  open session per user in group state and emits, per micro-batch, the
  CURRENT extent of every session the batch touched (update semantics —
  a finite test stream would otherwise strand its last sessions in state
  waiting for a timeout that never fires). Downstream keeps the last
  update per (user_id, session_start); the pytest pins that this equals
  the batch plan on the same events. Events inside a batch are sorted by
  the operator; batches are assumed event-time ordered per user (pair
  with a watermark upstream for real late data).

A session = consecutive events of one user with inter-event gaps
< `gap`; `session_start` is its first event's timestamp (stable id).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long, sum_value double")

_STATE_SCHEMA = "start long, last long, n long, sv double"


def sessionize(events: DataFrame, gap_seconds: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value), one row
    per gap-delimited session."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col),
                                             F.monotonically_increasing_id())
    prev = F.lag(F.col(ts_col)).over(w)
    # timestamp subtraction yields a day-time interval — microsecond-exact
    # and valid for both TIMESTAMP and TIMESTAMP_NTZ columns (a long cast
    # would truncate sub-second parts; a double cast rejects NTZ)
    is_new = (prev.isNull()
              | (F.col(ts_col) - prev
                 >= F.expr(f"INTERVAL '{int(gap_seconds)}' SECOND"))
              ).cast("long")
    wc = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.monotonically_increasing_id()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (events
            .withColumn("_new", is_new)
            .withColumn("_sess", F.sum("_new").over(wc))
            .groupBy(F.col(user_col).alias("user_id"), F.col("_sess"))
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum(value_col).alias("sum_value"))
            .drop("_sess"))


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      user_col: str = "user_id", ts_col: str = "ts",
                      value_col: str = "value") -> DataFrame:
    """Streaming form: one open session per user in group state; every
    micro-batch emits the updated extent of each session it touched (and
    every session it closed). State is O(users), not O(events)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            start, last, n, sv = state.get
        else:
            start, last, n, sv = None, None, 0, 0.0
        out = []

        def emit():
            if n > 0:
                out.append((user_id, start, last, n, sv))

        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            # normalize to int64 MICROseconds regardless of whether Arrow
            # delivered datetime64[ns] or [us]
            ts_us = pd.to_datetime(pdf[ts_col]).astype("datetime64[us]") \
                .astype("int64")
            vals = pdf[value_col].astype("float64")
            for t, v in zip(ts_us.to_numpy(), vals.to_numpy()):
                if last is not None and t - last >= gap_us:
                    emit()                      # final extent of the closed one
                    start, last, n, sv = t, t, 1, float(v)
                else:
                    start = t if start is None else start
                    last, n, sv = t, n + 1, sv + float(v)
        emit()                                  # current extent of the open one
        state.update((start, last, n, sv))
        yield pd.DataFrame(
            {"user_id": [r[0] for r in out],
             "session_start": pd.to_datetime([r[1] for r in out], unit="us"),
             "session_end": pd.to_datetime([r[2] for r in out], unit="us"),
             "n_events": [r[3] for r in out],
             "sum_value": [r[4] for r in out]})

    return (events.select(user_col, ts_col, value_col)
            .groupBy(user_col)
            .applyInPandasWithState(fn, SESSION_SCHEMA, _STATE_SCHEMA,
                                    "update", GroupStateTimeout.NoTimeout))
