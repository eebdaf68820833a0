"""Sessionization: batch plan vs a naive reference; the stateful streaming
form (applyInPandasWithState) vs the batch plan on the same events split
across micro-batches."""

import datetime as dt

import pytest

from pg_ts_semantic_headline_spark.streaming.sessions import (
    sessionize,
    sessionize_stream,
)

BASE = dt.datetime(2026, 1, 1, 8, 0, 0)


def ev(uid, minutes, value):
    return (uid, BASE + dt.timedelta(minutes=minutes), float(value))


EVENTS = [
    # user 1: two sessions split by a 45-min gap
    ev(1, 0, 1.0), ev(1, 10, 2.0), ev(1, 25, 3.0),
    ev(1, 70, 4.0), ev(1, 75, 5.0),
    # user 2: one long session, every gap < 30 min
    ev(2, 0, 1.5), ev(2, 29, 1.5), ev(2, 58, 1.5),
    # user 3: three single-event sessions
    ev(3, 0, 7.0), ev(3, 100, 8.0), ev(3, 200, 9.0),
]


def naive_sessions(events, gap_minutes=30):
    out = {}
    by_user = {}
    for uid, ts, v in sorted(events, key=lambda e: (e[0], e[1])):
        by_user.setdefault(uid, []).append((ts, v))
    for uid, evs in by_user.items():
        cur = [evs[0]]
        sessions = []
        for ts, v in evs[1:]:
            if (ts - cur[-1][0]).total_seconds() >= gap_minutes * 60:
                sessions.append(cur)
                cur = []
            cur.append((ts, v))
        sessions.append(cur)
        for s in sessions:
            out[(uid, s[0][0])] = (s[-1][0], len(s), sum(v for _, v in s))
    return out


def rows_to_dict(rows):
    return {(r["user_id"], r["session_start"]):
            (r["session_end"], r["n_events"], round(r["sum_value"], 9))
            for r in rows}


def test_batch_sessionize_matches_naive(spark):
    df = spark.createDataFrame(EVENTS,
                               "user_id long, ts timestamp, value double")
    got = rows_to_dict(sessionize(df, gap_seconds=1800).collect())
    want = {k: (e, n, round(sv, 9))
            for k, (e, n, sv) in naive_sessions(EVENTS).items()}
    assert got == want
    # user 1 has exactly 2 sessions, user 3 has 3
    assert sum(1 for (u, _s) in got if u == 1) == 2
    assert sum(1 for (u, _s) in got if u == 3) == 3


def test_batch_sessionize_gap_boundary(spark):
    # a gap of EXACTLY `gap_seconds` starts a new session (>= contract)
    rows = [ev(9, 0, 1.0), ev(9, 30, 1.0)]
    df = spark.createDataFrame(rows,
                               "user_id long, ts timestamp, value double")
    assert sessionize(df, gap_seconds=1800).count() == 2
    assert sessionize(df, gap_seconds=1801).count() == 1


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Split the events into 3 time-ordered micro-batches; the last update
    per (user_id, session_start) must equal the batch sessionization."""
    df = spark.createDataFrame(EVENTS,
                               "user_id long, ts timestamp, value double")
    src = str(tmp_path / "sess_src")
    ordered = sorted(EVENTS, key=lambda e: e[1])
    for i in range(3):                       # one file per micro-batch
        chunk = ordered[i * 4:(i + 1) * 4]
        spark.createDataFrame(chunk,
                              "user_id long, ts timestamp, value double") \
            .coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream
              .schema("user_id long, ts timestamp, value double")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (sessionize_stream(stream, gap_seconds=1800)
         .writeStream.format("memory").queryName("sess")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)

    updates = spark.sql(
        "SELECT * FROM sess").collect()
    # keep the LAST update per session: extents only grow, so max works
    last = {}
    for r in updates:
        key = (r["user_id"], r["session_start"])
        cur = last.get(key)
        if cur is None or r["session_end"] >= cur["session_end"]:
            last[key] = r
    got = rows_to_dict(last.values())
    want = rows_to_dict(sessionize(df, gap_seconds=1800).collect())
    assert got == want


def test_recommended_conf():
    from pg_ts_semantic_headline_spark.session import recommended_conf
    c = recommended_conf(32)
    assert c["spark.sql.shuffle.partitions"] == "64"
    assert c["spark.sql.adaptive.enabled"] == "true"
    assert "spark.sql.files.maxPartitionBytes" not in c
    big = recommended_conf(512, sf_hint_gb=100_000)
    assert big["spark.sql.shuffle.partitions"] == "1024"
    assert big["spark.sql.files.maxPartitionBytes"] == str(256 << 20)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        recommended_conf(0)


def test_configured_builder_smoke():
    from pg_ts_semantic_headline_spark.session import configured_builder
    b = configured_builder(8, master="local[2]")
    # builder accumulates options without starting a JVM; the options
    # map is internal, so just assert the fluent API returned a builder
    assert hasattr(b, "getOrCreate")
