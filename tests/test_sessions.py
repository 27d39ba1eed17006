"""Sessionization tests: the batch lane's exact session assignment and
the streaming applyInPandasWithState lane's two closing paths (inline
gap break + event-time-timeout), plus batch/stream semantic parity."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


@pytest.fixture(scope="session")
def spark():
    from texoo_spark.session import get_spark
    s = get_spark("texoo-sessions-tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(user, sec, val=1.0, eid=None):
    return (eid if eid is not None else sec, T0 + dt.timedelta(seconds=sec),
            user, val)


SCHEMA = "event_id long, ts timestamp, user_id string, value double"


def test_batch_sessionize_exact(spark):
    """gap=100s: A breaks after 30s-then-200s-later; B single session;
    boundary case: a gap of EXACTLY 100s does NOT break (strict >)."""
    from texoo_spark.sessions import session_stats, sessionize
    rows = [_ev("A", 0), _ev("A", 30), _ev("A", 231), _ev("A", 331),
            _ev("B", 10), _ev("B", 110)]
    df = spark.createDataFrame(rows, SCHEMA)
    sess = {(r.user_id, r.event_id): r.session_idx
            for r in sessionize(df, "user_id", "ts", 100,
                                ("event_id",)).collect()}
    assert sess == {("A", 0): 1, ("A", 30): 1, ("A", 231): 2,
                    ("A", 331): 2, ("B", 10): 1, ("B", 110): 1}
    stats = {(r.user_id, r.session_idx): (r.n_events, r.cents)
             for r in session_stats(df, "user_id", "ts", 100,
                                    value_col="value",
                                    order_cols=("event_id",)).collect()}
    assert stats == {("A", 1): (2, 200), ("A", 2): (2, 200),
                     ("B", 1): (2, 200)}


def test_batch_sessionize_plan_is_keyed(spark):
    """The sessionize exchange is hash-partitioned on the key — no
    SinglePartition window (the 10^12-row requirement)."""
    from texoo_spark.sessions import sessionize
    df = spark.createDataFrame([_ev("A", 0), _ev("B", 5)], SCHEMA)
    plan = sessionize(df, "user_id", "ts", 100)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "hashpartitioning(user_id" in plan


def test_stream_sessionize_closes_inline_and_by_timeout(spark, tmp_path):
    """Three micro-batches (maxFilesPerTrigger=1):
      b1: A@0s, A@30s, B@20s
      b2: A@3600s  -> A's first session closes INLINE (gap 3570 > 100)
      b3: C@7200s  -> watermark(10s) passes 3599:50, firing B's and A's
                      session-2 EventTimeTimeouts in later triggers
    Every closed session matches the batch twin exactly."""
    from texoo_spark.sessions import stream_sessionize
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(in_dir)
    batches = [
        [_ev("A", 0), _ev("A", 30), _ev("B", 20)],
        [_ev("A", 3600, eid=100)],
        [_ev("C", 7200, eid=200)],
        [_ev("C", 14400, eid=300)],  # pushes the watermark far past all
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(in_dir + "/b*"))
    out = stream_sessionize(stream, "user_id", "ts", gap_sec=100,
                            watermark="10 seconds", value_col="value")
    q = (out.writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.session_idx): (r.n_events, r.cents, r.start_ts,
                                        r.end_ts)
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    # file-source ordering across globs is lexicographic (b0..b3), so
    # closures are deterministic: A session1 inline, B session1 + A
    # session2 + C session1 by timeout once the watermark passes them
    assert got[("A", 1)] == (2, 200, T0, T0 + dt.timedelta(seconds=30))
    assert got[("B", 1)] == (1, 100, T0 + dt.timedelta(seconds=20),
                             T0 + dt.timedelta(seconds=20))
    assert got[("A", 2)] == (1, 100, T0 + dt.timedelta(seconds=3600),
                             T0 + dt.timedelta(seconds=3600))
    assert got[("C", 1)] == (1, 100, T0 + dt.timedelta(seconds=7200),
                             T0 + dt.timedelta(seconds=7200))
    # parity with the batch twin on the closed subset
    from texoo_spark.sessions import session_stats
    all_rows = [r for b in batches for r in b]
    batch = {(r.user_id, r.session_idx): (r.n_events, r.cents, r.start_ts,
                                          r.end_ts)
             for r in session_stats(
                 spark.createDataFrame(all_rows, SCHEMA), "user_id", "ts",
                 100, value_col="value").collect()}
    for k, v in got.items():
        assert batch[k] == v


def test_stream_reactivated_key_continues_ordinals(spark, tmp_path):
    """After a timeout-close, the key's state keeps the session counter:
    a reappearing key emits session_idx 2, not a duplicate 1 (review
    finding: state.remove() restarted numbering)."""
    from texoo_spark.sessions import stream_sessionize
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    batches = [
        [_ev("A", 0)],
        [_ev("Z", 1000, eid=50)],      # advances watermark: closes A#1
        [_ev("A", 5000, eid=100)],     # A reappears -> session 2
        [_ev("Z", 9000, eid=200)],     # closes A#2 by timeout
        [_ev("Z", 13000, eid=300)],    # flush Z's own sessions forward
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}"))
    out = stream_sessionize(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/b*"),
        "user_id", "ts", gap_sec=100, watermark="10 seconds")
    q = (out.writeStream.format("memory").queryName("sess_react")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.session_idx): r.n_events
           for r in spark.sql("SELECT * FROM sess_react").collect()}
    assert got[("A", 1)] == 1
    assert got[("A", 2)] == 1
    assert ("A", 3) not in got


def test_stream_late_in_watermark_event_folds_forward(spark, tmp_path):
    """A late (but within-watermark) event from a later micro-batch must
    fold into the open session WITHOUT moving its end backward or
    splitting it (review finding: last_us moved backward)."""
    from texoo_spark.sessions import session_stats, stream_sessionize
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    batches = [
        [_ev("A", 100)],
        # 95s is late but >= watermark; 196s extends: gaps are 5s and
        # 96s <= gap=100 -> ONE session [95, 196]
        [_ev("A", 95, eid=50), _ev("A", 196, eid=60)],
        [_ev("Z", 5000, eid=100)],     # flush A by timeout
        [_ev("Z", 9000, eid=200)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            os.path.join(in_dir, f"b{i}"))
    out = stream_sessionize(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/b*"),
        "user_id", "ts", gap_sec=100, watermark="1000 seconds",
        value_col="value")
    q = (out.writeStream.format("memory").queryName("sess_late")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.session_idx): (r.n_events, r.start_ts, r.end_ts)
           for r in spark.sql("SELECT * FROM sess_late").collect()}
    assert got[("A", 1)] == (3, T0 + dt.timedelta(seconds=95),
                             T0 + dt.timedelta(seconds=196))
    assert ("A", 2) not in got
    # and the batch twin agrees
    batch = {(r.user_id, r.session_idx): (r.n_events, r.start_ts, r.end_ts)
             for r in session_stats(
                 spark.createDataFrame(
                     [r for b in batches[:2] for r in b], SCHEMA),
                 "user_id", "ts", 100, value_col="value").collect()}
    assert batch[("A", 1)] == got[("A", 1)]


def test_cents_half_up_and_null_tolerance():
    """Streaming cent rounding matches Spark F.round (HALF_UP away from
    zero), and NULL/NaN values contribute 0 like SUM."""
    from texoo_spark.sessions import _cents
    assert _cents(0.125) == 13          # banker's would give 12
    assert _cents(-0.125) == -13
    assert _cents(0.115) == 12
    assert _cents(None) == 0
    assert _cents(float("nan")) == 0
    assert _cents(1.0) == 100


def test_epoch_us_ntz_and_ltz(spark):
    """epoch_us is exact integer micros for both timestamp flavors and
    NULL-propagating; probe outputs use it (never raw timestamps) so
    the driver's value hash cannot diverge on sub-second rendering."""
    from texoo_spark.sessions import epoch_us
    df = spark.createDataFrame(
        [("2021-03-04 05:06:07.123456",), (None,)], "s string")
    ntz = df.select(F.to_timestamp_ntz("s").alias("t"))
    ltz = df.select(F.to_timestamp("s").alias("t"))
    want = 1614834367123456  # datetime(2021,3,4,5,6,7,123456) UTC
    for frame in (ntz, ltz):
        vals = [r.us for r in
                frame.select(epoch_us(frame, "t").alias("us")).collect()]
        assert vals == [want, None]
        assert dict(frame.select(
            epoch_us(frame, "t").alias("us")).dtypes)["us"] == "bigint"


def test_running_user_totals_probe_has_no_timestamp_columns(spark):
    """Round-3 driver red row: raw/NULL timestamps hash-rendered
    differently between the driver's Spark and DuckDB paths. Pin that
    the probe schema is timestamp-free (BIGINT epoch micros only)."""
    import __spark_entry__ as entry
    df = entry.queries()["running_user_totals"](
        spark, "/root/testdata/sf0.001")
    assert not [c for c, t in df.dtypes if t.startswith("timestamp")]
    assert dict(df.dtypes)["start_us"] == "bigint"
    assert dict(df.dtypes)["end_us"] == "bigint"
