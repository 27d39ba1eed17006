"""Sessionization: gap-based session assignment over keyed event streams.

Two lanes with the SAME semantics (a session breaks when the gap between
consecutive events of a key exceeds ``gap_sec``):

- batch: one keyed window (lag + running sum of break flags) — fully
  relational, SQL-expressible, value-oracled. The shuffle is keyed on
  the session key; no SinglePartition anywhere, so the plan holds at
  10^12 rows (sessions never span keys).
- streaming: applyInPandasWithState with EventTimeTimeout — the custom
  stateful operator lane. Sessions close either inline (a later event
  arrives past the gap) or by watermark timeout (no more events), the
  two ways a session can end in an unbounded stream.

TeXoo has no streaming surface (batch Documents only); this module is
part of the net-new transcript-pipeline tier (BASELINE north star:
multi-turn conversation streams), built on the public Structured
Streaming arbitrary-stateful-processing API.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

SESSION_STATS_COLS = ["session_idx", "n_events", "cents",
                      "start_ts", "end_ts"]


def epoch_us(df: DataFrame, col: str):
    """Epoch-microseconds of a timestamp column as BIGINT, exact and
    timezone-free for both TIMESTAMP and TIMESTAMP_NTZ (unix_micros
    rejects NTZ; timestampdiff against an NTZ epoch literal rejects
    LTZ — branch on the actual column type). Probe outputs emit this
    instead of raw timestamps so value hashing cannot be bitten by
    sub-second / NULL timestamp rendering differences between engines
    (DuckDB twin: ``epoch_us(col)``)."""
    dtype = dict(df.dtypes)[col]
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND,"
            f" to_timestamp_ntz('1970-01-01 00:00:00'), {col})")
    return F.unix_micros(F.col(col))


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap_sec: int, order_cols: tuple = ()) -> DataFrame:
    """Assign a 1-based ``session_idx`` per key: a new session starts at
    the first event and whenever the gap to the previous event exceeds
    ``gap_sec``. Integer-microsecond arithmetic (timestampdiff — exact,
    timezone-free, works on TIMESTAMP and TIMESTAMP_NTZ alike) so the
    break decision is engine-portable."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    gap = F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
    brk = (F.col("_prev_ts").isNull()
           | (gap > F.lit(int(gap_sec) * 1_000_000)))
    return (df.withColumn("_prev_ts", F.lag(F.col(ts_col)).over(w))
            .withColumn(
                "session_idx",
                F.sum(brk.cast("long")).over(
                    w.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
            .drop("_prev_ts"))


def session_stats(df: DataFrame, key_col: str, ts_col: str,
                  gap_sec: int, value_col: str | None = None,
                  order_cols: tuple = ()) -> DataFrame:
    """One row per (key, session): event count, cent-sum of value_col
    (0 when absent), start/end timestamps."""
    cents = (F.sum(F.round(F.col(value_col) * 100).cast("long"))
             if value_col else F.lit(0).cast("long"))
    return (sessionize(df, key_col, ts_col, gap_sec, order_cols)
            .groupBy(key_col, "session_idx")
            .agg(F.count("*").alias("n_events"),
                 cents.alias("cents"),
                 F.min(ts_col).alias("start_ts"),
                 F.max(ts_col).alias("end_ts")))


def _cents(val) -> int:
    """HALF_UP cent rounding matching Spark's F.round / the SQL oracle
    (NOT Python's banker's round); NULL/NaN contribute 0 like SUM."""
    if val is None:
        return 0
    v = float(val)
    if math.isnan(v):
        return 0
    scaled = v * 100
    return int(math.floor(scaled + 0.5)) if scaled >= 0 \
        else -int(math.floor(-scaled + 0.5))


_NO_SESSION = -1  # start_us sentinel: key known, no session currently open


def stream_sessionize(events: DataFrame, key_col: str, ts_col: str,
                      gap_sec: int, watermark: str = "10 seconds",
                      value_col: str | None = None) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session
    (key, session_idx, n_events, cents, start_ts, end_ts).

    State machine per key: fold the batch's events (sorted by event
    time) into the open session; a gap > gap_sec closes the current
    session (emit) and opens the next. After each batch the state arms
    an event-time timeout at last_event + gap — when the watermark
    passes it with no new events, the session closes and emits. Late
    rows beyond the watermark are dropped by the engine before they
    reach the state function (standard watermark contract); late rows
    WITHIN the watermark fold into the open session without ever moving
    its end backward. After a timeout-close the per-key state keeps only
    the session counter (no timeout armed) so a reappearing key
    continues at the next ordinal exactly like the batch twin — the
    price of ordinal session ids is one tiny tombstone per idle key; key
    sessions by start_ts instead when that state is unacceptable.

    Timestamps: pandas receives session-timezone wall-clock values, but
    GroupState.setTimeoutTimestamp compares against the epoch-UTC event
    watermark — so event times are tz-localized back to UTC epoch here
    (and emitted timestamps converted forward) using the session's own
    spark.sql.session.timeZone."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_sec) * 1_000_000
    tz = (events.sparkSession.conf.get("spark.sql.session.timeZone", None)
          or "UTC")
    out_schema = (f"{key_col} string, session_idx long, n_events long,"
                  " cents long, start_ts timestamp, end_ts timestamp")
    state_schema = ("session_idx long, start_us long, last_us long,"
                    " n long, cents long")

    def _epoch_us(col: pd.Series):
        idx = pd.DatetimeIndex(col)
        if idx.tz is None and tz != "UTC":
            idx = idx.tz_localize(tz)
        if idx.tz is not None:
            idx = idx.tz_convert("UTC").tz_localize(None)
        return idx.values.astype("datetime64[us]").astype("int64")

    def _ts_out(us: int) -> pd.Timestamp:
        t = pd.Timestamp(us, unit="us", tz="UTC")
        return t.tz_convert(tz).tz_localize(None)

    def _row(key, sidx, start_us, last_us, n, cents):
        return {key_col: key, "session_idx": sidx, "n_events": n,
                "cents": cents, "start_ts": _ts_out(start_us),
                "end_ts": _ts_out(last_us)}

    def fn(key, pdfs, state):
        k = key[0]
        if state.hasTimedOut:
            sidx, start_us, last_us, n, cents = state.get
            # keep the counter so a reappearing key continues the batch
            # twin's ordinal numbering; no timeout armed on the tombstone
            state.update((sidx, _NO_SESSION, _NO_SESSION, 0, 0))
            yield pd.DataFrame([_row(k, sidx, start_us, last_us, n,
                                     cents)])
            return
        rows = []
        for pdf in pdfs:
            us = _epoch_us(pdf[ts_col])
            vals = (pdf[value_col].tolist() if value_col
                    else [0.0] * len(pdf))
            rows.extend(zip(us.tolist(), vals))
        rows.sort(key=lambda r: r[0])
        if state.exists:
            sidx, start_us, last_us, n, cents = state.get
            if start_us == _NO_SESSION:
                start_us = last_us = None
        else:
            sidx, start_us, last_us, n, cents = 0, None, None, 0, 0
        closed = []
        for us, val in rows:
            if start_us is None:
                sidx, start_us, last_us, n, cents = (
                    sidx + 1, us, us, 1, _cents(val))
            elif us - last_us > gap_us:
                closed.append(_row(k, sidx, start_us, last_us, n, cents))
                sidx, start_us, last_us, n, cents = (
                    sidx + 1, us, us, 1, _cents(val))
            else:
                # a late-but-in-watermark event folds in without moving
                # the session window backward
                start_us = min(start_us, us)
                last_us = max(last_us, us)
                n += 1
                cents += _cents(val)
        state.update((sidx, start_us if start_us is not None
                      else _NO_SESSION,
                      last_us if last_us is not None else _NO_SESSION,
                      n, cents))
        if last_us is not None:
            # arm the watermark-close: fires once the stream's event
            # time provably passed the gap after the session's last event
            state.setTimeoutTimestamp(last_us // 1000 + gap_sec * 1000)
        if closed:
            yield pd.DataFrame(closed)

    # watermarks require tz-aware TIMESTAMP; NTZ inputs cast (session-tz
    # interpretation — only relative event time matters to the watermark)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
