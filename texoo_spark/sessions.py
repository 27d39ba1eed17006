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
  two ways a session can end in an unbounded stream. State per key is
  O(1): (session_idx, start, last, n, cents) — independent of history.

TeXoo has no streaming surface (batch Documents only); this module is
part of the net-new transcript-pipeline tier (BASELINE north star:
multi-turn conversation streams), built on the public Structured
Streaming arbitrary-stateful-processing API.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

SESSION_STATS_COLS = ["session_idx", "n_events", "cents",
                      "start_ts", "end_ts"]


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
    reach the state function (standard watermark contract)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = int(gap_sec) * 1_000_000
    out_schema = (f"{key_col} string, session_idx long, n_events long,"
                  " cents long, start_ts timestamp, end_ts timestamp")
    state_schema = ("session_idx long, start_us long, last_us long,"
                    " n long, cents long")

    def _row(key, sidx, start_us, last_us, n, cents):
        return {key_col: key, "session_idx": sidx, "n_events": n,
                "cents": cents,
                "start_ts": pd.Timestamp(start_us, unit="us"),
                "end_ts": pd.Timestamp(last_us, unit="us")}

    def fn(key, pdfs, state):
        k = key[0]
        if state.hasTimedOut:
            sidx, start_us, last_us, n, cents = state.get
            state.remove()
            yield pd.DataFrame([_row(k, sidx, start_us, last_us, n,
                                     cents)])
            return
        rows = []
        for pdf in pdfs:
            # normalize to integer microseconds regardless of the arrow->
            # pandas datetime64 unit (ns vs us varies by pandas version)
            us = pd.Series(
                pdf[ts_col].values.astype("datetime64[us]").astype("int64"))
            val = (pdf[value_col] if value_col
                   else pd.Series(0.0, index=pdf.index))
            rows.extend(zip(us.tolist(), val.tolist()))
        rows.sort()
        if state.exists:
            sidx, start_us, last_us, n, cents = state.get
        else:
            sidx, start_us, last_us, n, cents = 0, None, None, 0, 0
        closed = []
        for us, val in rows:
            if start_us is None:
                sidx, start_us, last_us, n, cents = (
                    sidx + 1, us, us, 1, int(round(val * 100)))
            elif us - last_us > gap_us:
                closed.append(_row(k, sidx, start_us, last_us, n, cents))
                sidx, start_us, last_us, n, cents = (
                    sidx + 1, us, us, 1, int(round(val * 100)))
            else:
                last_us, n = us, n + 1
                cents += int(round(val * 100))
        state.update((sidx, start_us, last_us, n, cents))
        # arm the watermark-close: fires once the stream's event time
        # provably passed the gap after the session's last event
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
