"""Sessionization: split per-user event streams into sessions at
inactivity gaps — batch (window functions, SQL-expressible) and
streaming (custom stateful operator via ``applyInPandasWithState``).

Additive to the reference surface (SURVEY §2.5 — the reference has no
streaming/stateful operators; its homepage lists spatio-temporal
analysis as *developing*, ref: README.md:22-23). Sessionization is the
canonical event-pipeline operator a training-data/analytics engine
needs at 100 TB.

Scale design:
- batch: two window functions over one shuffle on the user key (lag →
  gap flag → running sum), then an aggregate that reuses the same
  partitioning — Catalyst plans a single exchange.
- streaming: state is one open session per user (constant per key);
  events are processed in Arrow batches (pandas), emitted sessions are
  closed sessions plus the current open one (flagged), so downstream
  sinks can upsert. No driver-side state.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

#: default inactivity gap: 30 minutes, in integer nanoseconds — exact
#: integer math, matches DuckDB's epoch_ns() in the oracle (ns also
#: covers callers whose numeric ts columns carry nanosecond epochs).
DEFAULT_GAP_NS = 30 * 60 * 1_000_000_000


def _ts_numeric(df: DataFrame, ts_col: str):
    """Integer-nanosecond Column for gap arithmetic. TIMESTAMP /
    TIMESTAMP_NTZ columns (µs precision in Spark) convert exactly to
    µs·1000; numeric columns pass through unchanged (any caller-chosen
    unit matching gap_ns). TIMESTAMP_NTZ converts via wall-clock
    timestampdiff — NOT a cast through session-zoned TIMESTAMP, which
    would make gaps DST-dependent (spurious session splits/merges
    across transitions)."""
    dtype = dict(df.dtypes).get(ts_col, "")
    if dtype == "timestamp_ntz":
        return (
            F.expr(
                "timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
            )
            * F.lit(1000)
        )
    if dtype.startswith("timestamp"):
        return F.unix_micros(F.col(ts_col)) * F.lit(1000)
    return F.col(ts_col)


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_ns: int = DEFAULT_GAP_NS,
    order_tiebreak: Optional[str] = "event_id",
) -> DataFrame:
    """Assign a per-user session index (1-based) at inactivity gaps.

    `ts_col` is a TIMESTAMP (compared in exact integer nanos) or any
    integer column in the same unit as `gap_ns`. Adds `session_idx`.
    One shuffle on `user_col`.
    """
    tnum = _ts_numeric(df, ts_col)
    # order by the SAME numeric key the gap arithmetic uses (ordering
    # by the raw NTZ column could disagree with the converted value
    # around DST transitions → negative gaps, silently merged sessions)
    order = [tnum.asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(tnum).over(w)
    is_new = F.when(
        prev.isNull() | ((tnum - prev) > F.lit(int(gap_ns))), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_idx", F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    gap_ns: int = DEFAULT_GAP_NS,
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, first/last id,
    duration — in ns for timestamp inputs, else in `ts_col`'s own
    unit). The aggregate reuses the sessionize shuffle partitioning
    (same key prefix) — Catalyst plans one exchange total."""
    s = sessionize(df, ts_col, user_col, gap_ns, order_tiebreak=id_col)
    tnum = _ts_numeric(s, ts_col)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(id_col).alias("first_event"),
        F.max(id_col).alias("last_event"),
        # integer ns for timestamp inputs, else the column's own unit
        (F.max(tnum) - F.min(tnum)).alias("duration"),
    )


# ---------------------------------------------------------------------------
# streaming: custom stateful operator (applyInPandasWithState)


def _session_output_schema(user_type="long"):
    return StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
            StructField("is_open", LongType()),  # 1 = still accumulating
        ]
    )


_STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(
    stream_df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_ns: int = DEFAULT_GAP_NS,
) -> DataFrame:
    """Streaming sessionization as a custom stateful operator.

    State per user = the open session (start, end, count) — constant
    size per key. Each micro-batch: sort the user's new events by time,
    extend or cut sessions at the gap, emit every CLOSED session
    (is_open=0) plus the current open session (is_open=1) so a sink can
    upsert. Arrow-batched via applyInPandasWithState; output mode
    must be "update".
    """
    import pandas as pd

    gap = int(gap_ns)

    def fn(key, pdf_iter: Iterator["pd.DataFrame"], state):
        (user,) = key
        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0
        out = []
        for pdf in pdf_iter:
            for ts in sorted(int(t) for t in pdf[ts_col].dropna()):
                if start is None:
                    start, end, n = ts, ts, 1
                elif ts - end > gap:
                    out.append((user, start, end, n, 0))
                    start, end, n = ts, ts, 1
                else:
                    end = max(end, ts)
                    n += 1
        if start is not None:
            state.update((start, end, n))
            out.append((user, start, end, n, 1))
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end", "n_events", "is_open"],
        )

    return stream_df.groupBy(F.col(user_col)).applyInPandasWithState(
        fn,
        outputStructType=_session_output_schema(),
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
