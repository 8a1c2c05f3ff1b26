"""Gap-based sessionization + LSN continuity checking.

Engine-added stream analytics over the change/event log:

- `sessionize`: merge a key's events into sessions split at inactivity gaps.
  Spark's built-in `session_window` (codegen, mergeable state in streaming);
  the DuckDB oracle re-derives sessions with lag + cumulative-sum — same
  semantics, so the driver cross-checks the built-in against first
  principles.
- `lsn_gaps`: detect missing commit sequence numbers per partition of the
  log — the "did we lose events?" alarm a CDC pipeline must run
  continuously. Batch version is a lag window (oracle-checkable); the
  streaming version in streaming/gap_detector.py keeps last-seen LSN per
  key in applyInPandasWithState.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap: str = "30 minutes") -> DataFrame:
    """One row per (key, session): start, end, event count."""
    return (
        df.groupBy(F.col(key_col),
                   F.session_window(F.col(ts_col), gap).alias("s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def streaming_sessionize(stream: DataFrame, key_col: str, ts_col: str,
                         gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of `sessionize`: the built-in `session_window` keeps
    per-(key, open-session) state in the state store, MERGING sessions
    whose events arrive in different micro-batches (the stateful part a
    batch window can't do incrementally). The watermark both bounds state
    and finalizes a session once event time passes its end + gap +
    watermark — append mode emits each session exactly once, closed.

    State is O(open sessions), never stream-lifetime: a closed session's
    state is dropped at emission. Late events inside the watermark still
    merge into their session; events later than the watermark are dropped
    (the same documented policy as `streaming_windowed_counts`).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col),
                 F.session_window(F.col(ts_col), gap).alias("s"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.date_format("s.start", "yyyy-MM-dd HH:mm:ss")
            .alias("session_start"),
            "n_events",
        )
    )


def sessionize_sql(key_col: str, ts_col: str, table: str,
                   gap_seconds: int) -> str:
    """First-principles oracle: session starts where the gap from the
    previous event of the same key exceeds `gap_seconds`."""
    return f"""
        WITH ordered AS (
          SELECT {key_col}, {ts_col},
                 CASE WHEN {ts_col} - lag({ts_col}) OVER
                        (PARTITION BY {key_col} ORDER BY {ts_col})
                      <= INTERVAL '{gap_seconds} seconds' THEN 0 ELSE 1 END AS new_s
          FROM {table}
        ), numbered AS (
          SELECT *, sum(new_s) OVER
                   (PARTITION BY {key_col} ORDER BY {ts_col}
                    ROWS UNBOUNDED PRECEDING) AS sid
          FROM ordered
        )
        SELECT {key_col},
               strftime(min({ts_col}), '%Y-%m-%d %H:%M:%S') AS session_start,
               count(*) AS n_events
        FROM numbered GROUP BY {key_col}, sid
    """


def lsn_gaps(df: DataFrame, lsn_col: str = "lsn",
             part_col: str | None = None,
             chunk_size: int = 1 << 20) -> DataFrame:
    """Missing-sequence detection: holes in the (per-`part_col`, or global)
    LSN sequence. Returns (partition?, gap_start, gap_end) per hole — empty
    result == contiguous log.

    Scale shape: a naive `lag() OVER (ORDER BY lsn)` is a single-partition
    global sort — one task owns every row. Instead the sequence is chunked
    by `floor(lsn / chunk_size)`:

    1. within-chunk gaps: lag window PARTITIONED BY chunk — fully parallel,
       each task sorts ~chunk_size rows max;
    2. cross-chunk gaps (including whole missing chunks): lag over the
       per-chunk (min, max) summary — `n_chunks = lsn_max/chunk_size` rows
       (10^10 LSNs at the default chunk = ~10^4 rows), so its
       single-partition window is a driver-scale no-op, never the raw data.

    Output is identical to the naive formulation (the union covers every
    consecutive-present-LSN pair exactly once: both in one chunk -> pass 1,
    spanning chunks -> pass 2)."""
    parts = [part_col] if part_col else []
    base = (
        df.select(*parts, F.col(lsn_col))
        .withColumn("_chunk", F.floor(F.col(lsn_col) / chunk_size))
    )
    w_in = W.partitionBy(*parts, "_chunk").orderBy(lsn_col)
    inner = (
        base.withColumn("_prev", F.lag(lsn_col).over(w_in))
        .where(F.col("_prev").isNotNull() & (F.col(lsn_col) - F.col("_prev") > 1))
        .select(
            *parts,
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col(lsn_col) - 1).alias("gap_end"),
        )
    )
    summary = base.groupBy(*parts, "_chunk").agg(
        F.min(lsn_col).alias("_lo"), F.max(lsn_col).alias("_hi")
    )
    w_b = W.partitionBy(*parts).orderBy("_chunk")
    boundary = (
        summary.withColumn("_prev_hi", F.lag("_hi").over(w_b))
        .where(F.col("_prev_hi").isNotNull() & (F.col("_lo") - F.col("_prev_hi") > 1))
        .select(
            *parts,
            (F.col("_prev_hi") + 1).alias("gap_start"),
            (F.col("_lo") - 1).alias("gap_end"),
        )
    )
    return inner.unionByName(boundary)
