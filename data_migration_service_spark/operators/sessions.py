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
             part_col: str | None = None) -> DataFrame:
    """Missing-sequence detection: rows where the previous LSN (within
    `part_col`, or globally) is not lsn-1. Returns (partition?, gap_start,
    gap_end) for each hole — empty result == contiguous log."""
    parts = [part_col] if part_col else []
    w = W.partitionBy(*parts).orderBy(lsn_col) if parts else W.orderBy(lsn_col)
    prev = F.lag(lsn_col).over(w)
    out = (
        df.select(*parts, F.col(lsn_col))
        .withColumn("_prev", prev)
        .where(F.col("_prev").isNotNull() & (F.col(lsn_col) - F.col("_prev") > 1))
        .select(
            *parts,
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col(lsn_col) - 1).alias("gap_end"),
        )
    )
    return out
