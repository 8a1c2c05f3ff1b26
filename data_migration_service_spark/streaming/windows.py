"""Event-time windowed aggregation with late-data watermark.

The reference has no event-time semantics (SURVEY §2.7) — this is the
engine-added streaming operator for metrics over the change stream (e.g.
events/sec per type for the lineage dashboards). Tumbling windows via the
built-in `window()` expression (JVM, codegen); in streaming mode a
watermark bounds state and drops late rows past the threshold; the batch
formulation is byte-identical math and serves as the DuckDB-checkable twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    group_col: str,
    window_len: str = "1 hour",
    value_col: str | None = None,
    value_scale: int | None = 2,
) -> DataFrame:
    """Tumbling-window counts (+ optional value sum) per group.

    Works on a static DataFrame (exact, oracle-checkable) or a streaming one
    (combine with `with_watermark` below before aggregating).

    `sum_value` contract: `value_col` is summed as FIXED-POINT integers at
    `value_scale` decimal places (default 2 — the money contract: per-row
    exact cents, order-independent int64 sum, one final division; a float
    sum finished by round(, 2) can flip a cent on summation order —
    round-4 float-sum audit). Values with more than `value_scale` decimals
    are rounded per row BEFORE summing. Callers aggregating non-money
    values (latencies, ratios) must pass a `value_scale` that covers their
    precision, or `value_scale=None` for a plain float sum (fastest, but
    its low-order bits depend on partition order).
    """
    agg = [F.count(F.lit(1)).alias("n")]
    if value_col:
        if value_scale is None:
            agg.append(F.sum(F.col(value_col)).alias("sum_value"))
        else:
            unit = float(10 ** value_scale)
            fixed = F.round(F.col(value_col) * unit, 0).cast("long")
            agg.append((F.sum(fixed) / unit).alias("sum_value"))
    return (
        df.groupBy(F.window(F.col(ts_col), window_len).alias("w"),
                   F.col(group_col))
        .agg(*agg)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            group_col,
            *[c for c in ("n", "sum_value") if value_col or c == "n"],
        )
    )


def streaming_windowed_counts(
    stream: DataFrame,
    ts_col: str,
    group_col: str,
    window_len: str = "1 hour",
    watermark: str = "10 minutes",
    value_col: str | None = None,
    value_scale: int | None = 2,
) -> DataFrame:
    """Streaming variant: watermark bounds the window state store and
    finalizes windows once event time passes end + watermark; rows later
    than that are dropped (documented late-data policy). `value_scale`:
    see `windowed_counts` — the same fixed-point summation contract."""
    return windowed_counts(
        stream.withWatermark(ts_col, watermark),
        ts_col, group_col, window_len, value_col, value_scale,
    )
