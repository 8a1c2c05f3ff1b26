"""Column-level table profiling for migration verification.

The reference verifies migrations by row counts and per-row checksums
(DataVerificationService.java:126-252). Before paying a full per-row hash
diff over a 100 TB table, a column-profile comparison (count / null count /
distinct / min / max per column) catches gross divergence — dropped columns,
truncated loads, collation or timezone drift — with ONE aggregate pass per
side and a metadata-sized compare. This module is that cheap first gate;
`verify.hash_diff` remains the exact second gate.

Scale notes:
- `profile_table` is a single `agg()` over the input: every statistic has a
  map-side partial, so the shuffle is one row per partition regardless of
  table size. No windows, no joins, no UDFs.
- distinct counts default to `approx_count_distinct` (HyperLogLog++, one
  pass, mergeable sketch) — the only sane choice at 10^10 rows.
  `exact_distinct=True` switches to exact `count_distinct` for small-scale
  oracle parity; Spark plans that via one Expand (rows x n_cols), still a
  single shuffle, but memory-heavy at scale — it exists for verification,
  not production.
- min/max are emitted as strings so one long-format result frame covers
  heterogeneous column types. Fractional columns are normalized through
  DECIMAL(38,6) to keep the string form engine-portable (a raw double
  renders '1.0E7' in Spark vs '10000000.0' elsewhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FRACTIONAL = (T.DoubleType, T.FloatType, T.DecimalType)


def _as_str(col: F.Column, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, _FRACTIONAL):
        return col.cast(T.DecimalType(38, 6)).cast("string")
    return col.cast("string")


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One-pass column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_val, max_val), one output row per profiled column.

    Single aggregate -> long format via stack(): the whole profile is one
    job whose shuffle carries one partial-agg row per input partition.
    NULLs are excluded from n_distinct (matches COUNT(DISTINCT col) SQL
    semantics on both Spark and DuckDB).
    """
    cols = columns or df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_nulls_{c}"))
        aggs.append(
            (F.count_distinct(col) if exact_distinct
             else F.approx_count_distinct(col)).alias(f"_dist_{c}")
        )
        aggs.append(_as_str(F.min(col), dtypes[c]).alias(f"_min_{c}"))
        aggs.append(_as_str(F.max(col), dtypes[c]).alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    # wide one-row frame -> long (col_name, stats) via stack: stays JVM-side
    parts = ", ".join(
        f"'{c}', _nulls_{c}, _dist_{c}, _min_{c}, _max_{c}" for c in cols
    )
    return wide.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, n_nulls, n_distinct, min_val, max_val)",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def numeric_quantiles(
    df: DataFrame,
    columns: list[str],
    probs: list[float] = (0.25, 0.5, 0.75),
    exact: bool = False,
    round_digits: int = 6,
) -> DataFrame:
    """Per-column quantiles, long format: (col_name, p, q) — the
    distribution half of the profile gate (count/min/max alone miss a
    migration that shifted the body of a distribution while preserving its
    envelope, e.g. a unit or timezone error on most-but-not-all rows).

    One aggregate pass like `profile_table`: every statistic here has a
    mergeable map-side partial.

    - `exact=False` (scale path): `percentile_approx` — the
      KLL/Greenwald-Khanna-style mergeable sketch, one pass, bounded
      memory at any row count. The only sane choice at 10^10 rows.
    - `exact=True` (oracle path): `percentile`, Spark's exact linear-
      interpolation quantile — semantically identical to ANSI/DuckDB
      `quantile_cont`, so the result is cross-engine checkable. Buffers
      each column per group; verification-scale only.

    Values are rounded to `round_digits` so the double formatting is
    engine-portable (same policy as the cosine operators)."""
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        for p in probs:
            q = (F.percentile(col, F.lit(p)) if exact
                 else F.percentile_approx(col, F.lit(p)))
            aggs.append(F.round(q, round_digits).alias(f"_q_{c}_{p}"))
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', CAST({p} AS DOUBLE), `_q_{c}_{p}`"
        for c in columns for p in probs
    )
    n = len(columns) * len(probs)
    return wide.selectExpr(
        f"stack({n}, {parts}) AS (col_name, p, q)")


def profile_diff(src: DataFrame, tgt: DataFrame) -> DataFrame:
    """Compare two profiles (same shape as `profile_table` output): one row
    per column with per-statistic equality flags and a MATCH/MISMATCH
    status. Profiles are tiny (one row per column), so this is a broadcast
    join on col_name regardless of how big the profiled tables were."""
    s = src.select(
        F.col("col_name"),
        *[F.col(c).alias(f"src_{c}") for c in
          ("n_rows", "n_nulls", "n_distinct", "min_val", "max_val")],
    )
    t = tgt.select(
        F.col("col_name"),
        *[F.col(c).alias(f"tgt_{c}") for c in
          ("n_rows", "n_nulls", "n_distinct", "min_val", "max_val")],
    )
    j = s.join(F.broadcast(t), "col_name", "full_outer")
    checks = {
        c: F.col(f"src_{c}").eqNullSafe(F.col(f"tgt_{c}"))
        for c in ("n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
    }
    status = F.when(
        F.col("src_n_rows").isNull(), F.lit("TARGET_ONLY")
    ).when(
        F.col("tgt_n_rows").isNull(), F.lit("SOURCE_ONLY")
    ).when(
        checks["n_rows"] & checks["n_nulls"] & checks["n_distinct"]
        & checks["min_val"] & checks["max_val"],
        F.lit("MATCH"),
    ).otherwise(F.lit("MISMATCH"))
    return j.select(
        "col_name", status.alias("status"),
        *[v.alias(f"{k}_match") for k, v in checks.items()],
    )
