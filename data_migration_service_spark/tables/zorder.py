"""Z-order (Morton) clustering key for multi-column file skipping.

`write_sort=cols:a,b` clusters lexicographically: parquet row-group
min/max stats become tight on `a`, but a file's `b` range stays as wide
as the whole bucket unless `a` is low-cardinality. When scans filter on
EITHER of two columns with comparable frequency, the right layout is a
space-filling curve: interleaving the bit patterns of per-column ranks
gives every file a roughly-square region of the (a, b) domain, so both
columns' min/max stats shrink by ~sqrt(files) instead of one column
taking everything (the Delta OPTIMIZE ZORDER rationale; at ONE clustering
column lexicographic is strictly better — keep `cols:` for that case).

Shape of the computation (all JVM expressions, no UDF, no extra shuffle):

1. one narrow min/max aggregate over the clustering columns (the only
   extra job; runs at write time, so compaction — where long-lived files
   are made — pays it once per rewrite);
2. per column, a uniform rank via `width_bucket(v, min, max, 2^bits)` —
   uniform, not quantile, binning: monotone, cross-engine deterministic,
   and clamp semantics make SAMPLED stats safe (out-of-range values land
   in the end buckets). Skewed domains degrade gracefully (files cover
   unequal value ranges but pruning still works at the populated end);
3. bit interleave into one long, used ONLY as a sort key inside the
   writer task — row content never changes, so correctness is untouched
   by construction. NULLs rank below everything (bucket 0).

Columns must be numeric / date / timestamp (cast to double for binning).
Strings have no cheap order-preserving numeric image — use `cols:` for
string-led clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_BINNABLE = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
             T.TimestampType)


def _as_double(col: str, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, (T.DateType, T.TimestampType)):
        return F.col(col).cast("long").cast("double")
    return F.col(col).cast("double")


def zorder_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One narrow aggregate pass -> {col: (min, max)}. Sampled callers are
    fine: `width_bucket` clamps out-of-range values into the end bins."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    bad = [c for c in cols
           if c not in dtypes or not isinstance(dtypes[c], _BINNABLE)]
    if bad:
        raise ValueError(
            f"zorder columns must be numeric/date/timestamp; got {bad} "
            f"(use write_sort=cols:... for string clustering)")
    aggs = []
    for c in cols:
        v = _as_double(c, dtypes[c])
        aggs.append(F.min(v).alias(f"_mn_{c}"))
        aggs.append(F.max(v).alias(f"_mx_{c}"))
    row = df.agg(*aggs).collect()[0]
    return {c: (row[f"_mn_{c}"], row[f"_mx_{c}"]) for c in cols}


def zorder_key(df: DataFrame, cols: list[str],
               stats: dict[str, tuple[float, float]] | None = None,
               total_bits: int = 48) -> F.Column:
    """Morton interleave of per-column uniform ranks as a long Column.

    `total_bits` is split evenly (2 cols -> 24 bits each, 16.7M bins);
    column i contributes bit b to output position b*n + i, so the curve
    alternates columns at every scale — the square-region property."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    st = stats if stats is not None else zorder_stats(df, cols)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    n = len(cols)
    bits = max(1, total_bits // n)
    nbins = (1 << bits) - 2  # width_bucket emits 0..nbins+1 -> fits `bits`
    ranks = []
    for c in cols:
        mn, mx = st[c]
        if mn is None or mx is None or float(mn) == float(mx):
            ranks.append(F.lit(0).cast("long"))  # constant/all-NULL column
            continue
        v = _as_double(c, dtypes[c])
        r = F.width_bucket(v, F.lit(float(mn)), F.lit(float(mx)),
                           F.lit(nbins))
        ranks.append(F.coalesce(r, F.lit(0)).cast("long"))  # NULLs first
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            z = z + (F.shiftleft(
                F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i))
    return z
