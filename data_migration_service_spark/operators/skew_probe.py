"""Per-batch skew probe → salt-factor choice (SURVEY §7 hard part 5).

At 10^10 events one hot repo can dominate a batch; the right salt factor is
a property of THIS batch's key histogram, not a static config. The probe is
one cheap aggregate over the batch (bucket-level counts — n_buckets rows to
the driver, never per-key), and the recommendation is the fan-out needed to
bring the hottest bucket down to the mean bucket load.

`EngineConfig.salt_factor = 0` ("auto") makes cdc_apply run the probe per
batch; a fixed positive value skips it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_service_spark.tables.lake import BUCKET_COL


def bucket_histogram(src: DataFrame) -> list[tuple[int, int]]:
    """(bucket, rows) for one projected batch (carries BUCKET_COL)."""
    rows = src.groupBy(BUCKET_COL).agg(F.count(F.lit(1)).alias("n")).collect()
    return [(int(r[BUCKET_COL]), int(r["n"])) for r in rows]


def suggest_salt_factor(hist: list[tuple[int, int]],
                        max_salt: int = 32,
                        n_buckets: int | None = None,
                        min_rows_per_split: int = 4096) -> int:
    """Fan-out that flattens the hottest bucket to the mean bucket load.

    salt = ceil(max_bucket_rows / mean_bucket_rows), clamped to [1,
    max_salt]. A uniform batch gets 1 (no extra files); a batch where one
    bucket holds 10x the mean gets 10 writer tasks for that bucket.

    `n_buckets` (the TABLE's bucket count) floors the mean's denominator:
    a batch concentrated in one bucket has mean == max over non-empty
    buckets alone, which would yield salt=1 for exactly the most skewed
    batch the probe exists to catch. With the table spread as denominator
    that batch fans out fully. `min_rows_per_split` stops a tiny
    concentrated batch from shattering into max_salt near-empty files: the
    fan-out never exceeds what keeps each writer task >= that many rows.
    """
    if not hist:
        return 1
    counts = [n for _, n in hist]
    denom = max(len(counts), n_buckets or 0)
    mean = sum(counts) / denom
    if mean <= 0:
        return 1
    peak = max(counts)
    need = int(-(-peak // mean))  # ceil
    cap_by_size = max(1, peak // min_rows_per_split)
    return max(1, min(need, max_salt, cap_by_size))
