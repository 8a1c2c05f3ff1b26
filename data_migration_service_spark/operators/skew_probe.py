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
                        max_salt: int = 32) -> int:
    """Fan-out that flattens the hottest bucket to the mean bucket load.

    salt = ceil(max_bucket_rows / mean_bucket_rows), clamped to [1,
    max_salt]. A uniform batch gets 1 (no extra files); a batch where one
    bucket holds 10x the mean gets 10 writer tasks for that bucket.
    """
    if not hist:
        return 1
    counts = [n for _, n in hist]
    mean = sum(counts) / len(counts)
    if mean <= 0:
        return 1
    need = int(-(-max(counts) // mean))  # ceil
    return max(1, min(need, max_salt))
