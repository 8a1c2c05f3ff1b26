"""Incremental distinct counting via mergeable per-bucket HLL sketches.

`operators/incremental.py` maintains SUM-decomposable aggregates in
O(changed buckets) per epoch. COUNT(DISTINCT ...) is the aggregate that
framework cannot cover: distinct is not signed-union decomposable (you
cannot subtract a departed row — it may still exist elsewhere). At 10^10
rows, re-scanning the table per epoch for a distinct count is exactly the
cost incremental maintenance exists to avoid.

The mergeable-sketch formulation closes the gap:

    1. one HLL sketch PER BUCKET (Spark's built-in Datasketches
       `hll_sketch_agg` — JVM, partial-aggregated, no UDF), keyed by the
       layout's bucket id;
    2. per epoch, manifest-diff pruning (the changefeed's metadata rule)
       identifies changed buckets; ONLY those buckets are re-sketched from
       their current live rows — deletes and LWW overwrites are handled by
       construction, because a bucket's sketch is always rebuilt from
       state, never patched;
    3. the table-wide distinct estimate is `hll_union_agg` over the
       n_buckets sketch rows — a metadata-sized job, never a data scan.

Cost per epoch: O(changed buckets' rows) + O(n_buckets) union. The sketch
column is a plain binary — persist it as parquet next to the table and the
maintenance loop is a 3-line update. Estimate error is the Datasketches
HLL bound (~1.04/sqrt(2^lg_k): 1.6% typical at the default lg_k=12);
sketches built from identical rows are identical binaries, so the
incremental path's estimate EQUALS the from-scratch estimate, not merely
approximates it (pinned in tests).

Reference: the reference's only distinct is tenant discovery
(SELECT DISTINCT, SURVEY §2 A2/S6), recomputed per run; this is that
operation made affordable per-epoch at lake scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_service_spark.functions.hashing import (
    FIELD_SEP,
    canonical_col,
)
from data_migration_service_spark.operators.changefeed import changed_buckets
from data_migration_service_spark.tables.lake import SnapshotTable, bucket_expr

__all__ = ["distinct_sketch", "distinct_sketch_update", "distinct_estimate"]


def _sketch_value(df: DataFrame, cols: Sequence[str]):
    """Canonical serialization of the distinct tuple (same rules as row
    hashing: typed rendering + NULL sentinel — a NULL is a distinct value,
    GROUP-BY semantics, deterministic across runs and engines)."""
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    return F.concat_ws(
        FIELD_SEP, *[canonical_col(F.col(c), dtypes[c]) for c in cols])


def distinct_sketch(
    table: SnapshotTable,
    cols: Sequence[str],
    snapshot: int | None = None,
    buckets: Sequence[int] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Bootstrap (or bucket-restricted) sketch state: one row per bucket
    holding the HLL sketch of the live rows' `cols` tuples. One
    partial-aggregated shuffle on the bucket id; a bucket with no live
    rows yields no row (the empty sketch is absence)."""
    snap = (table.load_snapshot(snapshot) if snapshot is not None
            else table.current())
    live = table.read(
        snapshot=snap,
        buckets=list(buckets) if buckets is not None else None,
        columns=[c for c in cols if c not in snap.key_cols],
    )
    return (
        live.withColumn("bucket",
                        bucket_expr(snap.layout_cols(), snap.n_buckets))
        .groupBy("bucket")
        .agg(F.hll_sketch_agg(_sketch_value(live, list(cols)), lg_k)
             .alias("sketch"))
    )


def distinct_sketch_update(
    table: SnapshotTable,
    prior: DataFrame,
    cols: Sequence[str],
    from_snapshot: int,
    to_snapshot: int | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Advance the sketch state from `from_snapshot` to `to_snapshot`
    (default HEAD): buckets whose manifest references are identical carry
    their prior sketch row verbatim (never read); changed buckets are
    re-sketched from their current live rows, so deletes, LWW overwrites
    and compaction-induced rewrites all land exactly. A rebucket between
    the snapshots makes bucket ids incomparable -> full re-sketch."""
    old = table.load_snapshot(from_snapshot)
    new = (table.load_snapshot(to_snapshot) if to_snapshot is not None
           else table.current())
    changed = changed_buckets(old, new)
    if changed is None:  # layout evolved: incomparable -> rebuild
        return distinct_sketch(table, cols, snapshot=new.snapshot_id,
                               lg_k=lg_k)
    if not changed:
        return prior
    carry = prior.where(~F.col("bucket").isin(list(changed)))
    fresh = distinct_sketch(table, cols, snapshot=new.snapshot_id,
                            buckets=changed, lg_k=lg_k)
    return carry.unionByName(fresh)


def distinct_estimate(sketches: DataFrame) -> int:
    """Table-wide distinct estimate: union the per-bucket sketches
    (mergeable — n_buckets rows, one tiny aggregate) and read the
    estimate. 0 for an empty state.

    The union runs in CANONICAL ORDER (one partition, sorted by bucket):
    Datasketches' HLL union estimate is merge-order-sensitive (measured:
    identical per-bucket sketches, different row order -> estimates a few
    counts apart), so an unordered union would make "incremental ==
    from-scratch" flap. n_buckets rows make the single partition free."""
    row = (
        sketches.coalesce(1).sortWithinPartitions("bucket")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"))
        .collect()[0]
    )
    return int(row["e"] or 0)
