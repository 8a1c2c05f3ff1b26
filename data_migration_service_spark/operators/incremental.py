"""Incremental maintenance of materialized aggregates over SnapshotTable.

A 100 TB table's consumers keep materialized rollups (rows per repo, bytes
per language, ...). Recomputing them after every epoch is an O(table) scan;
this module maintains them in O(changed data):

    1. bucket pruning by METADATA — a bucket whose (base, delta-list)
       manifest references are identical in both snapshots cannot have
       changed (same property the changefeed uses), so it is never read;
    2. within changed buckets, the delta of any SUM-decomposable aggregate
       (count, sum) is  agg(new live rows) − agg(old live rows),
       computed as one signed union + one partial-aggregated shuffle;
    3. the delta merges into the previous materialized state by key —
       a broadcast-sized join in practice (group cardinality ≪ row count).

Correct across the engine's whole operation mix (LWW merges, deletes,
re-inserts, compactions, rebucket) because it diffs logical LIVE states,
not physical files: a compaction-only interval prunes to the compacted
buckets and then diffs to an empty delta.

Reference: the reference has one aggregate — per-tenant COUNT(*) for
verification (DataVerificationService.java:176-183) — recomputed from
scratch each run. Incremental maintenance is what that becomes when the
table stops fitting a scan budget.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_migration_service_spark.operators.changefeed import changed_buckets
from data_migration_service_spark.tables.lake import SnapshotTable


def agg_snapshot(
    table: SnapshotTable,
    group_cols: Sequence[str],
    measures: Mapping[str, Column],
    snapshot: int | None = None,
    buckets: Sequence[int] | None = None,
) -> DataFrame:
    """Bootstrap (or bucket-restricted) aggregate of live rows: one
    partial-aggregated shuffle. `measures` are per-row expressions combined
    with SUM — the decomposability that makes deltas exact."""
    snap = table.load_snapshot(snapshot) if snapshot is not None else table.current()
    live = table.read(snapshot=snap, buckets=list(buckets) if buckets is not None else None)
    return live.groupBy(*group_cols).agg(
        *[F.sum(expr).alias(name) for name, expr in measures.items()]
    )


def agg_delta(
    table: SnapshotTable,
    group_cols: Sequence[str],
    measures: Mapping[str, Column],
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Per-group aggregate delta between two snapshots, reading only
    buckets whose manifest references changed. Returns group_cols +
    summed measure deltas (possibly negative)."""
    old_snap = table.load_snapshot(from_snapshot)
    new_snap = (table.load_snapshot(to_snapshot) if to_snapshot is not None
                else table.current())
    buckets = changed_buckets(old_snap, new_snap)
    if buckets == []:
        empty = agg_snapshot(table, group_cols, measures, buckets=[])
        return empty  # no bucket changed -> structurally empty delta

    old = table.read(snapshot=old_snap, buckets=buckets)
    new = table.read(snapshot=new_snap, buckets=buckets)
    signed = new.withColumn("_sign", F.lit(1)).unionByName(
        old.withColumn("_sign", F.lit(-1))
    )
    return signed.groupBy(*group_cols).agg(
        *[F.sum(F.col("_sign") * expr).alias(name)
          for name, expr in measures.items()]
    )


def apply_agg_delta(
    prev: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    measure_names: Sequence[str],
    drop_when_zero: str | None = None,
) -> DataFrame:
    """Merge a delta into the previous materialized aggregate: full-outer
    join on the group key, sum with missing-as-zero. `drop_when_zero` names
    the row-count measure; groups whose count reaches 0 are removed so the
    maintained state stays identical to a from-scratch recompute."""
    group_cols = list(group_cols)
    d = delta.select(
        *group_cols,
        *[F.col(m).alias(f"_d_{m}") for m in measure_names],
    )
    merged = prev.join(d, group_cols, "full_outer").select(
        *group_cols,
        *[
            (F.coalesce(F.col(m), F.lit(0)) + F.coalesce(F.col(f"_d_{m}"), F.lit(0)))
            .alias(m)
            for m in measure_names
        ],
    )
    if drop_when_zero is not None:
        merged = merged.where(F.col(drop_when_zero) > 0)
    return merged
