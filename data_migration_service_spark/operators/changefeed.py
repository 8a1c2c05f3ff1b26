"""Changefeed — emit the logical change set between two snapshots.

The engine consumes a change log; this is the inverse: any downstream
consumer (index builder, cache invalidator, another replica of this very
engine) can ask "what changed between snapshot A and B?" and get ordered
insert/update/delete events — Iceberg's incremental read / Delta CDF
re-expressed over SnapshotTable.

Plan shape (the 100 TB property): the diff never touches an unchanged
bucket. A bucket's content is fully determined by its (base dir, delta dir
list) in the manifest, so buckets whose references are identical in both
snapshots are skipped by metadata comparison alone — a compaction-only
interval (rewrites, zero logical change) still prunes to just the compacted
buckets and then diffs to empty. The remaining buckets are diffed by ONE
full-outer join on the merge key over the two LWW-reduced states, which
also makes the result correct across ANY operation mix (merges, deletes,
compactions, schema evolution) — it reports logical state change, not
physical file history.

Event classification per key (old = state at `from_snapshot`, new = at
`to_snapshot`; "live" = present and not tombstoned):

    old     new     -> event
    absent  live    -> insert
    dead    live    -> insert      (re-insert after delete)
    live    live    -> update      (only if the winning LSN moved)
    live    dead    -> delete      (tombstone's LSN = deletion order)
    live    absent  -> delete      (physically dropped, e.g. truncate)

Reference note: the closest feature in the reference is re-migration of
specific records (DataMigrationService.java:312-342) — which presumes you
already know what changed. The changefeed computes that set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_service_spark.tables.lake import (
    BUCKET_COL,
    DELETED_COL,
    SnapshotTable,
    Snapshot,
)


def changed_buckets(a: Snapshot, b: Snapshot) -> list[int] | None:
    """Buckets whose manifest references differ between two snapshots —
    pure metadata, no data touched. Returns None when the bucket layouts
    are incomparable (n_buckets changed via rebucket) -> diff everything."""
    if a.n_buckets != b.n_buckets:
        return None
    out = []
    for bk in set(a.buckets) | set(b.buckets) | set(a.deltas) | set(b.deltas):
        ref_a = (a.buckets.get(bk), tuple(a.deltas.get(bk, [])))
        ref_b = (b.buckets.get(bk), tuple(b.deltas.get(bk, [])))
        if ref_a != ref_b:
            out.append(bk)
    return sorted(out)


def table_changes(
    table: SnapshotTable,
    from_snapshot: int,
    to_snapshot: int | None = None,
    include_old: bool = False,
) -> DataFrame:
    """Ordered change events turning `from_snapshot`'s state into
    `to_snapshot`'s (default: current). Columns: op, lsn, then the merge
    key + data columns of the NEW snapshot's schema (data columns NULL for
    deletes, like the engine's own ingest format).

    `include_old=True` appends `old_<col>` before-image columns (NULL
    unless the key was live at `from_snapshot`) — what an index builder
    or cache invalidator needs to retract the entry the new value
    replaces. Same plan either way; the old side is already in the join."""
    old_snap = table.load_snapshot(from_snapshot)
    new_snap = (table.load_snapshot(to_snapshot) if to_snapshot is not None
                else table.current())
    lsn_col = new_snap.props.get("lsn_col", "lsn")
    keys = list(new_snap.key_cols)

    buckets = changed_buckets(old_snap, new_snap)
    data_cols = [f.name for f in new_snap.schema().fields
                 if f.name not in (DELETED_COL, BUCKET_COL)
                 and f.name not in keys and f.name != lsn_col]

    old = table.read(snapshot=old_snap, buckets=buckets, include_deleted=True)
    new = table.read(snapshot=new_snap, buckets=buckets, include_deleted=True)
    o = old.select(
        *keys,
        F.col(lsn_col).alias("_o_lsn"),
        F.col(DELETED_COL).alias("_o_dead"),
        *([F.col(c).alias(f"_o_{c}") for c in data_cols]
          if include_old else []),
    )
    n = new.select(
        *keys,
        F.col(lsn_col).alias("_n_lsn"),
        F.col(DELETED_COL).alias("_n_dead"),
        *[F.col(c).alias(f"_n_{c}") for c in data_cols],
    )
    j = o.join(n, keys, "full_outer")

    old_live = F.col("_o_lsn").isNotNull() & ~F.coalesce("_o_dead", F.lit(True))
    new_live = F.col("_n_lsn").isNotNull() & ~F.coalesce("_n_dead", F.lit(True))
    op = (
        F.when(new_live & ~old_live, F.lit("insert"))
        .when(new_live & old_live & (F.col("_n_lsn") != F.col("_o_lsn")),
              F.lit("update"))
        .when(old_live & ~new_live, F.lit("delete"))
    )
    # delete order: the tombstone's LSN if one exists (physical drop keeps
    # the old row's LSN as the best available ordering hint)
    lsn_out = F.when(op == "delete",
                     F.coalesce("_n_lsn", "_o_lsn")).otherwise(F.col("_n_lsn"))
    return (
        j.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .select(
            "op",
            lsn_out.alias(lsn_col),
            *keys,
            *[F.when(F.col("op") != "delete", F.col(f"_n_{c}")).alias(c)
              for c in data_cols],
            *([F.when(old_live, F.col(f"_o_{c}")).alias(f"old_{c}")
               for c in data_cols] if include_old else []),
        )
    )
