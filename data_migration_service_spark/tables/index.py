"""Secondary (inverted) index — value -> merge-key, kept in sync by CDC.

A CDC lake table is keyed by its merge key; a query by any OTHER column
(find every (repo, path) whose `commit` is X) is a full scan. The
SecondaryIndex maintains a value->key mapping AS A CDC TABLE OF ITS OWN,
so every piece of machinery the engine already has — LWW merge,
tombstones, exactly-once epochs, snapshot commits, compaction — is
reused verbatim for index maintenance:

- **derivation**: index events come from the CHANGEFEED between the last
  indexed snapshot and now (`table_changes(include_old=True)`): each
  changed key emits an upsert of its new value and a retraction of the
  old one. Diffing STATES (not replaying the raw event batch) makes the
  index immune to whatever the main merge already resolved — late
  lower-LSN events the main table dropped never reach the index.
- **exactly-once**: the index's epoch counter IS the source snapshot id
  (monotone), so `sync()` is idempotent — a crash between main apply and
  index sync just re-runs the same interval and no-ops; a sync that
  missed several source commits catches up in one diff.
- **query**: the index rows are ~(value, key, lsn) — a fraction of the
  main table's bytes — and its files are written sorted leading with the
  value column, so a value-equality read prunes to a handful of parquet
  row groups via footer min/max before the (tiny) result joins back for
  the pruned point lookup of the main table.

Reference parity: none (the reference queries by primary key only);
engine-added, same family as Iceberg metadata-skipping + Hive-style
materialized index tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.operators.changefeed import table_changes
from data_migration_service_spark.operators.merge import (
    cdc_apply,
    current_epoch,
)
from data_migration_service_spark.tables.lake import DELETED_COL, SnapshotTable


class SecondaryIndex:
    """Inverted index over one value column of a source SnapshotTable.

    The index table's merge key is (value_col, *source key cols): one
    index row per live (value, key) pair, LWW/tombstone semantics
    identical to any engine table. NULL values are not indexed.
    """

    def __init__(self, spark: SparkSession, root: str, value_col: str,
                 source_keys: list[str], lsn_col: str = "lsn"):
        self.spark = spark
        self.root = root
        self.value_col = value_col
        self.source_keys = list(source_keys)
        self.table = SnapshotTable(spark, root)
        self.cfg = EngineConfig(
            table_path=root, key_cols=(value_col, *source_keys),
            lsn_col=lsn_col, merge_mode="mor",
            n_buckets=self.table.current().n_buckets, salt_factor=1,
        )

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "SecondaryIndex":
        """Re-open an existing index from its own metadata: the value
        column is the create-time `index_col` table prop, the source keys
        are the remaining merge-key columns."""
        t = SnapshotTable(spark, root)
        snap = t.current()
        value_col = snap.props.get("index_col")
        if not value_col:
            raise ValueError(f"{root} is not a secondary index "
                             f"(missing index_col prop)")
        lsn_col = snap.props.get("lsn_col", "lsn")
        keys = [k for k in snap.key_cols if k != value_col]
        return cls(spark, root, value_col, keys, lsn_col)

    @classmethod
    def create(cls, spark: SparkSession, root: str, source: SnapshotTable,
               value_col: str, n_buckets: int = 16) -> "SecondaryIndex":
        src_snap = source.current()
        if value_col in src_snap.key_cols:
            raise ValueError(
                f"{value_col} is part of the merge key — it needs no index")
        fields = {f.name: f for f in src_snap.schema().fields}
        if value_col not in fields:
            raise ValueError(f"no column {value_col} in source schema")
        lsn_col = src_snap.props.get("lsn_col", "lsn")
        schema = T.StructType(
            [fields[value_col]]
            + [fields[k] for k in src_snap.key_cols]
            + [T.StructField(lsn_col, T.LongType(), False)]
        )
        # Bucket by the VALUE column alone (round 3, Snapshot.bucket_cols):
        # a value-equality lookup then prunes to the value's bucket at the
        # MANIFEST level — before row-group stats even load — turning
        # find_keys into a one-bucket read at any index size. A hot value
        # concentrates its rows in one bucket, but a value lookup must
        # read those rows wherever they live; the salted writer still
        # fans the bucket's files out across tasks.
        SnapshotTable.create(
            spark, root, schema,
            key_cols=[value_col, *src_snap.key_cols],
            n_buckets=n_buckets, lsn_col=lsn_col,
            bucket_cols=[value_col],
            props={"index_of": source.root, "index_col": value_col},
        )
        return cls(spark, root, value_col, list(src_snap.key_cols), lsn_col)

    # ---- maintenance ----

    def sync(self, source: SnapshotTable) -> dict:
        """Bring the index up to the source's current snapshot.

        One changefeed diff (bucket-pruned by manifest comparison) over
        the interval [last indexed snapshot, current], transformed to
        index upserts/retractions, applied through the standard CDC
        merge with epoch = source snapshot id (idempotent: re-running a
        covered interval skips)."""
        to_snap = source.current()
        done = current_epoch(self.table, self.cfg)
        from_sid = done if done >= 0 else None
        if from_sid is not None and from_sid >= to_snap.snapshot_id:
            return {"skipped": True, "indexed_snapshot": from_sid}
        lsn = self.cfg.lsn_col
        keys = self.source_keys
        if from_sid is None:
            # first sync: bootstrap from the FULL current state (robust
            # even when the source's early snapshots were expired)
            mode = "bootstrap"
            events = source.read(snapshot=to_snap).select(
                F.col(self.value_col), *keys, F.col(lsn),
                F.lit("insert").alias("op"),
            ).where(F.col(self.value_col).isNotNull())
        else:
            try:
                ch = table_changes(source, from_sid, to_snap.snapshot_id,
                                   include_old=True)
                mode = "changefeed"
            except FileNotFoundError:
                # the last-indexed snapshot was EXPIRED on the source —
                # the incremental diff has no base. Fall back to one full
                # reconciliation: state-vs-state anti-joins (both sides
                # narrow), still exactly-once under the same epoch tag.
                mode = "reconcile"
                ch = None
            if ch is not None:
                v_new = F.col(self.value_col)
                v_old = F.col(f"old_{self.value_col}")
                ins = (
                    ch.where((F.col("op") != "delete") & v_new.isNotNull())
                    .select(v_new.alias(self.value_col), *keys, F.col(lsn),
                            F.lit("insert").alias("op"))
                )
                # retract the old entry when the key died or value moved
                dels = (
                    ch.where(v_old.isNotNull()
                             & ((F.col("op") == "delete") | v_new.isNull()
                                | (v_new != v_old)))
                    .select(v_old.alias(self.value_col), *keys, F.col(lsn),
                            F.lit("delete").alias("op"))
                )
                events = ins.unionByName(dels)
            else:
                join_cols = [self.value_col, *keys]
                src = source.read(snapshot=to_snap).select(
                    F.col(self.value_col), *keys, F.col(lsn)
                ).where(F.col(self.value_col).isNotNull())
                cur = self.table.read().select(
                    F.col(self.value_col), *keys, F.col(lsn))
                ins = (src.join(cur, join_cols, "left_anti")
                       .select(*join_cols, F.col(lsn),
                               F.lit("insert").alias("op")))
                # +1: the retraction must BEAT the stored entry's own LSN
                # in the index's LWW merge (no real event sits between —
                # the pair provably no longer exists in the source)
                dels = (cur.join(src, join_cols, "left_anti")
                        .select(*join_cols,
                                (F.col(lsn) + 1).alias(lsn),
                                F.lit("delete").alias("op")))
                events = ins.unionByName(dels)
        stats = cdc_apply(self.table, events, self.cfg,
                          epoch=to_snap.snapshot_id)
        return {"skipped": stats.skipped,
                "indexed_snapshot": to_snap.snapshot_id,
                "mode": mode,
                "rows_inserted": stats.rows_inserted,
                "rows_deleted": stats.rows_deleted}

    def compact(self) -> None:
        """Fold the index's delta dirs into value-sorted base files.

        Read performance hinges on this: L0 delta files are written
        UNSORTED (the engine's LSM write-path rule), so a freshly-synced
        index neither skips row groups nor avoids the MOR reduce. A
        compacted index does both — measured 3.6x vs the full-table scan
        at sandbox scale, vs SLOWER than the scan when left at L0
        (BENCH.md). Sync-heavy indexes self-compact at the configured
        delta depth; call this explicitly before read-heavy phases."""
        from data_migration_service_spark.operators.merge import compact

        compact(self.table, self.cfg)

    # ---- query ----

    def find_keys(self, values) -> DataFrame:
        """Merge keys currently mapped to any of `values` — a Python list
        (driver-known values: pushed as an IN predicate below the MOR
        reduce into the parquet scan; on a COMPACTED index the
        value-leading file sort makes row-group min/max stats skip nearly
        everything else) or a single-column DataFrame (a LARGE probe set,
        e.g. another table's column: resolved with one size-gated
        semi-join instead of a driver-side literal list)."""
        from data_migration_service_spark.operators.merge import (
            maybe_broadcast_keys,
            probe_keys,
        )

        snap = self.table.current()
        probe = (values.toDF(self.value_col).distinct()
                 if isinstance(values, DataFrame)
                 else self.spark.createDataFrame(
                     [(v,) for v in values],
                     T.StructType([T.StructField(
                         self.value_col,
                         snap.schema()[self.value_col].dataType)])))
        buckets = None
        n = None
        if snap.layout_cols() == [self.value_col]:
            # value-bucketed layout (round 3): the probed values' bucket
            # set IS the read scope — one keys-sized job, then a read of
            # only those buckets (legacy full-key-bucketed indexes skip
            # this and rely on row-group stats alone)
            hits, n = probe_keys(probe, [self.value_col], snap.n_buckets)
            buckets = hits
        df = self.table.read(columns=[self.value_col, *self.source_keys],
                             buckets=buckets)
        if isinstance(values, DataFrame):
            if n is None:
                n = probe.count()
            matched = df.join(maybe_broadcast_keys(probe, n),
                              self.value_col, "left_semi")
        else:
            matched = df.where(F.col(self.value_col).isin(list(values)))
        return matched.select(*self.source_keys).distinct()

    def lookup(self, engine, values: list, columns=None) -> DataFrame:
        """find_keys + the engine's pruned point lookup of the source."""
        return engine.lookup(self.find_keys(values), columns=columns)
