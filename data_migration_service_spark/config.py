"""Engine configuration.

The reference drives everything from application.properties (table list,
namespaces, datasources — DBConfigReader.java:14-36). The Spark engine needs
far less: one lake-table identifier per target, declared merge keys, a
checkpoint root, and scale knobs (bucket count, salt factor). Keys are
declared, not discovered from information_schema (reference
DBSqlGenerator.java:162-168), because the engine owns its tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Configuration for one CDC replay target.

    Attributes:
        table_path: root directory of the snapshot-committed target table.
        key_cols: merge key, default (repo, path) per the north rule.
        lsn_col: total commit order column (binlog/WAL sequence).
        op_col: change kind column: insert | update | delete.
        n_buckets: hash-bucket count of the target layout. Buckets are the
            unit of copy-on-write: a MERGE only rewrites buckets that contain
            changed keys. Size so one bucket's data fits an executor
            comfortably; at 100 TB with ~8 GB per bucket that is ~16k buckets.
        salt_factor: max sub-splits of one hot key's shuffle partition
            (reference analogue: per-tenant Steps; north_rule requires
            explicit hot-repo salting). 0 = auto: each merge-on-read batch
            probes its own bucket histogram and picks the fan-out that
            flattens the hottest bucket to the mean (operators/skew_probe).
        checkpoint_path: streaming checkpoint + lineage root.
        mismatch_report_cap: verification report row cap (reference
            DataVerificationService.java:45-46 caps at 100 + "..more").
        quarantine_path: dead-letter dir for malformed events (null key /
            null LSN / unknown op). None = any malformed event fails the
            batch. The Spark re-expression of the reference's skip policy
            (DataMigrationService.java:51,160: skip DuplicateKeyException
            up to skipLimit, then fail the step).
        skip_limit: max malformed events per batch before the batch fails
            even with a quarantine dir (reference skipLimit = 10; default
            kept for parity — raise it for lenient tails). None = no limit.
        commit_retries: optimistic-concurrency retries on snapshot commit.
            A commit whose HEAD moved re-validates against the new snapshot
            and re-applies when the concurrent commits touched disjoint
            buckets (SnapshotTable._rebase_keep) — lets background
            compaction commute with streaming ingest instead of losing its
            rewrite. 0 = strict fail-on-conflict.
    """

    table_path: str
    key_cols: tuple[str, ...] = ("repo", "path")
    lsn_col: str = "lsn"
    op_col: str = "op"
    n_buckets: int = 64
    salt_factor: int = 8
    checkpoint_path: str | None = None
    mismatch_report_cap: int = 100
    merge_mode: str = "cow"        # "cow" | "mor" (operators/merge.py) | "patch" (cell-level LWW, operators/patch.py)
    compact_threshold: int = 8     # mor: compact a bucket at this delta depth
    quarantine_path: str | None = None
    skip_limit: int | None = 10    # reference skipLimit constant
    commit_retries: int = 2
    # Multi-writer fan-in: each CDC stream writing this table sets its own
    # writer_id, giving it a namespaced exactly-once epoch counter
    # ("epoch.<writer_id>" snapshot prop) — per-shard binlog tails of a
    # sharded source can then ingest into ONE lake table concurrently,
    # their delta appends commuting via the commit rebase. None = the
    # single-writer "epoch" prop (the common case).
    writer_id: str | None = None
    # Bits per (delta dir, bucket) key Bloom filter in the `_stats.json`
    # sidecar (tables/lake.py): lets point lookups skip delta dirs that
    # cannot contain a probed key. 4096 bits = 64 longs ~ 0.5 KB hex per
    # (dir, bucket); at ~600 keys per bucket-slice of a batch that is a
    # ~5% false-positive rate with 2 probes — i.e. a lookup between
    # compactions opens ~1 of N delta dirs instead of all N. 0 = off
    # (one narrow Spark aggregate per MOR apply is the write cost).
    bloom_bits: int = 4096
    table_props: dict = field(default_factory=dict)
