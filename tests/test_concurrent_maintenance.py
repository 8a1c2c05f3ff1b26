"""Online maintenance under continuous ingest — the operational mode the
optimistic commit rebase (tables/lake.py) exists for.

A maintenance thread runs compact() in a loop while the ingest thread
applies epochs back-to-back. Every compaction commit races the stream: its
expected_parent is stale whenever an epoch landed between its read and its
commit, and the rebase must (a) keep every concurrently-appended delta dir,
(b) keep the stream's epoch tag, and (c) leave the final table state
sha256-identical to a serial replay. This is the single-table version of
"Iceberg RewriteDataFiles runs next to the streaming job" — at 100 TB
compaction cannot require stopping the stream.

Threads share one SparkSession (thread-safe by design); each side holds its
own SnapshotTable handle, as two separate driver processes would.
"""

import threading
import time

from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import gen_changes
from data_migration_service_spark.operators.merge import cdc_apply, compact
from data_migration_service_spark.tables.lake import SnapshotTable
from data_migration_service_spark.tables.metastore import CommitConflict
from tests.test_merge import assert_state_matches, make_table


def test_online_compaction_under_continuous_ingest(spark, tmp_path):
    n_epochs, per_epoch = 8, 1000
    ch = gen_changes(spark, n_epochs * per_epoch,
                     n_repos=12, n_paths_per_repo=25).cache()
    ch.count()  # materialize before the threads start timing-sensitive work
    t = make_table(spark, tmp_path)
    cfg = EngineConfig(
        table_path=str(tmp_path / "repos"), n_buckets=16, merge_mode="mor",
        compact_threshold=10_000,  # auto-compaction off: the racing
        commit_retries=5,          # maintenance thread owns all compaction
    )

    errors: list[BaseException] = []
    stop = threading.Event()
    compactions = {"ok": 0, "conflict": 0}

    def maintenance():
        # a separate handle, as a separate maintenance process would hold
        t2 = SnapshotTable(spark, t.root)
        while not stop.is_set():
            try:
                compact(t2, cfg)
                compactions["ok"] += 1
            except CommitConflict:
                # beyond the retry budget: a real maintenance daemon just
                # goes around again — the next pass reads a fresh snapshot
                compactions["conflict"] += 1
            except BaseException as e:  # noqa: BLE001 - surfaced below
                errors.append(e)
                return
            time.sleep(0.05)

    mt = threading.Thread(target=maintenance, daemon=True)
    mt.start()
    try:
        for e in range(n_epochs):
            lo, hi = e * per_epoch + 1, (e + 1) * per_epoch
            st = cdc_apply(t, ch.where(F.col("lsn").between(lo, hi)),
                           cfg, epoch=e)
            assert not st.skipped
    finally:
        stop.set()
        mt.join(timeout=120)
    assert not mt.is_alive()
    assert not errors, errors

    # quiesced: one last fold so the final state is fully compacted
    compact(t, cfg)
    cur = t.current()
    assert cur.props["epoch"] == str(n_epochs - 1)   # no epoch tag lost
    assert cur.deltas == {}
    assert compactions["ok"] >= 1                    # maintenance really ran
    # the snapshot ledger stayed a single linear chain (no forks, no gaps
    # among the retained manifests)
    ids = t.snapshots()
    parents = {i: t.load_snapshot(i).parent for i in ids}
    for prev, nxt in zip(ids, ids[1:]):
        assert parents[nxt] == prev, f"forked ledger at {nxt}"
    # every referenced data dir exists on disk (no delta lost to a rebase)
    import os
    for d in set(cur.buckets.values()):
        assert os.path.isdir(os.path.join(t.root, "data", d))
    # exact sha256-per-row final state vs the LWW oracle
    assert_state_matches(t, ch)
