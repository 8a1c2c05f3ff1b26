"""Property-based adversarial replay tests (SURVEY.md §5.3).

For ANY partition of the change log into epochs, ANY merge mode, and
at-least-once delivery, the engine's final table state must equal the batch
LWW oracle — sha256 per row. Hypothesis draws the epoch boundaries and the
adversarial delivery/mode knobs; the log itself stays seed-stable so
failures reproduce exactly.
"""

import shutil
import tempfile

import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.fixtures.cdc import (
    gen_changes,
    gen_duplicated_delivery,
)
from data_migration_service_spark.operators.merge import cdc_apply
from data_migration_service_spark.tables.lake import SnapshotTable
from tests.test_merge import TABLE_SCHEMA, assert_state_matches

N_EVENTS = 800
_CACHED = {}


def _changes(spark):
    if "ch" not in _CACHED:
        _CACHED["ch"] = gen_changes(
            spark, N_EVENTS, n_repos=6, n_paths_per_repo=10
        ).cache()
        _CACHED["dup"] = gen_duplicated_delivery(_CACHED["ch"]).cache()
    return _CACHED["ch"], _CACHED["dup"]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cuts=st.lists(
        st.integers(min_value=2, max_value=N_EVENTS - 1),
        min_size=0, max_size=4, unique=True,
    ),
    duplicated=st.booleans(),
    mode=st.sampled_from(["cow", "mor"]),
    compact_threshold=st.integers(min_value=1, max_value=4),
)
def test_any_epoch_partition_matches_oracle(
    spark, cuts, duplicated, mode, compact_threshold
):
    ch, dup = _changes(spark)
    log = dup if duplicated else ch
    bounds, lo = [], 1
    for c in sorted(cuts):
        bounds.append((lo, c - 1))
        lo = c
    bounds.append((lo, N_EVENTS))

    root = tempfile.mkdtemp(prefix="prop_replay_")
    try:
        t = SnapshotTable.create(spark, f"{root}/repos", TABLE_SCHEMA,
                                 ["repo", "path"], 8)
        cfg = EngineConfig(
            table_path=f"{root}/repos", n_buckets=8, salt_factor=2,
            merge_mode=mode, compact_threshold=compact_threshold,
        )
        for e, (a, b) in enumerate(bounds):
            cdc_apply(t, log.where(F.col("lsn").between(a, b)), cfg,
                      epoch=e, collect_stats=False)
        assert_state_matches(t, ch)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cuts=st.lists(
        st.integers(min_value=2, max_value=N_EVENTS - 1),
        min_size=1, max_size=3, unique=True,
    ),
    fail_first=st.lists(st.booleans(), min_size=4, max_size=4),
    mode=st.sampled_from(["cow", "mor"]),
)
def test_audited_replay_with_rejections_matches_oracle(
    spark, cuts, fail_first, mode
):
    """Write-audit-publish under adversarial audits: for ANY epoch
    partition, any epoch whose first audit REJECTS (staged commit
    discarded) and is then re-applied with a passing audit must leave the
    exact oracle state — no lost epochs, no double-apply, no leftover
    staged manifests."""
    from data_migration_service_spark.api import Engine

    ch, _ = _changes(spark)
    bounds, lo = [], 1
    for c in sorted(cuts):
        bounds.append((lo, c - 1))
        lo = c
    bounds.append((lo, N_EVENTS))

    root = tempfile.mkdtemp(prefix="prop_wap_")
    try:
        t = SnapshotTable.create(spark, f"{root}/repos", TABLE_SCHEMA,
                                 ["repo", "path"], 8)
        cfg = EngineConfig(table_path=f"{root}/repos", n_buckets=8,
                           merge_mode=mode)
        eng = Engine(spark, cfg)
        for e, (a, b) in enumerate(bounds):
            batch = ch.where(F.col("lsn").between(a, b))
            if fail_first[e % len(fail_first)]:
                res = eng.apply_audited(batch, e, gate=lambda df: False)
                assert not res["published"]
                assert t.staged_snapshots() == []
            res = eng.apply_audited(batch, e, gate=lambda df: True)
            assert res["published"] and not res["skipped"]
        assert t.staged_snapshots() == []
        assert_state_matches(t, ch)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# cell-level (patch) fold: ANY epoch partition + at-least-once re-delivery
# must land on patch_fold(full log) — the associativity the per-cell LSN
# bookkeeping guarantees (operators/patch.py)
# ---------------------------------------------------------------------------

N_PATCH = 600


def _patch_log(spark):
    if "plog" not in _CACHED:
        from tests.test_patch import synth_log

        _CACHED["plog"] = synth_log(spark, n=N_PATCH, n_repos=5,
                                    n_paths=17).cache()
    return _CACHED["plog"]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cuts=st.lists(
        st.integers(min_value=2, max_value=N_PATCH - 1),
        min_size=0, max_size=3, unique=True,
    ),
    redeliver=st.booleans(),
)
def test_any_patch_epoch_partition_matches_fold(spark, cuts, redeliver):
    from data_migration_service_spark.operators.patch import (
        create_patch_table,
        patch_apply,
        patch_fold,
        read_patched,
    )
    from tests.test_patch import DATA_SCHEMA, assert_same_state

    log = _patch_log(spark)
    bounds, lo = [], 1
    for c in sorted(cuts):
        bounds.append((lo, c))
        lo = c + 1
    bounds.append((lo, N_PATCH))

    root = tempfile.mkdtemp(prefix="dms_prop_patch_")
    try:
        t = create_patch_table(spark, root + "/t", DATA_SCHEMA,
                               ["repo", "path"], 8)
        cfg = EngineConfig(table_path=root + "/t", n_buckets=8,
                           salt_factor=2, merge_mode="patch")
        for e, (a, b) in enumerate(bounds):
            batch = log.where(F.col("lsn").between(a, b))
            patch_apply(t, batch, cfg, epoch=e)
            if redeliver:  # at-least-once: the epoch guard must no-op it
                s = patch_apply(t, batch, cfg, epoch=e)
                assert s.skipped
        assert_same_state(
            read_patched(t),
            patch_fold(log, ["repo", "path"], ["content", "lang"]))
    finally:
        shutil.rmtree(root, ignore_errors=True)
