"""Verification service semantics: count gate, hash-diff classification,
report cap, canonical row-hash rules (the reference's §1.2 quirks)."""

from pyspark.sql import functions as F

from data_migration_service_spark.fixtures.cdc import gen_tenant_table
from data_migration_service_spark.functions.hashing import (
    FIELD_SEP,
    NULL_SENTINEL,
    hash_column_order,
    row_sha256,
)
from data_migration_service_spark.operators.verify import (
    MISMATCH,
    MISSING_IN_SOURCE,
    MISSING_IN_TARGET,
    count_check,
    hash_diff,
    recheck_values,
    verify_row_hashes,
    verify_state,
)


def test_hash_column_order_case_insensitive():
    assert hash_column_order(["b", "A", "aa", "B2"]) == ["A", "aa", "b", "B2"]


def test_null_vs_space_not_collided(spark):
    """The reference's coalesce(col,' ') collides NULL with ' '
    (DBSqlGenerator.java:31). Our sentinel must not."""
    df = spark.createDataFrame([("k1", None), ("k2", " ")], "id string, v string")
    h = df.select("id", row_sha256(df, ["v"]).alias("h")).collect()
    hashes = {r["id"]: r["h"] for r in h}
    assert hashes["k1"] != hashes["k2"]


def test_row_hash_excludes_tenant_and_is_order_stable(spark):
    df = gen_tenant_table(spark, 2, 100)
    a = df.select(row_sha256(df, exclude=("tenant_id",)).alias("h"))
    # same rows, different column order -> same hash
    reordered = df.select(*sorted(df.columns, reverse=True))
    b = reordered.select(row_sha256(reordered, exclude=("tenant_id",)).alias("h"))
    assert a.exceptAll(b).count() == 0
    # tenant change must NOT change the hash
    df2 = df.withColumn("tenant_id", F.lit("zz"))
    c = df2.select(row_sha256(df2, exclude=("tenant_id",)).alias("h"))
    assert a.exceptAll(c).count() == 0


def test_count_check_and_hash_diff_classification(spark):
    src = spark.createDataFrame(
        [("r1", "a", "x"), ("r1", "b", "y"), ("r2", "c", "z")],
        "repo string, path string, content string",
    )
    tgt = spark.createDataFrame(
        [("r1", "a", "x"), ("r1", "b", "WRONG"), ("r3", "d", "w")],
        "repo string, path string, content string",
    )
    cc = {(r["repo"]): (r["src_rows"], r["tgt_rows"], r["count_ok"])
          for r in count_check(src, tgt, ["repo"]).collect()}
    assert cc["r1"] == (2, 2, True)
    assert cc["r2"] == (1, 0, False)
    assert cc["r3"] == (0, 1, False)

    diff = hash_diff(src, tgt, ["repo", "path"], F.sha2("content", 256), F.sha2("content", 256))
    st = {(r["repo"], r["path"]): r["status"] for r in diff.collect()}
    assert st[("r1", "a")] == "OK"
    assert st[("r1", "b")] == MISMATCH
    assert st[("r2", "c")] == MISSING_IN_TARGET
    assert st[("r3", "d")] == MISSING_IN_SOURCE


def test_verify_state_report_cap(spark):
    n = 500
    src = spark.range(n).select(
        F.lit("r").alias("repo"), F.col("id").cast("string").alias("path"),
        F.sha2(F.col("id").cast("string"), 256).alias("content"),
    )
    # corrupt 150 rows deterministically
    tgt = src.withColumn(
        "content",
        F.when(F.col("path").cast("long") % 3 == 0, F.lit("corrupt"))
        .otherwise(F.col("content")),
    )
    res = verify_state(src, tgt, ["repo", "path"], report_cap=100)
    assert not res.consistent
    assert res.n_mismatch == (n + 2) // 3
    assert len(res.report) == 100 and res.more


def test_verify_state_consistent_with_null_content(spark):
    src = spark.createDataFrame(
        [("r", "a", None), ("r", "b", "x")], "repo string, path string, content string"
    )
    res = verify_state(src, src, ["repo", "path"])
    assert res.consistent and res.source_rows == 2


def test_recheck_values_per_field_diff(spark):
    """J2 raw-value double-check (DataVerificationService.java:254-279):
    flagged keys are re-fetched both sides and compared per column — the
    output names exactly the differing fields."""
    src = spark.createDataFrame(
        [("r1", "a", "x", 1), ("r1", "b", "y", 2), ("r2", "c", "z", 3),
         ("r2", "d", "w", 4)],
        "repo string, path string, content string, qty int",
    )
    tgt = spark.createDataFrame(
        [("r1", "a", "x", 1),          # identical -> not confirmed
         ("r1", "b", "WRONG", 2),      # content differs
         ("r2", "c", "z", 99)],        # qty differs; (r2,d) missing in tgt
        "repo string, path string, content string, qty int",
    )
    flagged = spark.createDataFrame(
        [("r1", "a"), ("r1", "b"), ("r2", "c"), ("r2", "d")],
        "repo string, path string",
    )
    out = {(r["repo"], r["path"]): (r["diff_cols"], r["n_diffs"], r["confirmed"])
           for r in recheck_values(src, tgt, ["repo", "path"], flagged).collect()}
    assert out[("r1", "a")] == ("", 0, False)   # hash false-positive case
    assert out[("r1", "b")] == ("content", 1, True)
    assert out[("r2", "c")] == ("qty", 1, True)
    # missing on one side: every compared column reports as differing
    assert out[("r2", "d")] == ("content,qty", 2, True)


def test_recheck_values_null_equality(spark):
    """NULL == NULL must not count as a diff (null-safe compare), and a
    NULL-vs-value must."""
    src = spark.createDataFrame([("k", None, "v")], "id string, a string, b string")
    tgt = spark.createDataFrame([("k", None, None)], "id string, a string, b string")
    keys = spark.createDataFrame([("k",)], "id string")
    r = recheck_values(src, tgt, ["id"], keys).collect()[0]
    assert (r["diff_cols"], r["n_diffs"], r["confirmed"]) == ("b", 1, True)


def test_verify_row_hashes_tenant_excluded(spark):
    df = gen_tenant_table(spark, 3, 200).cache()
    other = df.withColumn("tenant_id", F.concat(F.col("tenant_id"), F.lit("_moved")))
    diff = verify_row_hashes(df, other, ["id1", "id2"], exclude=("tenant_id",))
    assert diff.where(F.col("status") != "OK").count() == 0
    # corrupt one value type with known canonicalization traps (bool flip)
    corrupted = df.withColumn(
        "v_bool", F.when(F.col("id1") == "k000007", ~F.col("v_bool")).otherwise(F.col("v_bool"))
    )
    diff2 = verify_row_hashes(df, corrupted, ["id1", "id2"], exclude=("tenant_id",))
    bad = diff2.where(F.col("status") != "OK").collect()
    assert len(bad) == 1 and bad[0]["id1"] == "k000007"


def test_profile_table_stats_and_one_pass(spark):
    """profile_table: exact per-column stats in long format, computed as a
    single aggregate job (no joins/windows — the cheap pre-gate must stay
    cheap)."""
    from data_migration_service_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "a", 2.25), (4, None, 2.25)],
        "id long, cat string, val double",
    )
    prof = {r["col_name"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_nulls"] == 0
    assert prof["id"]["n_distinct"] == 4
    assert (prof["id"]["min_val"], prof["id"]["max_val"]) == ("1", "4")
    assert prof["cat"]["n_nulls"] == 1 and prof["cat"]["n_distinct"] == 2
    assert prof["val"]["n_nulls"] == 1 and prof["val"]["n_distinct"] == 2
    # fractional normalized through DECIMAL(38,6): engine-portable string
    assert prof["val"]["min_val"] == "1.500000"
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


def test_profile_diff_statuses(spark):
    """profile_diff classifies per-column MATCH / MISMATCH / missing
    columns; equal profiles are all-MATCH (the migration pre-gate)."""
    from data_migration_service_spark.operators.profile import (
        profile_diff,
        profile_table,
    )

    src = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "id long, cat string")
    same = profile_diff(profile_table(src, exact_distinct=True),
                        profile_table(src, exact_distinct=True))
    assert {r["status"] for r in same.collect()} == {"MATCH"}

    tgt = spark.createDataFrame(
        [(1, "a", True), (2, "b", False), (9, None, True)],
        "id long, cat string, extra boolean")
    d = {r["col_name"]: r for r in profile_diff(
        profile_table(src, exact_distinct=True),
        profile_table(tgt, exact_distinct=True)).collect()}
    assert d["cat"]["status"] == "MATCH"
    assert d["id"]["status"] == "MISMATCH" and not d["id"]["max_val_match"]
    assert d["id"]["n_rows_match"]  # counts agree, values drifted
    assert d["extra"]["status"] == "TARGET_ONLY"


# ---------- hierarchical (Merkle-style) verification ----------


def _vh_sides(spark, corrupt_key=None, drop_key=None, n=2000):
    base = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("content"),
    )
    tgt = base
    if corrupt_key is not None:
        tgt = tgt.withColumn(
            "content",
            F.when(F.col("k") == corrupt_key, F.lit("CORRUPT"))
            .otherwise(F.col("content")),
        )
    if drop_key is not None:
        tgt = tgt.where(F.col("k") != drop_key)
    return base, tgt


def test_hierarchical_identical_tables_zero_drilldown(spark):
    from data_migration_service_spark.operators.verify import verify_hierarchical

    src, tgt = _vh_sides(spark)
    res = verify_hierarchical(src, tgt, ["k"], n_buckets=64)
    assert res.consistent
    assert res.extra["dirty_buckets"] == []
    assert res.extra["rows_drilled"] == 0


def test_hierarchical_single_corruption_prunes_to_one_bucket(spark):
    from data_migration_service_spark.operators.verify import verify_hierarchical

    src, tgt = _vh_sides(spark, corrupt_key=777)
    res = verify_hierarchical(src, tgt, ["k"], n_buckets=64)
    assert not res.consistent
    assert res.n_mismatch == 1
    assert len(res.extra["dirty_buckets"]) == 1
    # the drill-down scanned one bucket's population, not the table:
    # ~n/64 rows, far below n
    assert 0 < res.extra["rows_drilled"] < 200
    assert res.report[0]["k"] == 777
    assert res.report[0]["status"] == MISMATCH


def test_hierarchical_missing_row_detected(spark):
    from data_migration_service_spark.operators.verify import verify_hierarchical

    src, tgt = _vh_sides(spark, drop_key=42)
    res = verify_hierarchical(src, tgt, ["k"], n_buckets=64)
    assert not res.consistent
    assert res.n_missing_in_target == 1
    assert res.n_mismatch == 0
    assert res.report[0]["k"] == 42
    assert res.report[0]["status"] == MISSING_IN_TARGET


def test_hierarchical_matches_full_verify_state(spark):
    """Same verdict + per-class counts as the one-shot row-level verify."""
    from data_migration_service_spark.operators.verify import verify_hierarchical

    src, tgt = _vh_sides(spark, corrupt_key=13, drop_key=99)
    full = verify_state(src, tgt, ["k"])
    hier = verify_hierarchical(src, tgt, ["k"], n_buckets=32)
    assert (full.n_mismatch, full.n_missing_in_target,
            full.n_missing_in_source) == (
        hier.n_mismatch, hier.n_missing_in_target, hier.n_missing_in_source)
    assert full.consistent == hier.consistent
