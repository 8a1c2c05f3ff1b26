"""Plan-shape regression pins: the scale properties PLANS.md documents,
asserted so a formulation change that silently degrades the plan (cartesian
join, lost pushdown, lost pruning, global sort) fails here first."""

from pyspark.sql import functions as F

from data_migration_service_spark.operators.similarity import (
    near_dup_pairs,
    near_dup_pairs_lsh,
)
from data_migration_service_spark.plans.inspect import (
    has_cartesian,
    pushed_filters,
    read_schemas,
    single_partition_exchanges,
)


def _emb(spark, n=40, dim=8):
    import random
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_near_dup_lsh_plans_no_cartesian(spark):
    df = _emb(spark)
    assert has_cartesian(near_dup_pairs(df, "vec_id", "embedding", 0.9)), \
        "exact baseline IS the cartesian (sanity: detector works)"
    assert not has_cartesian(
        near_dup_pairs_lsh(df, "vec_id", "embedding", 0.9, dim=8)
    ), "LSH path must plan as equi-joins only"


def test_scan_pushdown_and_pruning(spark, tmp_path):
    spark.range(0, 1000).select(
        F.col("id").alias("lsn"),
        F.concat(F.lit("r"), F.pmod("id", F.lit(5)).cast("string")).alias("repo"),
        F.sha2(F.col("id").cast("string"), 256).alias("content"),
        F.lit("x").alias("unused_wide_col"),
    ).write.parquet(str(tmp_path / "t"))
    df = (spark.read.parquet(str(tmp_path / "t"))
          .where(F.col("lsn") > 500)
          .select("repo", "lsn"))
    pf = pushed_filters(df)
    assert pf and any("GreaterThan(lsn,500)" in p for p in pf), pf
    rs = read_schemas(df)
    assert rs and all("unused_wide_col" not in s and "content" not in s
                      for s in rs), rs


def test_lww_merge_aggregate_not_single_partition(spark, tmp_path):
    """The LWW reduce must exchange on the merge key, never collapse to one
    partition."""
    df = spark.range(0, 10_000).select(
        F.concat(F.lit("r"), F.pmod("id", F.lit(7)).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.pmod("id", F.lit(97)).cast("string")).alias("path"),
        F.col("id").alias("lsn"),
        F.sha2(F.col("id").cast("string"), 256).alias("content"),
    )
    row = F.struct("repo", "path", "lsn", "content")
    merged = df.groupBy("repo", "path").agg(
        F.max_by(row, F.col("lsn")).alias("_w")).select("_w.*")
    assert single_partition_exchanges(merged) == 0


def test_asof_and_scd2_plans_are_key_partitioned(spark):
    """The temporal operators must never degrade into range/theta joins or
    single-partition windows — the two shapes that kill them at 10^10 rows."""
    from data_migration_service_spark.operators.asof import asof_join
    from data_migration_service_spark.operators.scd import scd2_history
    from data_migration_service_spark.plans.inspect import (
        has_cartesian,
        single_partition_exchanges,
    )

    log = spark.createDataFrame(
        [("r1", "a", "v1", 1, "insert"), ("r1", "a", "v2", 3, "update")],
        ["repo", "path", "content", "lsn", "op"],
    )
    probe = spark.createDataFrame([("r1", "a", 2)], ["repo", "path", "at"])
    joined = asof_join(probe, log, keys=["repo", "path"], probe_ord="at",
                       build_ord="lsn", value_cols=["content"])
    assert not has_cartesian(joined)
    assert single_partition_exchanges(joined) == 0

    hist = scd2_history(log, keys=["repo", "path"])
    assert single_partition_exchanges(hist) == 0


def test_fused_apply_is_one_exchange(spark):
    """The whole apply pipeline — LWW dedup AND the writer's (bucket, salt)
    layout — must move each row over the wire exactly once. bucket and salt
    are functions of the merge key, so hash-distributing by (bucket, salt)
    first lets groupBy(bucket, salt, keys) reuse the same exchange
    (merge.lww_fused); a second Exchange here means the fusion regressed."""
    from data_migration_service_spark.operators.merge import lww_fused
    from data_migration_service_spark.tables.lake import BUCKET_COL, bucket_expr
    from data_migration_service_spark.plans.inspect import physical_plan

    df = spark.range(0, 5_000).select(
        F.concat(F.lit("r"), F.pmod("id", F.lit(7)).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.pmod("id", F.lit(97)).cast("string")).alias("path"),
        F.col("id").alias("lsn"),
        F.sha2(F.col("id").cast("string"), 256).alias("content"),
        (F.pmod("id", F.lit(13)) == 0).alias("_deleted"),
    ).withColumn(BUCKET_COL, bucket_expr(["repo", "path"], 16))
    fused = lww_fused(df, ["repo", "path"], F.col("lsn"), 2,
                      struct_cols=["repo", "path", "lsn", "content", "_deleted"])
    assert physical_plan(fused).count("Exchange ") == 1

    naive = (df.groupBy("repo", "path")
             .agg(F.max_by(F.struct("repo", "path", "lsn", "content",
                                    "_deleted"), F.col("lsn")).alias("_w"))
             .select("_w.*"))
    got = fused.drop(BUCKET_COL)
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_compact_read_fuses_reduce_with_layout(spark, tmp_path):
    """Compaction reads base+deltas RAW (read(reduce=False)) and fuses the
    LWW reduce with the rewrite layout — one exchange for the whole fold,
    and the raw read must include every duplicate so the reduce sees them."""
    from pyspark.sql import types as T
    from data_migration_service_spark.config import EngineConfig
    from data_migration_service_spark.operators.merge import cdc_apply, lww_fused
    from data_migration_service_spark.tables.lake import (
        BUCKET_COL, DELETED_COL, SnapshotTable)
    from data_migration_service_spark.plans.inspect import physical_plan

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("lsn", T.LongType()),
    ])
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), schema,
                               key_cols=["repo", "path"], n_buckets=4)
    cfg = EngineConfig(table_path=str(tmp_path / "t"),
                       key_cols=("repo", "path"), merge_mode="mor",
                       salt_factor=1, n_buckets=4, compact_threshold=99)
    mk = lambda rows: spark.createDataFrame(
        rows, "repo string, path string, content string, lsn long, op string")
    cdc_apply(tbl, mk([("r", "a", "v1", 1, "insert")]), cfg, epoch=0)
    cdc_apply(tbl, mk([("r", "a", "v2", 2, "update")]), cfg, epoch=1)

    raw = tbl.read(include_deleted=True, reduce=False)
    assert raw.where("repo='r' and path='a'").count() == 2  # both versions
    fused = lww_fused(raw, ["repo", "path"], F.col("lsn"), 1,
                      struct_cols=["repo", "path", "content", "lsn",
                                   DELETED_COL])
    assert physical_plan(fused).count("Exchange ") == 1
    rows = fused.where("repo='r' and path='a'").collect()
    assert len(rows) == 1 and rows[0]["content"] == "v2"


def test_minhash_signature_agg_is_hash_based(spark):
    """min(string) buffers force SortAggregate (a full sort of the exploded
    shingle rows); the hex->long slice parse keeps the signature aggregate
    whole-stage-codegen HashAggregate. Pins the formulation."""
    from data_migration_service_spark.operators.dedup import minhash_signatures

    docs = spark.createDataFrame(
        [(i, f"document body {i} " * 10) for i in range(50)],
        "doc_id long, text string")
    sigs = minhash_signatures(docs, "doc_id", "text", k=5, n_hashes=16)
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    assert dict(sigs.dtypes)["minhash"] == "bigint"


def test_fan_out_small_scan_conditional(spark):
    """Single-split inputs spread to the session parallelism before
    explode-heavy work; already-parallel inputs take the no-shuffle path."""
    from data_migration_service_spark.operators.dedup import fan_out_small_scan

    par = spark.sparkContext.defaultParallelism
    small = spark.createDataFrame([(1, "x")], "id long, t string").coalesce(1)
    assert fan_out_small_scan(small).rdd.getNumPartitions() == par * 2
    wide = spark.range(0, 10000).repartition(par * 4) \
        .select("id", F.lit("t").alias("t"))
    assert fan_out_small_scan(wide).rdd.getNumPartitions() == par * 4


def test_columns_projection_narrows_mor_read_schema(spark, tmp_path):
    """read(columns=...) must reach the parquet scan: the MOR reduce's
    max_by(struct(ALL cols)) otherwise defeats Catalyst column pruning, so a
    2-column consumer of a wide delta-carrying table would scan every byte.
    Pins both the narrowed ReadSchema and result equality with the full
    read's projection."""
    from pyspark.sql import types as T
    from data_migration_service_spark.config import EngineConfig
    from data_migration_service_spark.operators.merge import cdc_apply
    from data_migration_service_spark.plans.inspect import read_schemas
    from data_migration_service_spark.tables.lake import SnapshotTable

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("size_bytes", T.LongType()),
        T.StructField("lsn", T.LongType()),
    ])
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), schema,
                               key_cols=["repo", "path"], n_buckets=4)
    cfg = EngineConfig(table_path=str(tmp_path / "t"),
                       key_cols=("repo", "path"), merge_mode="mor",
                       salt_factor=1, n_buckets=4, compact_threshold=99)
    mk = lambda rows: spark.createDataFrame(
        rows, "repo string, path string, content string, lang string, "
              "size_bytes long, lsn long, op string")
    cdc_apply(tbl, mk([("r", "a", "v1", "py", 10, 1, "insert"),
                       ("r", "b", "w1", "md", 11, 2, "insert")]), cfg, epoch=0)
    cdc_apply(tbl, mk([("r", "a", "v2", "py", 12, 3, "update")]), cfg, epoch=1)
    assert any(tbl.current().deltas.values())  # the reduce is actually live

    narrow = tbl.read(columns=["content"])
    for rs in read_schemas(narrow):
        assert "lang" not in rs and "size_bytes" not in rs
    # the full read DOES scan the wide columns through the reduce struct
    wide = tbl.read().select("repo", "path", "content", "lsn")
    assert any("lang" in rs for rs in read_schemas(wide))

    got = narrow.select("repo", "path", "content", "lsn")
    assert got.exceptAll(wide).count() == 0
    assert wide.exceptAll(got).count() == 0

    import pytest
    with pytest.raises(ValueError, match="unknown columns"):
        tbl.read(columns=["nope"])


def test_top_n_per_group_uses_window_group_limit(spark):
    """q_top_events_per_type's shape: a rank<=N filter over a row_number
    window must plan as Partial+Final WindowGroupLimit — each input
    partition keeps its own top N per group BEFORE the exchange — never a
    whole-group sort of the full table."""
    import __spark_entry__ as entry

    df = entry.q_top_events_per_type(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan and "Final" in plan
    assert plan.count("Exchange") == 1  # one hash exchange on the group key
    # semantics: every group has at most 3 rows, ranks are 1..k contiguous
    from collections import Counter
    rows = df.collect()
    by_group = Counter(r.event_type for r in rows)
    assert by_group and all(n <= 3 for n in by_group.values())
    for g in by_group:
        assert sorted(r.rn for r in rows if r.event_type == g) == \
            list(range(1, by_group[g] + 1))
