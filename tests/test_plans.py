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
