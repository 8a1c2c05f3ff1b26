"""Domain-mixture sampling: determinism, target proportions, temperature
rebalancing (operators/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.operators.sampling import (
    domain_rates,
    mixture_report,
    mixture_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # 3 domains with very different sizes: a=6000, b=3000, c=1000
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 6000, "a")
        .when(F.col("id") < 9000, "b")
        .otherwise("c").alias("dom"),
    )
    return df.cache()


def test_weights_hit_target_mixture(corpus):
    # target 50/25/25 from raw 60/30/10: c binds (1000/0.25=4000 capacity)
    rep = mixture_report(corpus, "dom", ["doc_id"],
                         weights={"a": 0.5, "b": 0.25, "c": 0.25})
    rows = {r["dom"]: r for r in rep.collect()}
    assert rows["c"]["rate"] == 1.0 and rows["c"]["n_kept"] == 1000
    # expected keeps: a=2000, b=1000 (deterministic sample ~ rate*n with
    # sha256-uniform jitter; 5% tolerance is >6 sigma at these sizes)
    assert abs(rows["a"]["n_kept"] - 2000) < 100
    assert abs(rows["b"]["n_kept"] - 1000) < 75
    total = sum(r["n_kept"] for r in rows.values())
    assert abs(rows["a"]["n_kept"] / total - 0.5) < 0.03


def test_sample_is_deterministic_and_salt_sensitive(corpus):
    w = {"a": 0.4, "b": 0.4, "c": 0.2}
    s1 = mixture_sample(corpus, "dom", ["doc_id"], weights=w)
    s2 = mixture_sample(corpus, "dom", ["doc_id"], weights=w)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    s3 = mixture_sample(corpus, "dom", ["doc_id"], weights=w, salt="other")
    assert s3.exceptAll(s1).count() > 0  # different recipe, different rows
    # subset of the input, no fabricated rows
    assert s1.join(corpus, ["doc_id", "dom"], "left_anti").count() == 0


def test_unlisted_domain_is_dropped(corpus):
    s = mixture_sample(corpus, "dom", ["doc_id"], weights={"a": 1.0})
    assert s.where(F.col("dom") != "a").count() == 0
    assert s.count() == 6000  # sole domain binds: kept whole


def test_temperature_one_keeps_everything(corpus):
    rep = mixture_report(corpus, "dom", ["doc_id"], temperature=1.0)
    for r in rep.collect():
        assert r["rate"] == 1.0 and r["n_kept"] == r["n_raw"]


def test_temperature_zero_equalizes_domains(corpus):
    rep = mixture_report(corpus, "dom", ["doc_id"], temperature=0.0)
    rows = {r["dom"]: r for r in rep.collect()}
    assert rows["c"]["n_kept"] == 1000  # smallest domain binds, kept whole
    for d in ("a", "b"):  # others downsampled to the same size
        assert abs(rows[d]["n_kept"] - 1000) < 75


def test_temperature_flattens_monotonically(corpus):
    flat = mixture_report(corpus, "dom", ["doc_id"], temperature=0.5)
    rows = {r["dom"]: r["n_kept"] for r in flat.collect()}
    # sqrt weights: a/c kept ratio should shrink from 6x toward sqrt(6)x
    ratio = rows["a"] / rows["c"]
    assert 1.0 < ratio < 6.0
    assert rows["c"] == 1000


def test_rates_argument_validation(corpus):
    with pytest.raises(ValueError):
        domain_rates(corpus, "dom")
    with pytest.raises(ValueError):
        domain_rates(corpus, "dom", weights={"a": 1.0}, temperature=0.5)


def test_corpus_shuffle_total_and_deterministic(spark, corpus):
    from data_migration_service_spark.operators.sampling import corpus_shuffle
    from data_migration_service_spark.plans.inspect import (
        physical_plan,
        single_partition_exchanges,
    )

    s1 = corpus_shuffle(corpus, ["doc_id"], n_shards=8)
    s2 = corpus_shuffle(corpus, ["doc_id"], n_shards=8)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    assert s1.count() == corpus.count()  # a permutation: nothing lost
    assert s1.select("doc_id").distinct().count() == corpus.count()
    # per-shard positions are 1..n contiguous (a loader can mmap by index)
    per = s1.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
        F.min("pos").alias("mn"), F.count_distinct("pos").alias("d"))
    for r in per.collect():
        assert r["mn"] == 1 and r["mx"] == r["n"] == r["d"]
    # balanced shards: 10k rows over 8 shards, ±15%
    ns = [r["n"] for r in per.collect()]
    assert max(ns) < 1250 * 1.15 and min(ns) > 1250 * 0.85
    # a different seed is a different permutation
    s3 = corpus_shuffle(corpus, ["doc_id"], n_shards=8, seed="epoch2")
    assert s3.exceptAll(s1).count() > 0
    # plan: the per-shard window must not collapse to one partition
    assert single_partition_exchanges(s1) == 0
    assert physical_plan(s1).count("Exchange") == 1  # hash by shard, once


def test_budget_select_exact_prefix_semantics(spark):
    """budget_select == the plain (score DESC, id ASC) windowed-cumsum
    prefix, including the crossing bin, ties, dict budgets, zero budget,
    and the all-equal-scores degenerate bin."""
    import random as _random

    from pyspark.sql import Window as W

    from data_migration_service_spark.operators.sampling import budget_select

    rng = _random.Random(7)
    rows = [(i, rng.choice(["a", "b", "c"]), rng.randint(0, 50),
             rng.randint(1, 30)) for i in range(400)]
    # force score ties
    rows += [(1000 + i, "a", 25, 10) for i in range(20)]
    df = spark.createDataFrame(
        rows, "doc_id long, dom string, score long, tok long")

    def reference(budget):
        w = (W.partitionBy("dom")
             .orderBy(F.desc("score"), F.asc("doc_id"))
             .rowsBetween(W.unboundedPreceding, W.currentRow))
        bud = (F.lit(budget) if isinstance(budget, int)
               else F.create_map(*[F.lit(x) for kv in budget.items()
                                   for x in kv])[F.col("dom")])
        return (df.withColumn("_c", F.sum("tok").over(w))
                .where(F.col("_c") <= bud).drop("_c"))

    def ids(frame):
        return sorted(r["doc_id"] for r in frame.collect())

    for budget in (1, 37, 500, 10_000, 10**9):
        got = budget_select(df, "dom", "score", "tok", budget,
                            id_cols=["doc_id"], bins=8)
        assert ids(got) == ids(reference(budget)), f"budget={budget}"

    per_dom = {"a": 200, "b": 0, "c": 10**9}
    got = budget_select(df, "dom", "score", "tok", per_dom,
                        id_cols=["doc_id"], bins=8)
    ref = reference({k: v for k, v in per_dom.items()}).where(
        F.col("dom") != "b")
    assert ids(got) == ids(ref)
    assert got.where(F.col("dom") == "b").count() == 0

    # all-equal scores: one bin, still exact
    flat = spark.createDataFrame(
        [(i, "x", 5, 7) for i in range(40)],
        "doc_id long, dom string, score long, tok long")
    got = budget_select(flat, "dom", "score", "tok", 70,
                        id_cols=["doc_id"], bins=8)
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(10))
