"""End-to-end corpus build: gate -> dedup -> mixture -> shuffle
(operators/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.operators.corpus import (
    corpus_audit,
    corpus_build,
)

WEIGHTS = {"en": 0.5, "zh": 0.5}


@pytest.fixture(scope="module")
def docs(spark):
    # deterministic word-salad docs across 3 langs; ids 0..599.
    # sizes/stopword mixes vary so the quality gate actually separates.
    base = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "zh").otherwise("de").alias("lang"),
        F.concat_ws(
            " ",
            F.array_repeat(F.lit("the quick fox of it"),
                           (F.pmod(F.col("id"), F.lit(12)) + 1).cast("int")),
        ).alias("text"),
    )
    # duplicate content: ids 500..509 repeat the text of ids 0..9
    dup = base.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "lang", "text")
    return base.unionByName(dup).cache()


def test_funnel_is_monotone_and_consistent(spark, docs):
    audit = corpus_audit(docs, "doc_id", "text", "lang", WEIGHTS,
                         min_quality=0.3, min_tokens=10)
    rows = {r["stage"]: r["n"] for r in audit.collect()}
    assert rows["raw"] == 610
    assert rows["raw"] >= rows["quality_gated"] >= rows["deduplicated"] \
        >= rows["mixed"] > 0
    built = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                         min_quality=0.3, min_tokens=10)
    assert built.count() == rows["mixed"]


def test_gate_dedup_and_mixture_semantics(spark, docs):
    built = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                         min_quality=0.3, min_tokens=10).cache()
    # gate honored
    assert built.where((F.col("quality") < 0.3)
                       | (F.col("n_tokens") < 10)).count() == 0
    # unlisted domain excluded
    assert built.where(F.col("lang") == "de").count() == 0
    # dedup: the 1000+N copies lose to their 0..9 originals
    assert built.where(F.col("doc_id") >= 1000).count() == 0
    # shard/pos are a well-formed order: contiguous 1..n per shard
    per = built.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
        F.count_distinct("pos").alias("d"))
    for r in per.collect():
        assert r["mx"] == r["n"] == r["d"]


def test_recipe_is_deterministic(spark, docs):
    a = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                     min_quality=0.3, min_tokens=10)
    b = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                     min_quality=0.3, min_tokens=10)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                     min_quality=0.3, min_tokens=10, salt="v2")
    assert c.exceptAll(a).count() > 0  # new salt, new sample/order


def test_max_tokens_bound(spark, docs):
    built = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                         min_quality=0.0, min_tokens=1, max_tokens=20)
    assert built.where(F.col("n_tokens") > 20).count() == 0
    assert built.count() > 0


def test_plan_shape_text_never_shuffles(spark, docs):
    """The scale contract of the pipeline: document TEXT never crosses
    the wire (the hash substitutes for it before every exchange), the
    shard layout is one exchange, and the dedup hash shuffles at most
    twice (main path + the column-pruned stats pass that derives the
    mixture rates — runtime exchange reuse collapses the rest)."""
    from data_migration_service_spark.plans.inspect import physical_plan

    built = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                         min_quality=0.3, min_tokens=10)
    # structural shape (pre-AQE): exactly one shard-layout exchange
    pre = [ln for ln in physical_plan(built).splitlines() if "Exchange" in ln]
    assert sum("hashpartitioning(shard" in ln for ln in pre) == 1
    assert not any("text#" in ln for ln in pre)  # text never shuffles
    # runtime shape: the dedup hash shuffles at most twice — main path
    # plus the column-pruned stats pass that derives the mixture rates
    built.collect()
    plan = built._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    ex_lines = [ln for ln in final.splitlines() if "Exchange" in ln
                and "ReusedExchange" not in ln]
    assert sum("hashpartitioning(_ch" in ln for ln in ex_lines) <= 2
    assert not any("text#" in ln for ln in ex_lines)


def test_materialize_corpus_tagged_and_reproducible(spark, tmp_path, docs):
    from data_migration_service_spark.operators.changefeed import (
        table_changes,
    )
    from data_migration_service_spark.operators.corpus import (
        materialize_corpus,
    )

    built = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                         min_quality=0.3, min_tokens=10)
    t, sid = materialize_corpus(spark, str(tmp_path / "corpus"), built,
                                ["doc_id"], tag="v1", n_buckets=4)
    assert t.tags()["v1"] == sid
    back = t.read().select(*built.columns)
    assert back.exceptAll(built).count() == 0
    assert built.exceptAll(back).count() == 0
    # corpus diffing: a second build (different salt) materializes as a
    # new snapshot via bootstrap into a fresh dir...; here just assert the
    # changefeed machinery answers "what changed" between corpus versions
    v2 = corpus_build(docs, "doc_id", "text", "lang", WEIGHTS, 4,
                      min_quality=0.3, min_tokens=10, salt="v2")
    from data_migration_service_spark.config import EngineConfig
    from data_migration_service_spark.operators.merge import cdc_apply
    cfg = EngineConfig(table_path=str(tmp_path / "corpus"),
                       key_cols=("doc_id",), n_buckets=4, salt_factor=1,
                       merge_mode="mor")
    ev = (v2.withColumn("lsn", (F.col("shard").cast("long") * (1 << 32))
                        + F.col("pos").cast("long") + (1 << 50))
          .withColumn("op", F.lit("update")))
    cdc_apply(t, ev, cfg, epoch=1)
    ch = table_changes(t, sid)
    assert ch.count() > 0
    assert set(r["op"] for r in ch.select("op").distinct().collect()) \
        <= {"insert", "update", "delete"}
    # the tagged v1 read is unchanged by the v2 merge (reproducibility)
    v1 = t.read(snapshot=t.load_snapshot(sid)).select(*built.columns)
    assert v1.exceptAll(built).count() == 0


def test_export_shards_deterministic_jsonl(spark, tmp_path, docs):
    """The JSONL hand-off artifact: one file per shard dir, byte-identical
    shard contents no matter how the input was partitioned, gapless pos
    order, and a manifest consistent with what landed on disk."""
    import glob
    import hashlib
    import os

    from data_migration_service_spark.operators.corpus import export_shards

    def shard_bytes(root):
        out = {}
        for d in sorted(glob.glob(os.path.join(root, "shard=*"))):
            k = int(d.rsplit("=", 1)[1])
            files = sorted(glob.glob(os.path.join(d, "part-*")))
            assert len(files) == 1, f"shard {k}: expected one file, got {files}"
            out[k] = hashlib.sha256(open(files[0], "rb").read()).hexdigest()
        return out

    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    m1 = export_shards(docs, ["doc_id"], p1, n_shards=4)
    m2 = export_shards(docs.repartition(7), ["doc_id"], p2, n_shards=4)
    assert shard_bytes(p1) == shard_bytes(p2)

    back = spark.read.json(p1)
    n = docs.count()
    assert back.count() == n == m1["rows"] == sum(m1["shard_rows"].values())
    assert m1["shard_rows"] == m2["shard_rows"]
    # pos is a gapless 1..k order within each shard (loader contract)
    agg = back.groupBy().agg(
        F.sum("pos").alias("s"),
        F.count(F.lit(1)).alias("c")).first()
    per = {int(r["shard"]): int(r["n"]) for r in
           spark.read.json(p1).groupBy("shard")
           .agg(F.max("pos").alias("mx"), F.count(F.lit(1)).alias("n"))
           .withColumn("ok", F.col("mx") == F.col("n"))
           .where("ok").collect()}
    assert per == m1["shard_rows"]
    # every input column round-trips
    assert set(docs.columns) <= set(back.columns)
