"""TF-IDF keywords + deterministic stratified sampling."""

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.operators.text import (
    stratified_sample,
    tf_idf_top_terms,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark shuffle join", "en"),
            (2, "spark join broadcast", "en"),
            (3, "der die und", "de"),
            (4, "join join join shuffle", "en"),
        ],
        ["doc_id", "text", "lang"],
    )


def test_tf_idf_rare_term_outranks_common(corpus):
    out = tf_idf_top_terms(corpus, "doc_id", "text", top_k=2)
    top = {r["doc_id"]: r["term"] for r in
           out.groupBy("doc_id").agg(F.max_by("term", "tfidf").alias("term")).collect()}
    # "spark" appears in 2/4 docs, "shuffle" in 2/4, "broadcast" in 1/4:
    # doc 2's top term must be its unique word, not the common "join" (3/4)
    assert top[2] == "broadcast"
    # doc 3's words are unique to it; top-k present for every doc
    assert out.where(F.col("doc_id") == 3).count() == 2


def test_tf_idf_scores_match_formula(corpus):
    import math
    out = {(r["doc_id"], r["term"]): r["tfidf"]
           for r in tf_idf_top_terms(corpus, "doc_id", "text", top_k=4).collect()}
    # doc 4: tf(join)=3, df(join)=3, n_docs=4 -> 3*ln(5/4)
    assert out[(4, "join")] == pytest.approx(3 * math.log(5 / 4), abs=1e-5)


def test_stratified_sample_deterministic_under_repartition(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("zh").alias("lang"),
    )
    a = stratified_sample(df, "doc_id", "lang", {"en": 0.25, "zh": 0.75})
    b = stratified_sample(df.repartition(13), "doc_id", "lang",
                          {"en": 0.25, "zh": 0.75})
    ids_a = sorted(r[0] for r in a.select("doc_id").collect())
    ids_b = sorted(r[0] for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0


def test_stratified_sample_fractions_and_edges(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keep").otherwise("drop").alias("lang"),
    )
    out = stratified_sample(df, "doc_id", "lang",
                            {"keep": 1.0, "drop": 0.0})
    got = out.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == {"keep": 2000}
    # mid fraction lands near its expectation (hash-uniformity sanity)
    half = stratified_sample(df, "doc_id", "lang", {}, default_fraction=0.5)
    n = half.count()
    assert 1800 <= n <= 2200


def test_tf_idf_plan_has_no_cartesian_or_global_window(spark, tmp_path):
    from data_migration_service_spark.plans.inspect import (
        has_cartesian,
        single_partition_exchanges,
    )
    p = str(tmp_path / "docs.parquet")
    spark.range(200).selectExpr(
        "id AS doc_id", "concat('tok', id % 17, ' tok', id % 5) AS text"
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    out = tf_idf_top_terms(docs, "doc_id", "text", top_k=2)
    assert not has_cartesian(out)
    # top-k is per-doc aggregate, never a corpus-wide single-partition sort
    assert single_partition_exchanges(out) == 0


def test_redact_pii_patterns_and_counts(spark):
    from data_migration_service_spark.operators.text import redact_pii
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@corp.example.org today"),
            (2, "server 192.168.1.254 and 8.8.8.8 are up"),
            (3, "key deadbeefcafebabe0123456789abcdef0011 leaked"),
            (4, "all clean words only here"),
            (5, "combo bob@x.io at 10.0.0.1 key "
                "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "doc_id", "text").collect()}
    assert out[1]["redacted"] == "mail me at <EMAIL> today"
    assert out[1]["n_redactions"] == 1
    assert out[2]["redacted"] == "server <IP> and <IP> are up"
    assert out[2]["n_redactions"] == 2
    assert "<HEX>" in out[3]["redacted"] and out[3]["n_redactions"] == 1
    assert out[4]["redacted"] == "all clean words only here"
    assert out[4]["n_redactions"] == 0
    assert out[5]["n_redactions"] == 3
    for tag in ("<EMAIL>", "<IP>", "<HEX>"):
        assert tag in out[5]["redacted"]


def test_redact_pii_is_map_only(spark, tmp_path):
    from data_migration_service_spark.operators.text import redact_pii
    p = str(tmp_path / "docs.parquet")
    spark.range(100).selectExpr(
        "id AS doc_id", "'txt ' || id AS text").write.parquet(p)
    out = redact_pii(spark.read.parquet(p), "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure projection over the scan


def test_pack_offsets_contiguous_and_deterministic(spark):
    from data_migration_service_spark.operators.text import pack_offsets
    df = spark.range(500).selectExpr(
        "id AS doc_id", "CAST(1 + id % 37 AS LONG) AS n_tokens")
    out = pack_offsets(df, "doc_id", "n_tokens", seq_len=64, shard_chars=1)
    rows = out.collect()
    # within each shard the doc stream is gapless: offsets tile exactly
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r["offset"])
        cursor = 0
        for d in docs:
            assert d["offset"] == cursor
            assert d["seq_first"] == d["offset"] // 64
            assert d["seq_last"] == (d["offset"] + d["n_tokens"] - 1) // 64
            cursor += d["n_tokens"]
    # identical layout at any input partitioning
    out2 = pack_offsets(df.repartition(17), "doc_id", "n_tokens",
                        seq_len=64, shard_chars=1)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))


def test_pack_offsets_no_global_window(spark, tmp_path):
    from data_migration_service_spark.operators.text import pack_offsets
    from data_migration_service_spark.plans.inspect import (
        single_partition_exchanges,
    )
    p = str(tmp_path / "c.parquet")
    spark.range(300).selectExpr(
        "id AS doc_id", "CAST(1 + id % 11 AS LONG) AS n_tokens"
    ).write.parquet(p)
    out = pack_offsets(spark.read.parquet(p), "doc_id", "n_tokens",
                       seq_len=128, shard_chars=2)
    assert single_partition_exchanges(out) == 0


def test_contamination_flags_overlap_only(spark):
    from data_migration_service_spark.operators.text import contamination
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma other words here"),   # shares 'alpha beta gamma'
         (3, "zeta eta theta iota kappa"),           # no overlap
         (4, "al be"),                               # < n tokens: 0 grams
         (5, "beta gamma delta unrelated tail")],    # shares 'beta gamma delta'
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in
            contamination(docs, bench, "doc_id", "text", n=3).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_matched"] == 2
    assert rows[2]["contaminated"] and rows[2]["n_matched"] == 1
    assert not rows[3]["contaminated"] and rows[3]["n_matched"] == 0
    assert rows[4]["n_grams"] == 0 and not rows[4]["contaminated"]
    assert rows[5]["contaminated"] and rows[5]["n_matched"] == 1
    assert rows[1]["contamination_ratio"] == 2 / 3


def test_contamination_benchmark_is_broadcast(spark):
    from data_migration_service_spark.operators.text import contamination
    docs = spark.range(200).selectExpr(
        "id AS doc_id",
        "concat('tok', id % 17, ' tok', id % 7, ' tok', id % 5, ' tok', id % 3) AS text")
    bench = docs.where("doc_id % 50 = 0")
    out = contamination(docs, bench, "doc_id", "text", n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles for the join
    assert out.count() == 200


def test_repetition_stats_semantics(spark):
    """Gopher repetition signals: hand-computed shares on tiny docs, and a
    boilerplate doc must separate cleanly from a diverse one."""
    from data_migration_service_spark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            # bigrams: "a a","a a","a b" -> top 2/3; unique 2/4
            (1, "a a a b"),
            # 12 tokens of pure boilerplate: every 5-gram duplicated
            (2, "x y x y x y x y x y x y"),
            # all-distinct tokens: zero repetition
            (3, "q w e r t z u i o p"),
            (4, "one"),  # shorter than any gram
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in
            repetition_stats(docs, "doc_id", "text").collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 4 and r1["unique_token_ratio"] == 0.5
    assert abs(r1["top_2gram_share"] - 2 / 3) < 1e-12
    assert r1["dup_5gram_share"] == 0.0
    assert rows[2]["dup_5gram_share"] == 1.0  # every 5-gram appears >1x
    assert rows[2]["top_2gram_share"] > 0.5
    assert rows[3]["unique_token_ratio"] == 1.0
    assert rows[3]["dup_5gram_share"] == 0.0
    assert rows[4]["top_2gram_share"] == 0.0 and rows[4]["dup_5gram_share"] == 0.0


def test_rare_token_stats_semantics(spark):
    """Corpus-frequency profile: a doc of corpus-common tokens scores high
    mean frequency / zero rare share; a doc of hapaxes is all-rare."""
    from data_migration_service_spark.operators.text import rare_token_stats

    docs = spark.createDataFrame(
        [
            (1, "the the cat"),       # 'the' x2 here + 1 below = cf 3
            (2, "the zz qq"),          # two hapaxes + one common
            (3, "ww"),                  # single hapax
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            rare_token_stats(docs, "doc_id", "text", rare_max=1).collect()}
    # corpus freqs: the=3, cat=1, zz=1, qq=1, ww=1
    assert rows[1]["n_tokens"] == 3
    assert abs(rows[1]["avg_token_corpus_freq"] - (3 + 3 + 1) / 3) < 1e-12
    assert rows[1]["n_rare"] == 1  # 'cat'
    assert rows[2]["n_rare"] == 2 and abs(rows[2]["rare_token_ratio"] - 2 / 3) < 1e-12
    assert rows[3]["rare_token_ratio"] == 1.0


def test_chunk_documents_tiling_and_overlap(spark):
    from data_migration_service_spark.operators.text import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "only two  tokens"), (3, "   "), (4, "")],
        "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", size=4, stride=3)
    rows = sorted([(r["doc_id"], r["chunk_id"], r["start_token"],
                    r["n_tokens"], r["chunk_text"])
                   for r in out.collect()])
    # doc 1: starts 0,3,6,9 — overlapping windows, last one truncated
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 3, 4, "t3 t4 t5 t6"),
        (1, 2, 6, 4, "t6 t7 t8 t9"),
        (1, 3, 9, 1, "t9"),
    ]
    # doc 2: 3 tokens (double space collapses), one chunk
    assert [r for r in rows if r[0] == 2] == [(2, 0, 0, 3, "only two tokens")]
    # empty / whitespace-only docs yield zero chunks
    assert not [r for r in rows if r[0] in (3, 4)]
    # coverage invariant: with stride <= size every token index is covered
    covered = set()
    for _, _, st, n, _ in rows:
        covered |= set(range(st, st + n))
    assert covered >= set(range(10))


def test_chunk_documents_is_map_only(spark):
    from data_migration_service_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(i, "a b c d e f g h") for i in range(20)],
                               "doc_id long, text string")
    plan = chunk_documents(df, "doc_id", "text", size=4, stride=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # text never shuffles: chunking is map-only
    with __import__("pytest").raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=0, stride=4)
