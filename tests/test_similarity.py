"""LSH similarity + dedup fast paths.

The exact all-pairs operators are the oracle here: `near_dup_pairs` (the
O(n^2) correctness baseline) grades `near_dup_pairs_lsh` recall, and the
sha256 minhash path grades the xxhash64 fast path on planted duplicates.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from data_migration_service_spark.operators import dedup as D
from data_migration_service_spark.operators import similarity as S
from data_migration_service_spark.operators.similarity import (
    _probe_flips,
    cosine_topk,
    lsh_bucket,
    lsh_topk,
    near_dup_pairs,
    near_dup_pairs_lsh,
)

DIM = 16


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _perturb(v, rng, eps):
    w = [x + rng.gauss(0, eps) for x in v]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


@pytest.fixture(scope="module")
def planted(spark):
    """60 random unit vectors + 30 planted near-duplicates (cosine ~0.995).
    ids: base i -> i, dup of base i -> 1000+i."""
    rng = random.Random(7)
    rows = []
    for i in range(60):
        v = _unit(rng)
        rows.append((i, v))
        if i < 30:
            rows.append((1000 + i, _perturb(v, rng, 0.05)))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_probe_flips_enumeration():
    f1 = _probe_flips(8, 1)
    assert len(f1) == 1 + 8 and len(set(f1)) == len(f1)
    f2 = _probe_flips(8, 2)
    assert len(f2) == 1 + 8 + 28 and len(set(f2)) == len(f2)
    assert all(bin(m).count("1") <= 2 for m in f2)
    assert set(f1) <= set(f2)
    assert _probe_flips(4, 0) == [0]


def test_near_dup_lsh_subset_and_recall(planted):
    """LSH pairs must be a value-exact subset of the exact all-pairs result,
    with recall >= 0.85 on planted cosine-0.995 duplicates (expected ~0.99:
    P[a plane splits a 0.06-rad pair] ~ 0.02, so Hamming>1 over 8 planes is
    ~1%)."""
    t = 0.95
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in near_dup_pairs(planted, "vec_id", "embedding", t).collect()}
    got = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in near_dup_pairs_lsh(planted, "vec_id", "embedding", t,
                                       n_planes=8, probe_hamming=1,
                                       dim=DIM).collect()}
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert abs(v - exact[k]) < 1e-9
    assert len(exact) >= 25  # the planted pairs are actually above threshold
    recall = len(got) / len(exact)
    assert recall >= 0.85, f"recall {recall:.3f} below floor"


def test_near_dup_lsh_candidate_rule_is_hamming_exact(planted):
    """Membership is exactly 'bucket Hamming distance <= probe AND cosine >=
    threshold' — verified pair-by-pair from the buckets themselves, so the
    probe-join construction (explode + equi-join, each pair found once) is
    checked for both h=1 and h=2."""
    t = 0.95
    buckets = {r["vec_id"]: r["_bkt"] for r in planted.withColumn(
        "_bkt", lsh_bucket(planted, "embedding", 8, 42, DIM)).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in
             near_dup_pairs(planted, "vec_id", "embedding", t).collect()}
    for h in (1, 2):
        got = {(r["id_a"], r["id_b"]) for r in
               near_dup_pairs_lsh(planted, "vec_id", "embedding", t,
                                  n_planes=8, probe_hamming=h,
                                  dim=DIM).collect()}
        want = {(a, b) for a, b in exact
                if bin(buckets[a] ^ buckets[b]).count("1") <= h}
        assert got == want
    # monotone: larger probe radius never loses pairs
    g1 = near_dup_pairs_lsh(planted, "vec_id", "embedding", t,
                            probe_hamming=1, dim=DIM).count()
    g2 = near_dup_pairs_lsh(planted, "vec_id", "embedding", t,
                            probe_hamming=2, dim=DIM).count()
    assert g2 >= g1


def test_near_dup_lsh_max_bucket_drops_hot_buckets(spark):
    """Degenerate corpora (constant embeddings) land in one bucket; the cap
    excludes those ids entirely instead of building an O(m^2) join."""
    rows = [(i, [1.0] * DIM) for i in range(50)]  # all in one bucket
    rng = random.Random(3)
    rows += [(100 + i, _unit(rng)) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = near_dup_pairs_lsh(df, "vec_id", "embedding", 0.99,
                             dim=DIM, max_bucket=20)
    assert out.where((F.col("id_a") < 100) & (F.col("id_b") < 100)).count() == 0


def test_lsh_topk_multiprobe_recall_improves(planted):
    """probe_hamming=2 probes a superset of buckets, so its top-k recall vs
    exact brute force is >= the 1-bit probe's (and the candidate filter is
    visibly wider)."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    k = 15
    exact_ids = [r["vec_id"] for r in
                 cosine_topk(planted, "vec_id", "embedding", qv, k).collect()]
    buckets = {r["vec_id"]: r["_bkt"] for r in planted.withColumn(
        "_bkt", lsh_bucket(planted, "embedding", 8, 42, DIM)).collect()}
    got = {}
    for h in (0, 1, 2):
        ids = {r["vec_id"] for r in
               lsh_topk(planted, "vec_id", "embedding", qv, k=k,
                        n_planes=8, probe_hamming=h).collect()}
        got[h] = len(ids & set(exact_ids)) / k
        # candidate rule is exact: results are drawn from precisely the
        # vectors whose bucket is within h bits of the query's bucket
        cand = {i for i, b in buckets.items()
                if bin(b ^ buckets[0]).count("1") <= h}
        assert ids <= cand
    assert got[1] >= got[0]
    assert got[2] >= got[1]
    # the genuinely-similar planted dup (cosine ~0.995) survives the widest
    # probe essentially surely (P[>2 of 8 planes split a 0.06-rad pair] ~ 1e-4)
    wide = {r["vec_id"] for r in
            lsh_topk(planted, "vec_id", "embedding", qv, k=k,
                     n_planes=8, probe_hamming=2).collect()}
    assert 1000 in wide


def test_ivf_topk_recall_on_clustered_corpus(spark):
    """IVF: train the coarse quantizer on a clustered corpus, then assert
    (a) assignment equals the driver-side argmin (same math), (b) the probe
    search finds the planted near-neighbors of a query, (c) widening
    n_probe is monotone and reaches the exact brute-force top-k."""
    from data_migration_service_spark.operators.similarity import (
        ivf_assign,
        ivf_fit,
        ivf_topk,
    )

    rng = random.Random(5)
    anchors = [_unit(rng) for _ in range(4)]
    rows = []
    for i in range(200):
        a = anchors[i % 4]
        rows.append((i, _perturb(a, rng, 0.15)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()

    cents = ivf_fit(df, "embedding", n_centroids=4, seed=42)
    assert len(cents) == 4 and all(len(c) == DIM for c in cents)

    # (a) expression assignment == python argmin for a sample
    sample = df.limit(20).collect()
    got = {r["vec_id"]: r["c"] for r in
           df.limit(20).select("vec_id",
                               ivf_assign("embedding", cents).alias("c")).collect()}
    for r in sample:
        v = r["embedding"]
        want = min(range(4), key=lambda i: (
            sum(x * x for x in cents[i]) - 2 * sum(x * y for x, y in zip(v, cents[i])), i))
        assert got[r["vec_id"]] == want

    # (b/c) recall vs exact, monotone in n_probe, exact at full probe
    qv = rows[0][1]
    exact = [r["vec_id"] for r in
             cosine_topk(df, "vec_id", "embedding", qv, 10).collect()]
    rec = {}
    for p in (1, 4):
        ids = [r["vec_id"] for r in
               ivf_topk(df, "vec_id", "embedding", qv, cents, k=10,
                        n_probe=p).collect()]
        rec[p] = len(set(ids) & set(exact)) / 10
    assert rec[4] == 1.0          # probing every cell == brute force
    assert rec[1] >= 0.5          # the query's own cluster holds most of top-k
    assert rec[4] >= rec[1]


def test_minhash_xxhash_fast_path_recovers_planted_dups(spark):
    """The xxhash64 hash family must recover the same planted near-duplicate
    pairs as the sha256 oracle path through the identical LSH banding."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight")
    rows = []
    for i in range(20):
        txt = f"{base} variant {i} " + "filler words " * i
        rows.append((i, txt))
        if i < 8:  # planted near-dup: one-char edit
            rows.append((100 + i, txt.replace("quick", "quack")))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    planted_pairs = {(i, 100 + i) for i in range(8)}

    found = {}
    for fam in ("sha256", "xxhash64"):
        sigs = D.minhash_signatures(docs, "doc_id", "text", k=5, n_hashes=16,
                                    hash_family=fam)
        pairs = D.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows_per_band=4)
        est = D.minhash_jaccard_estimate(sigs, pairs, "doc_id")
        found[fam] = {(r["id_a"], r["id_b"]) for r in
                      est.where(F.col("est_jaccard") >= 0.5).collect()}
    assert planted_pairs <= found["sha256"]
    assert planted_pairs <= found["xxhash64"]


def test_incremental_lsh_matches_full_corpus_restriction(spark):
    """The CDC-shaped dedup invariant: probing a NEW batch against the
    stored corpus band index yields exactly the full-corpus LSH pair set
    restricted to pairs with >= 1 new member — same combined bucket cap,
    no corpus re-hash. Kinds label new-vs-corpus vs within-batch."""
    base = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen and some more text")
    rows = []
    for i in range(24):
        txt = f"{base} doc {i} " + "pad tokens " * (i % 5)
        rows.append((i, txt))
        if i % 3 == 0:  # planted near-dups spread across the new/old split
            rows.append((100 + i, txt.replace("three", "tree")))
    docs = spark.createDataFrame(rows, "doc_id long, text string").cache()
    is_new = F.pmod("doc_id", F.lit(4)) == 0
    sig = lambda df: D.minhash_signatures(df, "doc_id", "text",  # noqa: E731
                                          k=5, n_hashes=16)
    index = D.band_signatures(sig(docs.where(~is_new)), "doc_id")
    new_bands = D.band_signatures(sig(docs.where(is_new)), "doc_id")
    inc = {(r["id_a"], r["id_b"]): r["pair_kind"]
           for r in D.incremental_lsh_pairs(new_bands, index,
                                            "doc_id", max_bucket=50).collect()}

    full = {(r["id_a"], r["id_b"])
            for r in D.lsh_candidate_pairs(sig(docs), "doc_id",
                                           max_bucket=50).collect()}
    expected = {p for p in full if p[0] % 4 == 0 or p[1] % 4 == 0}
    assert set(inc) == expected and len(expected) > 0
    for (a, b), kind in inc.items():
        assert kind == ("new_new" if a % 4 == 0 and b % 4 == 0
                        else "new_corpus")
    assert "new_corpus" in set(inc.values())


def test_minhash_unknown_family_rejected(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        D.minhash_signatures(docs, "doc_id", "text", hash_family="md5")


def test_connected_components_transitive_chain(spark):
    # A-B and B-C share no bucket necessarily — clusters must still merge;
    # isolated pair D-E stays its own cluster; F is untouched (not in pairs).
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], ["id_a", "id_b"])
    labels = {r["node"]: r["cluster_id"]
              for r in D.connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_dedup_clusters_labels_whole_corpus(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 7)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 4), (4, 5)], ["id_a", "id_b"])
    out = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in D.dedup_clusters(docs, pairs, "doc_id").collect()}
    assert out == {1: (1, True), 2: (2, True), 3: (3, True),
                   4: (1, False), 5: (1, False), 6: (6, True)}


def test_connected_components_long_chain_converges(spark):
    # path graph 0-1-2-...-9: worst-case diameter for hash-min; all nodes
    # must end labeled 0 within max_iter
    pairs = spark.createDataFrame([(i, i + 1) for i in range(9)],
                                  ["id_a", "id_b"])
    rows = D.connected_components(pairs, max_iter=15).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 10


def test_cluster_canonical_keeps_best_scored_member(spark):
    """Per cluster the KEEP decision is argmax(score), ties to the lowest
    doc_id; singletons keep themselves; output is one row per cluster."""
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.2), (7, 0.8), (9, 0.1)],
        "doc_id long, score double",
    )
    # clusters: {1,2,3} (transitively via 1-2, 2-3), {4,7}; 9 singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 7)], "id_a long, id_b long"
    )
    got = {r["cluster_id"]: r for r in D.cluster_canonical(
        scores, pairs, "doc_id", "score").collect()}
    assert set(got) == {1, 4, 9}
    assert got[1]["keep_doc_id"] == 2          # 0.9 tie -> lowest id wins
    assert got[1]["n_members"] == 3 and got[1]["best_score"] == 0.9
    assert got[4]["keep_doc_id"] == 7 and got[4]["n_members"] == 2
    assert got[9]["keep_doc_id"] == 9 and got[9]["n_members"] == 1


def test_incremental_near_dup_matches_full_corpus_restriction(spark, tmp_path):
    """The CDC invariant: probing a NEW batch against the stored vector
    index yields exactly the union-corpus LSH pairs restricted to >=1 new
    member — under identical probe and bucket-cap parameters — without
    re-hashing or self-joining the corpus."""
    import random

    rng = random.Random(7)
    dim = 16
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(40)]
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v))
        if i % 4 == 0:  # planted near-dups across the old/new split
            rows.append((100 + i, [x + rng.gauss(0, 0.01) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    new = df.where(F.col("vec_id") >= 100)
    old = df.where(F.col("vec_id") < 100)

    for cap in (None, 6):
        idx_dir = str(tmp_path / f"vidx_{cap}")
        # index persisted bucket-partitioned, then reopened: the probe
        # works against storage, not a lineage handle
        S.vector_index(old, "vec_id", "embedding", dim=dim) \
            .write.partitionBy("bucket").mode("overwrite").parquet(idx_dir)
        index = spark.read.parquet(idx_dir)
        new_idx = S.vector_index(new, "vec_id", "embedding", dim=dim)
        inc = S.incremental_near_dup_pairs(
            new_idx, index, "vec_id", threshold=0.8,
            probe_hamming=1, max_bucket=cap)
        got = {(r["id_a"], r["id_b"], r["pair_kind"]) for r in inc.collect()}

        full = S.near_dup_pairs_lsh(df, "vec_id", "embedding", threshold=0.8,
                                    probe_hamming=1, dim=dim, max_bucket=cap)
        want = set()
        for r in full.collect():
            a_new, b_new = r["id_a"] >= 100, r["id_b"] >= 100
            if a_new or b_new:
                kind = "new_new" if (a_new and b_new) else "new_corpus"
                want.add((r["id_a"], r["id_b"], kind))
        assert got == want
        assert any(k == "new_corpus" for _, _, k in got)  # non-trivial


def test_duplicate_spans_cross_doc_detection(spark):
    """Span-level exact dedup (Lee et al.): a shared 5-token block across
    two docs is found with positions counted per occurrence; a doc with no
    cross-doc spans reports zero even when it repeats itself (that is
    repetition_stats' job); short docs have zero windows."""
    from data_migration_service_spark.operators.dedup import duplicate_spans

    block = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, f"one two {block} three"),          # block at 1 position set
            (2, f"{block} four five {block}"),       # block twice
            (3, "solo solo solo solo solo solo"),    # intra-doc only
            (4, "tiny doc"),                          # < n tokens
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            duplicate_spans(docs, "doc_id", "text", n=5, min_docs=2).collect()}
    assert rows[1]["n_spans"] == 4 and rows[1]["n_dup_spans"] == 1
    # doc 2: 12 tokens -> 8 windows; the block occurs at offsets 1 and 8
    assert rows[2]["n_spans"] == 8 and rows[2]["n_dup_spans"] == 2
    assert rows[3]["n_dup_spans"] == 0
    assert rows[4]["n_spans"] == 0 and rows[4]["dup_span_ratio"] == 0.0
    # xxhash64 fast path agrees on this corpus
    fast = {r["doc_id"]: r["n_dup_spans"] for r in
            duplicate_spans(docs, "doc_id", "text", n=5, min_docs=2,
                            hash_fn="xxhash64").collect()}
    assert fast == {k: r["n_dup_spans"] for k, r in rows.items()}


def test_remove_duplicate_spans_rewrites_text(spark):
    """Exact-substring REMOVAL (Lee et al.): every copy of a cross-doc
    duplicated window is cut; overlapping/adjacent windows merge into one
    covered stretch; docs without cross-doc spans come back verbatim
    (whitespace-canonicalized); short docs are untouched."""
    from data_migration_service_spark.operators.dedup import (
        remove_duplicate_spans)

    block = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, f"one two {block} three"),
            (2, f"{block} four five {block}"),
            (3, "solo solo solo solo solo solo"),
            (4, "tiny doc"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            remove_duplicate_spans(docs, "doc_id", "text",
                                   n=5, min_docs=2).collect()}
    # doc 1: the 5-token block (positions 3-7) is cut, context survives
    assert rows[1]["cleaned_text"] == "one two three"
    assert rows[1]["n_tokens"] == 8 and rows[1]["n_kept"] == 3
    # doc 2: both copies cut, the middle gap survives
    assert rows[2]["cleaned_text"] == "four five"
    assert rows[2]["n_kept"] == 2
    # intra-doc repetition is NOT cross-doc duplication
    assert rows[3]["cleaned_text"] == "solo solo solo solo solo solo"
    # < n tokens -> zero windows -> untouched
    assert rows[4]["cleaned_text"] == "tiny doc"
    assert rows[5]["cleaned_text"] == "" and rows[5]["n_kept"] == 0

    # a doc covered END-TO-END by overlapping dup windows empties out
    twin_a = "w1 w2 w3 w4 w5 w6 w7"
    twins = spark.createDataFrame(
        [(10, twin_a), (11, twin_a)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(twins, "doc_id", "text",
                                  n=5, min_docs=2).collect()}
    assert out[10]["cleaned_text"] == "" and out[10]["n_kept"] == 0
    assert out[11]["cleaned_text"] == ""


def test_remove_duplicate_spans_matches_python_model(spark):
    """Property: for random tiny corpora, the distributed rewrite equals a
    brute-force single-process model (windows counted per distinct doc,
    token kept iff no cross-doc window covers it)."""
    import random as _random

    from data_migration_service_spark.operators.dedup import (
        remove_duplicate_spans)

    rng = _random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]
    n, min_docs = 3, 2
    for trial in range(3):
        docs = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 14))))
                for i in range(10)]

        # brute-force model
        from collections import defaultdict
        gram_docs = defaultdict(set)
        toks = {i: t.split() for i, t in docs}
        for i, ts in toks.items():
            for p in range(len(ts) - n + 1):
                gram_docs[tuple(ts[p:p + n])].add(i)
        dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
        expect = {}
        for i, ts in toks.items():
            covered = set()
            for p in range(len(ts) - n + 1):
                if tuple(ts[p:p + n]) in dup:
                    covered.update(range(p, p + n))
            kept = [t for j, t in enumerate(ts) if j not in covered]
            expect[i] = (len(ts), len(kept), " ".join(kept))

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["n_kept"], r["cleaned_text"])
               for r in remove_duplicate_spans(df, "doc_id", "text",
                                               n=n, min_docs=min_docs)
               .collect()}
        assert got == expect, f"trial {trial} diverged"


def test_cross_group_gram_overlap_semantics_and_plan(spark):
    """The cross-source duplication matrix equals a brute-force model
    (distinct shared n-gram count + containment fractions per source pair),
    and its plan never shuffles document text or goes cartesian."""
    from collections import defaultdict

    from data_migration_service_spark.operators.dedup import (
        cross_group_gram_overlap)
    from data_migration_service_spark.plans.inspect import (
        has_cartesian, physical_plan)

    rows = [
        (0, "a", "one two three four five six"),
        (1, "a", "one two three four seven eight"),
        (2, "b", "one two three four five nine"),   # shares grams with a
        (3, "b", "totally different words here now"),
        (4, "c", "totally different words here now"),  # exact dup of 3
        (5, "c", "short"),                             # below n -> no grams
    ]
    n = 3
    df = spark.createDataFrame(rows, "doc_id long, src string, text string")

    grams = defaultdict(set)  # group -> set of gram tuples
    for _, g, t in rows:
        ts = t.split()
        for p in range(len(ts) - n + 1):
            grams[g].add(tuple(ts[p:p + n]))
    expect = {}
    for a in sorted(grams):
        for b in sorted(grams):
            if a < b and grams[a] & grams[b]:
                s = len(grams[a] & grams[b])
                expect[(a, b)] = (s, s / len(grams[a]), s / len(grams[b]))

    out = cross_group_gram_overlap(df, "text", "src", n=n)
    got = {(r["group_a"], r["group_b"]):
           (r["shared_grams"], r["frac_a"], r["frac_b"])
           for r in out.collect()}
    assert got == expect
    assert not has_cartesian(out)
    # text must never cross a KEYED exchange (joins/aggregates move only
    # 32-byte gram hashes); the one allowed carrier is the small-input
    # round-robin fan-out, which a corpus at scale skips entirely
    pre = [ln for ln in physical_plan(out).splitlines()
           if "Exchange" in ln and "RoundRobinPartitioning" not in ln]
    assert pre and not any("text#" in ln for ln in pre)

    # xxhash64 fast path finds the identical pair matrix
    fast = cross_group_gram_overlap(df, "text", "src", n=n,
                                    hash_fn="xxhash64")
    got_fast = {(r["group_a"], r["group_b"]):
                (r["shared_grams"], r["frac_a"], r["frac_b"])
                for r in fast.collect()}
    assert got_fast == expect


# ---------------------------------------------------------------- SemDeDup


def _py_cell(v, centroids):
    """Python twin of ivf_assign: argmin |c|^2 - 2 v.c, id tie-break."""
    best = None
    for i, c in enumerate(centroids):
        s = sum(x * x for x in c) - 2.0 * sum(x * y for x, y in zip(v, c))
        if best is None or (s, i) < best:
            best = (s, i)
    return best[1]


def _py_cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))
    return num / den


def test_semantic_dedup_matches_brute_force_model(spark, planted):
    """Survivor set == the greedy keep-lowest-id model computed from first
    principles in Python (same cells, exact cosine, margin-safe eps)."""
    cents = S.pseudo_centroids(dim=DIM, n_centroids=4, seed=11)
    got = {r["vec_id"] for r in
           S.semantic_dedup(planted, "vec_id", "embedding", cents,
                            eps=0.9).collect()}

    rows = [(r["vec_id"], list(r["embedding"])) for r in planted.collect()]
    cell = {i: _py_cell(v, cents) for i, v in rows}
    dropped = set()
    for i, vi in rows:
        for j, vj in rows:
            if i < j and cell[i] == cell[j] and _py_cos(vi, vj) >= 0.9:
                dropped.add(j)
    expect = {i for i, _ in rows} - dropped
    assert got == expect
    # the planted dups sit at cosine ~0.995: every same-cell planted pair
    # must have lost its high-id member
    same_cell_dups = [i for i in range(30) if cell[i] == cell[1000 + i]]
    assert same_cell_dups, "fixture degenerate: no same-cell planted pair"
    assert all(1000 + i not in got for i in same_cell_dups)
    assert all(i in got for i in range(60))  # lowest ids always survive


def test_semantic_dedup_transitive_chain_greedy_dominance(spark):
    """a~b and b~c but a!~c: greedy dominance drops BOTH b and c (b by a,
    c by b even though b itself was dropped) — the documented keep rule."""
    a = [1.0, 0.0]
    b = [math.cos(0.2), math.sin(0.2)]   # cos(a,b) ~ 0.980
    c = [math.cos(0.4), math.sin(0.4)]   # cos(b,c) ~ 0.980, cos(a,c) ~ 0.921
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c)], "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0]]  # one cell
    got = sorted(r["vec_id"] for r in
                 S.semantic_dedup(df, "vec_id", "embedding", cents,
                                  eps=0.95).collect())
    assert got == [0]


def test_semantic_dedup_max_cell_skips_hot_cell(spark, planted):
    """A cell over max_cell is excluded from pair generation: all members
    survive (skew guard never silently drops unexamined vectors)."""
    cents = [[0.0] * DIM]  # everything lands in one hot cell
    got = S.semantic_dedup(planted, "vec_id", "embedding", cents,
                           eps=0.9, max_cell=10)
    assert got.count() == planted.count()


def test_semantic_dedup_plan_is_cell_bounded(spark, planted):
    """Pair generation must be the cell equi-join — no cartesian /
    nested-loop join anywhere in the physical plan."""
    cents = S.pseudo_centroids(dim=DIM, n_centroids=4, seed=11)
    out = S.semantic_dedup(planted, "vec_id", "embedding", cents, eps=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sq_codes_bounded_and_reconstruction(planted):
    """int8 SQ invariants: codes in [0,255]; dequantized values within half
    a quantization step of the original (the SQ8 error bound)."""
    dim = DIM
    mins, maxs = S.sq_fit(planted, "embedding", dim)
    rows = planted.select(
        "vec_id", "embedding",
        S.sq_code("embedding", mins, maxs).alias("code")).collect()
    assert rows
    for r in rows:
        assert len(r["code"]) == dim
        for d, (q, x) in enumerate(zip(r["code"], r["embedding"])):
            assert 0 <= q <= 255
            span = maxs[d] - mins[d]
            if span > 0:
                dequant = mins[d] + q * span / 255.0
                assert abs(dequant - x) <= span / 255.0 / 2 + 1e-9


def test_sq_topk_exact_when_rerank_covers_corpus(planted):
    """With k*rerank >= n the candidate cut keeps everything, so sq_topk
    degenerates to the exact brute-force top-k — ids AND scores."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    n = planted.count()
    k = 10
    exact = [(r["vec_id"], round(r["cosine"], 6)) for r in
             cosine_topk(planted, "vec_id", "embedding", qv, k).collect()]
    got = [(r["vec_id"], round(r["cosine"], 6)) for r in
           S.sq_topk(planted, "vec_id", "embedding", qv, k=k,
                     rerank=(n // k) + 1).collect()]
    assert got == exact


def test_sq_topk_recall_at_default_rerank(planted):
    """Integer-domain candidate scoring keeps most of the true top-k: the
    planted corpus's near-dup structure survives 8-bit quantization."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    k = 15
    exact_ids = {r["vec_id"] for r in
                 cosine_topk(planted, "vec_id", "embedding", qv, k).collect()}
    got_ids = {r["vec_id"] for r in
               S.sq_topk(planted, "vec_id", "embedding", qv,
                         k=k, rerank=4).collect()}
    assert len(got_ids & exact_ids) / k >= 0.8
    # the planted twin of the query (cosine ~0.995) must survive SQ
    assert 1000 in got_ids


def test_sq_fit_minmax_semantics(spark):
    rows = [(1, [0.0, -2.0]), (2, [1.0, 2.0]), (3, [0.5, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mins, maxs = S.sq_fit(df, "embedding", 2)
    assert mins == [0.0, -2.0] and maxs == [1.0, 2.0]
    codes = {r["vec_id"]: r["code"] for r in df.select(
        "vec_id", S.sq_code("embedding", mins, maxs).alias("code")).collect()}
    assert codes[1] == [0, 0]      # per-dim minima -> 0
    assert codes[2] == [255, 255]  # per-dim maxima -> 255
    assert codes[3] == [128, 128]  # midpoints -> floor(127.5+0.5)


def test_pq_assign_argmin_semantics(spark):
    """Per-subspace argmin with id tie-break, on a hand-checkable case."""
    # dim=4, m=2, dsub=2; codebooks chosen so nearest entries are obvious
    cbs = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 1.0], [1.0, 0.0]]]
    df = spark.createDataFrame(
        [(1, [0.1, 0.0, 0.0, 0.9]), (2, [0.9, 1.1, 1.0, 0.1])],
        "vec_id long, embedding array<double>")
    codes = {r["vec_id"]: list(r["c"]) for r in df.select(
        "vec_id", S.pq_assign("embedding", cbs).alias("c")).collect()}
    assert codes[1] == [0, 0]  # near (0,0) then near (0,1)
    assert codes[2] == [1, 1]  # near (1,1) then near (1,0)
    with pytest.raises(ValueError):
        S.pq_pseudo_codebooks(dim=10, m=4)


def test_pq_topk_exact_when_rerank_covers_corpus(planted):
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cbs = S.pq_pseudo_codebooks(dim=DIM, m=4, n_codes=8, seed=42)
    n = planted.count()
    k = 10
    exact = [(r["vec_id"], round(r["cosine"], 6)) for r in
             cosine_topk(planted, "vec_id", "embedding", qv, k).collect()]
    got = [(r["vec_id"], round(r["cosine"], 6)) for r in
           S.pq_topk(planted, "vec_id", "embedding", qv, cbs, k=k,
                     rerank=(n // k) + 1).collect()]
    assert got == exact


def test_pq_fit_trained_codebooks_recall(planted):
    """TRAINED PQ (per-subspace k-means) must beat random chance decisively:
    the ADC candidate cut keeps most of the true top-k, and the planted
    twin of the query survives."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cbs = S.pq_fit(planted, "embedding", m=4, n_codes=8, seed=1)
    assert len(cbs) == 4 and all(len(cb) == 8 for cb in cbs)
    assert all(len(c) == DIM // 4 for cb in cbs for c in cb)
    k = 15
    exact_ids = {r["vec_id"] for r in
                 cosine_topk(planted, "vec_id", "embedding", qv, k).collect()}
    got_ids = {r["vec_id"] for r in
               S.pq_topk(planted, "vec_id", "embedding", qv, cbs,
                         k=k, rerank=4).collect()}
    assert len(got_ids & exact_ids) / k >= 0.6
    assert 1000 in got_ids  # the cosine ~0.995 planted twin


def test_ivfpq_exact_when_full_probe_and_rerank(planted):
    """With every cell probed and rerank covering the corpus, IVF-PQ
    degenerates to exact brute-force top-k (the ADC cut keeps everyone)."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = S.pseudo_centroids(dim=DIM, n_centroids=4, seed=42)
    cbs = S.pq_pseudo_codebooks(dim=DIM, m=4, n_codes=8, seed=42)
    n = planted.count()
    k = 10
    exact = [(r["vec_id"], round(r["cosine"], 6)) for r in
             cosine_topk(planted, "vec_id", "embedding", qv, k).collect()]
    got = [(r["vec_id"], round(r["cosine"], 6)) for r in
           S.ivfpq_topk(planted, "vec_id", "embedding", qv, cents, cbs,
                        k=k, n_probe=4, rerank=(n // k) + 1).collect()]
    assert got == exact


def test_ivfpq_candidates_respect_probed_cells(planted):
    """Every returned id must live in one of the n_probe cells nearest the
    query — the partition-pruning contract that makes IVF-PQ O(probed)
    instead of O(corpus)."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = S.pseudo_centroids(dim=DIM, n_centroids=4, seed=42)
    cbs = S.pq_pseudo_codebooks(dim=DIM, m=4, n_codes=8, seed=42)
    got = S.ivfpq_topk(planted, "vec_id", "embedding", qv, cents, cbs,
                       k=10, n_probe=2, rerank=4)
    cells = planted.select(
        "vec_id", S.ivf_assign("embedding", cents).alias("cell"))
    joined = got.join(cells, "vec_id")

    def d2(c):
        return sum(x * x for x in c) - 2 * sum(a * b for a, b in zip(qv, c))

    probed = sorted(range(len(cents)), key=lambda i: (d2(cents[i]), i))[:2]
    assert joined.where(~F.col("cell").isin(probed)).count() == 0
    assert got.count() == 10


def test_ivfpq_trained_residual_codebooks_recall(planted):
    """The trained path: k-means coarse centroids + PQ trained on RESIDUALS
    (pq_fit_residuals) must keep most of the true top-k through the ADC cut
    and retain the planted cosine-0.995 twin."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = S.ivf_fit(planted, "embedding", n_centroids=4, seed=1)
    cbs = S.pq_fit_residuals(planted, "embedding", cents, m=4, n_codes=8,
                             seed=1)
    assert len(cbs) == 4 and all(len(cb) == 8 for cb in cbs)
    assert all(len(c) == DIM // 4 for cb in cbs for c in cb)
    k = 15
    exact_ids = {r["vec_id"] for r in
                 cosine_topk(planted, "vec_id", "embedding", qv, k).collect()}
    got_ids = {r["vec_id"] for r in
               S.ivfpq_topk(planted, "vec_id", "embedding", qv, cents, cbs,
                            k=k, n_probe=3, rerank=4).collect()}
    assert len(got_ids & exact_ids) / k >= 0.6
    assert 1000 in got_ids  # the planted twin of the query


def test_pq_index_search_matches_inline_ivfpq(planted, tmp_path):
    """ivfpq_search over a stored pq_index (written to parquet partitioned
    by cell, reopened) must equal the inline ivfpq_topk exactly — the
    write-time-column contract: coding once at ingest changes nothing."""
    qv = [float(x) for x in
          planted.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    cents = S.pseudo_centroids(dim=DIM, n_centroids=4, seed=42)
    cbs = S.pq_pseudo_codebooks(dim=DIM, m=4, n_codes=8, seed=42)
    idx = S.pq_index(planted, "vec_id", "embedding", cents, cbs)
    path = str(tmp_path / "pqidx")
    idx.write.partitionBy("cell").parquet(path)
    spark = planted.sparkSession
    stored = spark.read.parquet(path)
    inline = [(r["vec_id"], round(r["cosine"], 6)) for r in
              S.ivfpq_topk(planted, "vec_id", "embedding", qv, cents, cbs,
                           k=10, n_probe=2, rerank=4).collect()]
    via_index = [(r["vec_id"], round(r["cosine"], 6)) for r in
                 S.ivfpq_search(stored, qv, cents, cbs, id_col="vec_id",
                                k=10, n_probe=2, rerank=4).collect()]
    assert via_index == inline
    # the probe scan prunes partitions: only probed cells' files are read
    probes = set(S._query_probes(qv, cents, 2))
    pruned = S.ivfpq_search(stored, qv, cents, cbs, k=10, n_probe=2)
    files = pruned.inputFiles()
    assert files and all(
        any(f"cell={c}" in f for c in probes) for f in files)
