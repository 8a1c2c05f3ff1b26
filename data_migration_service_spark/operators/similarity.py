"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one broadcast of the query
vector, one pass, one top-k — `F.aggregate`/`zip_with` keep the dot product
JVM-side, no Python). The scale path is random-hyperplane LSH:
deterministically-derived hyperplanes bucket vectors so candidate generation
is an equi-join on (band of sign bits), turning O(n·q) into O(bucket) —
the IVF/LSH pattern for 100 TB corpora. Exactness is traded for recall;
`lsh_topk` reranks candidates with true cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_scores(df: DataFrame, id_col: str, vec_col: str, query: list[float]) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query])
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return df.select(F.col(id_col), F.round(cos, 6).alias("cosine"))


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact brute-force top-k by cosine (deterministic tie-break on id)."""
    return (
        cosine_scores(df, id_col, vec_col, query)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >= t).

    Exact formulation (self-join, JVM-side dot products) — the correctness
    baseline with a direct SQL oracle. At corpus scale the same rerank runs
    over `lsh_bucket` candidate pairs instead of the full self-join (recall
    traded for the ~2^n_planes candidate reduction), exactly like
    `lsh_topk`; the exact path here is what validates that scale path.
    """
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).cast("array<double>").alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).cast("array<double>").alias("_vb"))
    j = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    return (
        j.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[int]:
    """Deterministic ±1 hyperplane from a hash — no stored model, any worker
    can re-derive it (important: nothing to broadcast or version)."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.sha256(f"{seed}:{plane}:{d}".encode()).digest()[0]
        out.append(1 if h & 1 else -1)
    return out


def lsh_bucket(df: DataFrame, vec_col: str, n_planes: int = 8, seed: int = 42,
               dim: int = 64) -> F.Column:
    """Sign-bit bucket id: bit p = (v · hyperplane_p) > 0."""
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        hp = F.array(*[F.lit(float(x)) for x in _hyperplane(dim, p, seed)])
        bit = F.when(_dot(v, hp) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only vectors whose LSH bucket is within
    `probe_hamming` bits of the query's bucket (multi-probe), then exact
    cosine rerank. Candidate set is a partition-pruned fraction ~C(n_planes,
    <=probe)/2^n_planes of the corpus."""
    dim = len(query)
    with_bucket = df.withColumn("_bkt", lsh_bucket(df, vec_col, n_planes, seed, dim))

    # query bucket + probe set, computed driver-side (tiny)
    import hashlib  # noqa: F401  (hyperplanes re-derived below)

    qb = 0
    for p in range(n_planes):
        hp = _hyperplane(dim, p, seed)
        if sum(x * y for x, y in zip(query, hp)) > 0:
            qb |= 1 << p
    probes = {qb}
    if probe_hamming >= 1:
        for p in range(n_planes):
            probes.add(qb ^ (1 << p))
    cand = with_bucket.where(F.col("_bkt").isin(*probes))
    return (
        cosine_scores(cand, id_col, vec_col, query)
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
