"""Deterministic synthetic CDC fixtures (FIXTURES.md §§1-3).

All pseudo-randomness is `xxhash64(..., seed)` column expressions — generation
is distributed, seed-stable, and free of Python RNG / wall-clock, so a replay
of the generator is byte-reproducible at any scale factor (the property the
exactly-once and oracle tests depend on).

Shapes per BASELINE.json input_hint: base table (repo, path, commit, lang,
content); change events add (lsn, op, ts, schema_version). The event log is
Zipf-skewed over repos on purpose: hot-repo skew is a required test property
(north_rule: salted repartitioning must be exercised).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXTS = ["py", "java", "scala", "md"]
LANGS = ["python", "java", "scala", "markdown"]
EPOCH_TS = "2026-01-01 00:00:00"


def _u(col, seed: int, salt: str):
    """Uniform [0,1) from a hash — deterministic 'randomness'."""
    h = F.xxhash64(col.cast("string"), F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000_000)).cast("double") / 1e9)


def gen_changes(
    spark: SparkSession,
    n_events: int,
    n_repos: int = 100,
    n_paths_per_repo: int = 200,
    seed: int = 42,
    zipf_s: float = 1.2,
    schema_v2_at: int | None = None,
    schema_v3_at: int | None = None,
    partitions: int | None = None,
    content_blocks: int = 8,
) -> DataFrame:
    """Ordered CDC event log: lsn strictly increasing 1..n_events.

    op sequencing is valid per key (first event for a key is an insert;
    deletes are tombstones; re-insert after delete allowed). `content` is a
    seeded token soup 64..~4096 chars with unicode/emoji and NULL-for-delete
    cases — the reference's hash-canonicalization traps
    (DataVerificationService.java:246-247).
    """
    v2 = schema_v2_at if schema_v2_at is not None else (2 * n_events) // 3 + 1
    v3 = schema_v3_at if schema_v3_at is not None else n_events + 1  # off by default
    df = spark.range(1, n_events + 1, 1, partitions or max(8, n_events // 250_000))
    df = df.withColumnRenamed("id", "lsn")

    # Zipf-ish repo choice: inverse-CDF power-law — u^s concentrates mass at 0.
    repo_idx = F.floor(F.pow(_u(F.col("lsn"), seed, "repo"), F.lit(zipf_s)) * n_repos)
    repo_idx = F.least(repo_idx, F.lit(n_repos - 1))
    path_idx = F.pmod(F.xxhash64(F.col("lsn"), F.lit("path"), F.lit(seed)),
                      F.lit(n_paths_per_repo))
    ext_idx = F.pmod(F.xxhash64(F.col("lsn"), F.lit("ext"), F.lit(seed)), F.lit(4))

    df = (
        df.withColumn("repo", F.format_string("repo_%04d", repo_idx))
        .withColumn("_pidx", path_idx)
        .withColumn("_eidx", ext_idx.cast("int"))
        .withColumn(
            "path",
            F.format_string(
                "src/d%02d/f%04d.%s",
                F.pmod(F.col("_pidx"), F.lit(17)),
                F.col("_pidx"),
                F.element_at(F.array(*[F.lit(e) for e in EXTS]), F.col("_eidx") + 1),
            ),
        )
        .withColumn(
            "lang",
            F.element_at(F.array(*[F.lit(l) for l in LANGS]), F.col("_eidx") + 1),
        )
    )

    # Valid op sequencing: rank events within key by lsn; first=insert,
    # later ~1/10 delete, rest update. Window shuffle is on the merge key —
    # the same shuffle the engine itself needs, so generation stays honest
    # about skew.
    from pyspark.sql import Window as W

    w = W.partitionBy("repo", "path").orderBy("lsn")
    df = df.withColumn("_rn", F.row_number().over(w))
    op_u = F.pmod(F.xxhash64("lsn", F.lit("op"), F.lit(seed)), F.lit(10))
    df = df.withColumn(
        "op",
        F.when(F.col("_rn") == 1, F.lit("insert"))
        .when(op_u == 0, F.lit("delete"))
        .otherwise(F.lit("update")),
    )

    # commit = 40-hex from sha1(repo/path:rn)
    df = df.withColumn(
        "commit",
        F.sha1(F.concat_ws(":", F.concat_ws("/", "repo", "path"), F.col("_rn"))),
    )

    # content: 1..8 sha256 blocks of 64 hex chars + optional emoji/unicode
    # garnish; empty string when hash%13==0; NULL for deletes.
    # `content_blocks` scales document size (1..N blocks of 65 chars) —
    # source-code files are KBs, so scale benches raise this
    n_blocks = (F.pmod(F.xxhash64("lsn", F.lit("len"), F.lit(seed)),
                       F.lit(content_blocks)) + 1)
    block = F.sha2(F.concat_ws("#", "repo", "path", F.col("lsn").cast("string")), 256)
    body = F.concat_ws(
        " ",
        F.array_repeat(block, n_blocks.cast("int")),
    )
    # array_repeat -> array<string>; concat_ws flattens arrays of strings
    garnish_u = F.pmod(F.xxhash64("lsn", F.lit("gar"), F.lit(seed)), F.lit(7))
    body = F.when(garnish_u == 0, F.concat(body, F.lit(" ✨🛠️ ünïcødé"))).otherwise(body)
    empty_u = F.pmod(F.xxhash64("lsn", F.lit("empty"), F.lit(seed)), F.lit(13))
    body = F.when(empty_u == 0, F.lit("")).otherwise(body)
    df = df.withColumn(
        "content",
        F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(body),
    )

    df = (
        df.withColumn(
            "ts",
            F.to_timestamp(F.lit(EPOCH_TS)) + F.make_dt_interval(secs=F.col("lsn").cast("double")),
        )
        .withColumn(
            "schema_version",
            F.when(F.col("lsn") >= v3, F.lit(3))
            .when(F.col("lsn") >= v2, F.lit(2))
            .otherwise(F.lit(1)),
        )
    )
    # v2 adds size_bytes (nullable before v2); v3 renames lang->language at
    # the payload level — emitted here under the *current* name per version.
    df = df.withColumn(
        "size_bytes",
        F.when(F.col("schema_version") >= 2, F.length("content").cast("long")),
    )
    return df.drop("_pidx", "_eidx", "_rn")


def expected_final_state(changes: DataFrame) -> DataFrame:
    """Oracle final table state: LWW replay of the full log in lsn order.

    Pure DataFrame formulation (one window over the merge key) — used to
    validate the *incremental* engine against a *batch* re-derivation, the
    Spark analogue of the reference's source-vs-target verification
    (DataVerificationService.java:126-252).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("repo", "path").orderBy(F.col("lsn").desc())
    last = changes.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return (
        last.where(F.col("op") != "delete")
        .select(
            "repo",
            "path",
            "commit",
            "lang",
            "content",
            "size_bytes",
            F.col("lsn").alias("last_lsn"),
        )
    )


def gen_duplicated_delivery(changes: DataFrame, seed: int = 42) -> DataFrame:
    """Each event delivered 1-3x with identical lsn (at-least-once transport)
    — exactly-once test input."""
    copies = (F.pmod(F.xxhash64("lsn", F.lit("dup"), F.lit(seed)), F.lit(3)) + 1).cast("int")
    return (
        changes.withColumn("_copies", copies)
        .withColumn("_i", F.explode(F.sequence(F.lit(1), F.col("_copies"))))
        .drop("_copies", "_i")
    )


def gen_tenant_table(spark: SparkSession, n_tenants: int = 5, rows_per_tenant: int = 1000,
                     seed: int = 42, with_pk: bool = True) -> DataFrame:
    """Reference-shape regression fixture (FIXTURES.md §5): multi-tenant rows
    with every canonicalization trap type (NULL vs ' ', bool, ts millis,
    decimal, date, jsonb-as-text)."""
    n = n_tenants * rows_per_tenant
    df = spark.range(n).withColumn("tenant_id", F.format_string("t%02d", F.pmod("id", F.lit(n_tenants))))
    h = lambda salt: F.xxhash64("id", F.lit(salt), F.lit(seed))  # noqa: E731
    df = (
        df.withColumn("id1", F.format_string("k%06d", F.col("id")))
        .withColumn("id2", F.format_string("g%03d", F.pmod(h("id2"), F.lit(500))))
        .withColumn(
            "v_str",
            F.when(F.pmod(h("null"), F.lit(11)) == 0, F.lit(None).cast("string"))
            .when(F.pmod(h("null"), F.lit(11)) == 1, F.lit(" "))  # NULL-vs-space trap
            .otherwise(F.sha2(F.col("id").cast("string"), 256)),
        )
        .withColumn("v_int", F.when(F.pmod(h("ni"), F.lit(7)) == 0, F.lit(None).cast("long"))
                    .otherwise(F.pmod(h("vi"), F.lit(100000))))
        .withColumn("v_dec", (F.pmod(h("vd"), F.lit(10**8)).cast("double") / 10**4).cast("decimal(18,4)"))
        .withColumn("v_bool", F.pmod(h("vb"), F.lit(2)) == 0)
        .withColumn("v_ts", F.to_timestamp(F.lit(EPOCH_TS)) + F.make_dt_interval(
            secs=(F.pmod(h("vt"), F.lit(86_400_000)).cast("double") / 1000.0)))
        .withColumn("v_date", F.to_date(F.lit("2026-01-01")) + F.pmod(h("dt"), F.lit(365)).cast("int"))
        .withColumn("v_json", F.to_json(F.struct(F.pmod(h("js"), F.lit(100)).alias("k"))))
    )
    if not with_pk:
        df = df.drop("id1", "id2")
    return df.drop("id")


def default_registry(v2_at: int, v3_at: int):
    """Registry matching gen_changes' version boundaries: v2 adds size_bytes,
    v3 renames lang -> language (FIXTURES.md §3)."""
    from data_migration_service_spark.registry import SchemaRegistry, SchemaVersion

    return SchemaRegistry(
        [
            SchemaVersion(1, 1, [("commit", "string"), ("lang", "string"),
                                 ("content", "string")]),
            SchemaVersion(2, v2_at, [("commit", "string"), ("lang", "string"),
                                     ("content", "string"), ("size_bytes", "long")]),
            SchemaVersion(3, v3_at, [("commit", "string"), ("language", "string"),
                                     ("content", "string"), ("size_bytes", "long")],
                          renames={"lang": "language"}),
        ]
    )


def to_raw_events(changes: DataFrame) -> DataFrame:
    """Wire shape: envelope + version-named JSON payload (Debezium-ish).

    v1 events carry {commit, lang, content}; v2 adds size_bytes; v3 renames
    lang -> language *in the payload keys* — exactly the mixed-version input
    the registry's micro-batch resolution must handle.
    """
    v = F.col("schema_version")
    payload = (
        F.when(v == 1, F.to_json(F.struct("commit", "lang", "content")))
        .when(v == 2, F.to_json(F.struct("commit", "lang", "content", "size_bytes")))
        .otherwise(
            F.to_json(
                F.struct(
                    "commit", F.col("lang").alias("language"), "content", "size_bytes"
                )
            )
        )
    )
    return changes.select(
        "lsn", "op", "repo", "path", "ts", "schema_version",
        payload.alias("payload"),
    )
