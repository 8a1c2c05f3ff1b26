"""CLI surface (python -m data_migration_service_spark) — the reference's
REST verbs (readMe.md:51-61) as config-driven commands. Runs main() in
process against the session fixture; each command's stdout is one JSON doc."""

import json

import pyspark.sql.types as T
from pyspark.sql import functions as F

from data_migration_service_spark.__main__ import main
from data_migration_service_spark.fixtures.cdc import expected_final_state, gen_changes
from data_migration_service_spark.tables.lake import SnapshotTable

TABLE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("lsn", T.LongType(), False),
    ]
)


def _setup(spark, tmp_path, names=("repos_a", "repos_b")):
    schema_path = str(tmp_path / "schema.json")
    with open(schema_path, "w") as f:
        json.dump(TABLE_SCHEMA.jsonValue(), f)
    tables, changes = {}, {}
    for i, name in enumerate(names):
        ch = gen_changes(spark, 800, n_repos=8, n_paths_per_repo=12,
                         seed=31 + i).cache()
        src = str(tmp_path / f"events_{name}")
        ch.write.mode("overwrite").parquet(src)
        exp = str(tmp_path / f"expected_{name}")
        expected_final_state(ch).select(
            "repo", "path", "commit", "lang", "content", "size_bytes",
            F.col("last_lsn").alias("lsn"),
        ).write.mode("overwrite").parquet(exp)
        changes[name] = ch
        tables[name] = {
            "table_path": str(tmp_path / f"lake_{name}"),
            "source": src,
            "expected": exp,
            "schema_json": schema_path,
            "n_buckets": 8,
            "merge_mode": "mor",
        }
    cfg_path = str(tmp_path / "conf.json")
    with open(cfg_path, "w") as f:
        json.dump({"tables": tables}, f)
    return cfg_path, tables, changes


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_jobs_run_status_verify_cleanup(spark, tmp_path, capsys):
    cfg, tables, changes = _setup(spark, tmp_path)

    rc, res = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0
    assert {res[n]["status"] for n in tables} == {"COMPLETED"}
    for name, entry in tables.items():
        t = SnapshotTable(spark, entry["table_path"])
        assert t.read().count() == expected_final_state(changes[name]).count()

    rc, st = _run(capsys, ["--config", cfg, "jobs", "status"])
    assert rc == 0 and set(st) == set(tables)
    assert all(s["snapshot_id"] >= 2 and s["epoch"] >= 0 for s in st.values())

    # single-table addressing (POST /jobs/{t} analogue); re-running the
    # same source is LWW-absorbed — the final state cannot change
    before = SnapshotTable(spark, tables["repos_a"]["table_path"]).read().count()
    rc, res1 = _run(capsys, ["--config", cfg, "jobs", "run", "--batch",
                             "--table", "repos_a"])
    assert rc == 0 and list(res1) == ["repos_a"]
    assert SnapshotTable(
        spark, tables["repos_a"]["table_path"]).read().count() == before

    rc, ver = _run(capsys, ["--config", cfg, "verify"])
    assert rc == 0
    assert {ver[n]["status"] for n in tables} == {"CONSISTENT"}
    assert all(ver[n]["n_mismatch"] == 0 for n in tables)

    rc, cl = _run(capsys, ["--config", cfg, "cleanup", "--table", "repos_b"])
    assert rc == 0 and cl["repos_b"] > 0
    assert SnapshotTable(spark, tables["repos_b"]["table_path"]).read().count() == 0
    # the untargeted table is untouched
    assert SnapshotTable(spark, tables["repos_a"]["table_path"]).read().count() > 0

    # verification now fails loudly for the truncated table
    rc, ver2 = _run(capsys, ["--config", cfg, "verify", "--table", "repos_b"])
    assert rc == 1 and ver2["repos_b"]["status"] == "INCONSISTENT"


def test_cli_unknown_table_rejected(spark, tmp_path, capsys):
    cfg, _, _ = _setup(spark, tmp_path, names=("solo",))
    try:
        main(["--config", cfg, "jobs", "status", "--table", "nope"])
        raise AssertionError("expected SystemExit")
    except SystemExit as e:
        assert "unknown table" in str(e.code) or e.code not in (0, None)


def test_cli_maintain_report_and_apply(spark, tmp_path, capsys):
    """`maintain` reports table health from metadata only; `--apply`
    compacts the flagged buckets and expires old snapshots."""
    cfg, tables, _ = _setup(spark, tmp_path, names=("solo",))
    # config with a never-auto-compact threshold so deltas accumulate
    with open(cfg) as f:
        conf = json.load(f)
    conf["tables"]["solo"]["compact_threshold"] = 100
    with open(cfg, "w") as f:
        json.dump(conf, f)

    rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0
    # two more replays of the same source: absorbed by LWW, but each commits
    # a snapshot — history to expire (delta depth stays modest)
    for _ in range(2):
        rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])

    rc, rep = _run(capsys, ["--config", cfg, "maintain", "--keep-snapshots",
                            "1", "--compact-at", "2"])
    assert rc == 0
    plan = rep["solo"]["plan"]
    assert plan["compact"]["max_delta_depth"] >= 2
    assert plan["compact"]["buckets"]
    assert rep["solo"]["actions"] == {}  # report-only without --apply
    n_snaps_before = len(SnapshotTable(spark, tables["solo"]["table_path"])
                         .snapshots())
    assert plan["expire"]["expirable_snapshots"]

    rc, rep2 = _run(capsys, ["--config", cfg, "maintain", "--apply",
                             "--keep-snapshots", "1", "--compact-at", "2"])
    assert rc == 0
    t = SnapshotTable(spark, tables["solo"]["table_path"])
    assert len(t.snapshots()) < n_snaps_before
    assert not any(t.current().deltas.values())  # compacted
    assert t.read().count() > 0


def test_cli_tag_and_sampled_verify(spark, tmp_path, capsys):
    cfg, tables, changes = _setup(spark, tmp_path, names=("solo2",))
    rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0

    # tag HEAD, list, and confirm the pin survives expiry via the API
    rc, created = _run(capsys, ["--config", cfg, "tag", "create", "corpus-v1"])
    assert rc == 0 and isinstance(created["solo2"], int)
    rc, listed = _run(capsys, ["--config", cfg, "tag", "list"])
    assert listed["solo2"] == {"corpus-v1": created["solo2"]}

    # sampled verify: consistent table -> CONSISTENT with sample metadata
    rc, rep = _run(capsys, ["--config", cfg, "verify", "--sample", "3"])
    assert rc == 0
    assert rep["solo2"]["status"] == "CONSISTENT"
    assert rep["solo2"]["sampled"]["denominator"] == 3
    # sample really is a subset of the full verification's row counts
    rc, full = _run(capsys, ["--config", cfg, "verify"])
    assert rep["solo2"]["source_rows"] < full["solo2"]["source_rows"]

    rc, dropped = _run(capsys, ["--config", cfg, "tag", "drop", "corpus-v1"])
    assert rc == 0 and dropped["dropped"] == "corpus-v1"
    rc, listed2 = _run(capsys, ["--config", cfg, "tag", "list"])
    assert listed2["solo2"] == {}


def test_cli_fsck_healthy_then_broken(spark, tmp_path, capsys):
    """`fsck` exits 0 on a healthy table and 1 (with the damage named)
    after a bucket subdir is lost."""
    import os
    import shutil

    cfg, tables, _ = _setup(spark, tmp_path, names=("solo3",))
    rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0
    rc, rep = _run(capsys, ["--config", cfg, "fsck"])
    assert rc == 0 and rep["solo3"]["ok"]

    t = SnapshotTable(spark, tables["solo3"]["table_path"])
    snap = t.current()
    if snap.buckets:
        b, d = next(iter(snap.buckets.items()))
    else:  # merge-on-read: the epoch landed as delta dirs
        b, ds = next(iter(snap.deltas.items()))
        d = ds[0]
    shutil.rmtree(os.path.join(t._datadir, d, f"_bucket={b}"))
    rc, rep = _run(capsys, ["--config", cfg, "fsck"])
    assert rc == 1 and not rep["solo3"]["ok"]
    assert any(m["bucket"] == b for m in rep["solo3"]["missing_buckets"])


def test_cli_writer_id_config_passthrough(spark, tmp_path, capsys):
    """A per-table `writer_id` in the JSON config namespaces the epoch
    counter (multi-writer fan-in) and `jobs status` surfaces it."""
    cfg_path, tables, _ = _setup(spark, tmp_path, names=("repos_w",))
    tables["repos_w"]["writer_id"] = "shard0"
    with open(cfg_path, "w") as f:
        json.dump({"tables": tables}, f)
    rc, out = _run(capsys, ["--config", cfg_path, "jobs", "run",
                            "--table", "repos_w", "--batch"])
    assert rc == 0
    rc, st = _run(capsys, ["--config", cfg_path, "jobs", "status",
                           "--table", "repos_w"])
    assert rc == 0
    assert st["repos_w"]["writer_epochs"].get("shard0", -1) >= 0
    assert st["repos_w"]["epoch"] == -1  # plain counter untouched


def test_cli_index_create_sync_find(spark, tmp_path, capsys):
    cfg, tables, changes = _setup(spark, tmp_path, names=("repos_a",))
    rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0
    ix_path = str(tmp_path / "ix_commit")

    rc, res = _run(capsys, ["--config", cfg, "index", "create",
                            "--table", "repos_a", "--column", "commit",
                            "--path", ix_path])
    assert rc == 0 and not res["skipped"]

    # pick a live (value, key) pair and find it via the CLI
    t = SnapshotTable(spark, tables["repos_a"]["table_path"])
    row = t.read().limit(1).collect()[0]
    rc, found = _run(capsys, ["--config", cfg, "index", "find",
                              "--table", "repos_a", "--path", ix_path,
                              "--value", row["commit"]])
    assert rc == 0
    assert any(r["repo"] == row["repo"] and r["path"] == row["path"]
               for r in found["rows"])
    assert all(r["commit"] == row["commit"] for r in found["rows"])

    # nothing new -> sync skips; --compact folds the delta dirs
    rc, st = _run(capsys, ["--config", cfg, "index", "sync",
                           "--table", "repos_a", "--path", ix_path,
                           "--compact"])
    assert rc == 0 and st["skipped"] and st["compacted"]
    ix_t = SnapshotTable(spark, ix_path)
    assert not any(ix_t.current().deltas.values())


def test_cli_erase_verb(spark, tmp_path, capsys):
    """`erase --table t --keys keys.parquet` hard-deletes + purges history
    and exits 0 only when no residual row survives anywhere."""
    cfg, tables, _ = _setup(spark, tmp_path, names=("solo4",))
    rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0
    t = SnapshotTable(spark, tables["solo4"]["table_path"])
    keys = t.read().select("repo", "path").limit(2)
    kp = str(tmp_path / "erase_keys")
    keys.write.parquet(kp)
    before = t.read().count()
    rc, rep = _run(capsys, ["--config", cfg, "erase", "--table", "solo4",
                            "--keys", kp])
    assert rc == 0 and rep["residual_rows"] == 0
    assert t.read().count() == before - 2


def test_cli_merge_verb(spark, tmp_path, capsys):
    cfg, tables, changes = _setup(spark, tmp_path, names=("repos_a",))
    rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0

    # correction: rewrite one live doc's content, insert a brand-new one
    state = SnapshotTable(spark, tables["repos_a"]["table_path"],)
    k = state.read().select("repo", "path").orderBy("repo", "path").first()
    src_path = str(tmp_path / "merge_src")
    spark.createDataFrame(
        [(k["repo"], k["path"], "patched"), ("rNEW", "pNEW", "added")],
        "repo string, path string, body string",
    ).write.mode("overwrite").parquet(src_path)
    spec_path = str(tmp_path / "merge_spec.json")
    with open(spec_path, "w") as f:
        json.dump({
            "matched": [{"action": "update", "condition": None,
                         "set": {"content": "s.body"}}],
            "not_matched": {"values": {"content": "s.body",
                                       "lang": "'md'", "size_bytes": "0"}},
            "epoch": 10_000,
        }, f)

    rc, res = _run(capsys, ["--config", cfg, "merge", "--table", "repos_a",
                            "--source", src_path, "--spec", spec_path])
    assert rc == 0
    assert (res["rows_matched"], res["rows_inserted"]) == (1, 1)
    after = SnapshotTable(spark, tables["repos_a"]["table_path"]).read()
    assert after.where((F.col("repo") == k["repo"]) &
                       (F.col("path") == k["path"])) \
                .first()["content"] == "patched"
    assert after.where("repo='rNEW'").first()["content"] == "added"


def test_cli_repair_verb(spark, tmp_path, capsys):
    cfg, tables, changes = _setup(spark, tmp_path, names=("repos_a",))
    rc, _ = _run(capsys, ["--config", cfg, "jobs", "run", "--batch"])
    assert rc == 0

    # drift: drop one row from the target behind the source of truth's back
    t = SnapshotTable(spark, tables["repos_a"]["table_path"])
    k = t.read().select("repo", "path").orderBy("repo", "path").limit(1)
    from data_migration_service_spark.operators.merge import delete_where
    from data_migration_service_spark.config import EngineConfig
    delete_where(t, EngineConfig(table_path=t.root), keys=k)

    # dry run reports the drift and exits 1, table untouched
    before = t.read().count()
    rc, res = _run(capsys, ["--config", cfg, "repair", "--dry-run"])
    assert rc == 1 and res["repos_a"]["status"] == "WOULD_REPAIR"
    assert res["repos_a"]["n_missing_in_target"] == 1
    assert t.read().count() == before

    # real repair converges (exit 0); a second dry run is CLEAN
    rc, res = _run(capsys, ["--config", cfg, "repair"])
    assert rc == 0 and res["repos_a"]["status"] == "CONVERGED"
    assert res["repos_a"]["residual_bad_keys"] == 0
    rc, res = _run(capsys, ["--config", cfg, "repair", "--dry-run"])
    assert rc == 0 and res["repos_a"]["status"] == "CLEAN"


def test_cli_optimize_verb(spark, tmp_path, capsys):
    """optimize --set-prop write_sort=... : the Delta OPTIMIZE ZORDER
    one-liner — props committed, base files rewritten, state unchanged."""
    cfg_path, tables, changes = _setup(spark, tmp_path, names=("repos_a",))
    rc, _ = _run(capsys, ["--config", cfg_path, "jobs", "run",
                          "--table", "repos_a", "--batch"])
    assert rc == 0
    t = SnapshotTable(spark, tables["repos_a"]["table_path"])
    before = {tuple(r) for r in
              t.read().select("repo", "path", "lsn").collect()}

    rc, out = _run(capsys, ["--config", cfg_path, "optimize",
                            "--table", "repos_a",
                            "--set-prop", "write_sort=cols:lang"])
    assert rc == 0
    assert out["repos_a"]["snapshot_id"] >= 1
    snap = t.current()
    assert snap.props["write_sort"] == "cols:lang"
    assert not any(snap.deltas.values())  # deltas folded by the rewrite
    after = {tuple(r) for r in
             t.read().select("repo", "path", "lsn").collect()}
    assert after == before
    # malformed prop is a loud exit-1
    rc, out = _run(capsys, ["--config", cfg_path, "optimize",
                            "--table", "repos_a", "--set-prop", "oops"])
    assert rc == 1 and "error" in out


def test_cli_derived_verbs(spark, tmp_path, capsys):
    """derived create / sync: the chunk-index lifecycle from the command
    line — create bootstraps, a later sync converges incrementally."""
    cfg_path, tables, changes = _setup(spark, tmp_path, names=("repos_a",))
    rc, _ = _run(capsys, ["--config", cfg_path, "jobs", "run",
                          "--table", "repos_a", "--batch"])
    assert rc == 0
    sql_file = str(tmp_path / "chunks.sql")
    with open(sql_file, "w") as f:
        f.write("""
SELECT repo, path, lsn, CAST(chunk_id AS BIGINT) AS seq,
       substring(content, chunk_id * 8 + 1, 8) AS chunk_text
FROM (SELECT * FROM __source__
      WHERE content IS NOT NULL AND length(content) > 0)
LATERAL VIEW explode(
    sequence(0, CAST(floor((length(content) - 1) / 8) AS INT))
) t AS chunk_id
""")
    dpath = str(tmp_path / "chunks")
    rc, out = _run(capsys, ["--config", cfg_path, "derived", "create",
                            "--table", "repos_a", "--path", dpath,
                            "--sql-file", sql_file])
    assert rc == 0 and out["mode"] == "bootstrap"

    # mutate the source out-of-band, then CLI sync catches up
    from data_migration_service_spark.api import Engine
    from data_migration_service_spark.config import EngineConfig
    eng = Engine(spark, EngineConfig(
        table_path=tables["repos_a"]["table_path"], merge_mode="mor"))
    eng.update_where({"content": "upper(content)"},
                     predicate=F.col("repo") == "repo_0001")
    rc, out = _run(capsys, ["--config", cfg_path, "derived", "sync",
                            "--table", "repos_a", "--path", dpath,
                            "--compact"])
    assert rc == 0 and out["mode"] == "changefeed" and out["compacted"]

    from data_migration_service_spark.tables.derived import DerivedTable
    d = DerivedTable(spark, dpath)
    exp = DerivedTable._run_transform(
        spark, eng.table.read(), open(sql_file).read()
    ).select("repo", "path", "seq", "lsn", "chunk_text")
    got = d.read().select("repo", "path", "seq", "lsn", "chunk_text")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # guard: both/neither sql inputs
    rc, out = _run(capsys, ["--config", cfg_path, "derived", "create",
                            "--table", "repos_a",
                            "--path", str(tmp_path / "d2")])
    assert rc == 1 and "error" in out


def test_cli_derived_table_selection_errors(spark, tmp_path, capsys):
    """Regression (round-3 ADVICE, low): derived verbs with an ambiguous
    --table selection must honor the JSON error + exit-1 contract, not
    raise a bare unpack ValueError."""
    cfg_path, tables, _ = _setup(spark, tmp_path)  # two configured tables
    # no --table with a two-table config -> ambiguous
    rc, out = _run(capsys, ["--config", cfg_path, "derived", "sync",
                            "--path", str(tmp_path / "nope")])
    assert rc == 1 and "error" in out and "matched 2" in out["error"]
    rc, out = _run(capsys, ["--config", cfg_path, "derived", "create",
                            "--path", str(tmp_path / "nope"),
                            "--sql", "SELECT 1"])
    assert rc == 1 and "error" in out


def test_cli_replay_keys_changes_sql_blame(spark, tmp_path, capsys):
    """The four round-3 verbs: replay-keys (migrateSpecificRecords
    analogue), changes (changefeed export), sql, and blame — each honoring
    the one-JSON-doc contract."""
    cfg_path, tables, changes = _setup(spark, tmp_path, names=("repos_a",))
    # give the table a checkpoint so blame has a lineage store
    cfg = json.load(open(cfg_path))
    cfg["tables"]["repos_a"]["checkpoint_path"] = str(tmp_path / "ckpt_a")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    rc, _ = _run(capsys, ["--config", cfg_path, "jobs", "run", "--batch"])
    assert rc == 0

    ch = changes["repos_a"]
    some = (ch.select("repo", "path").distinct().limit(5))
    keys_path = str(tmp_path / "keys")
    some.write.parquet(keys_path)

    # replay-keys: idempotent re-apply of those keys' events
    rc, out = _run(capsys, ["--config", cfg_path, "replay-keys",
                            "--keys", keys_path])
    assert rc == 0 and out["table"] == "repos_a"
    assert out["rows_in_batch"] >= 0 and "snapshot_id" in out

    # changes: snapshot 1 (empty table) -> HEAD must replay to final state
    out_dir = str(tmp_path / "cf_out")
    rc, out = _run(capsys, ["--config", cfg_path, "changes",
                            "--from-snapshot", "1", "--out", out_dir])
    assert rc == 0 and out["rows_written"] > 0
    cf = spark.read.parquet(out_dir)
    live = cf.where(F.col("op") != "delete")
    from data_migration_service_spark.api import Engine
    from data_migration_service_spark.config import EngineConfig
    eng = Engine(spark, EngineConfig(
        table_path=tables["repos_a"]["table_path"], merge_mode="mor"))
    state = eng.table.read().select("repo", "path", "lsn")
    assert live.select("repo", "path", "lsn").exceptAll(state).count() == 0
    assert state.exceptAll(live.select("repo", "path", "lsn")).count() == 0

    # changes without --out: inline sample honoring --limit
    rc, out = _run(capsys, ["--config", cfg_path, "changes",
                            "--from-snapshot", "1", "--limit", "7"])
    assert rc == 0 and out["n_rows"] == 7 and len(out["rows"]) == 7

    # sql: aggregate over the registered view
    rc, out = _run(capsys, ["--config", cfg_path, "sql", "-q",
                            "SELECT count(*) AS n FROM repos_a"])
    assert rc == 0 and out["rows"][0]["n"] == state.count()
    rc, out = _run(capsys, ["--config", cfg_path, "sql"])
    assert rc == 1 and "error" in out

    # blame: every looked-up key resolves to epoch candidates
    rc, out = _run(capsys, ["--config", cfg_path, "blame",
                            "--keys", keys_path])
    assert rc == 0 and out["n_rows"] == 5
    assert all("epochs" in r for r in out["rows"])
