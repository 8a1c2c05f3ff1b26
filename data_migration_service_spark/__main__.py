"""CLI — the reference's REST surface as `python -m data_migration_service_spark`.

The reference exposes its pipeline over REST (readMe.md:51-61,
controller/DataMigrationController.java); a Spark engine exposes the same
verbs as a CLI driven by one JSON config file, the analogue of
application.properties + DBConfigReader.java:14-36:

    {
      "tables": {
        "repos": {
          "table_path":      "/lake/repos",
          "source":          "/data/changes/repos",
          "checkpoint_path": "/lake/_ckpt/repos",
          "n_buckets":       16384,
          "merge_mode":      "mor",
          "key_cols":        ["repo", "path"]
        }
      }
    }

Verb mapping (reference -> CLI):

    POST /jobs                    -> jobs run --config c.json
    POST /jobs/{t}                -> jobs run --config c.json --table t
    GET  /jobs[/{t}]              -> jobs status [--table t] [--detail]
    POST /data/verification[/{t}] -> verify --expected <parquet> [--table t]
                                     (--sample N: 1/N key-sample canary)
    (engine-added)                -> repair --expected <parquet> [--dry-run]
                                     [--since-snapshot N] (anti-entropy:
                                     verify + minimal fix in one pass;
                                     exit 1 unless converged/clean)
    POST /data/cleanup[/{t}]      -> cleanup [--table t]
    (engine-added)                -> maintain [--apply] [--table t]
    (engine-added)                -> fsck [--table t] [--deep]
                                     (metadata-vs-storage audit; exit 1 if
                                     any table is broken)
    (engine-added)                -> erase --table t --keys <parquet>
                                     (compliance erase; exit 1 unless
                                     residual_rows == 0)
    (engine-added)                -> merge --table t --source <parquet>
                                     --spec <json> (conditional MERGE INTO)
    (engine-added)                -> tag create|list|drop (pin corpus states)
    (engine-added)                -> index create|sync|find (secondary
                                     value->key indexes, changefeed-synced)
    POST /jobs/migrateSpecificRecords -> replay-keys --keys <parquet>
    (engine-added)                -> changes --from-snapshot N [--out p]
                                     (changefeed export, the CDC-out side)
    (engine-added)                -> sql -q "..." [--catalog-root r]
    (engine-added)                -> blame --keys <parquet> (per-row epoch
                                     provenance from the lineage store)

Every command prints ONE JSON document to stdout (the REST body analogue)
and exits 0/1. Table creation is on demand (`jobs run` creates missing
targets from the source's resolved schema via --schema-json or the default
code-repo schema).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import types as T

from data_migration_service_spark.api import Engine, EngineGroup
from data_migration_service_spark.config import EngineConfig
from data_migration_service_spark.registry import SchemaRegistry
from data_migration_service_spark.session import get_spark
from data_migration_service_spark.tables.lake import SnapshotTable

DEFAULT_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("lsn", T.LongType(), False),
    ]
)

_CFG_KEYS = {
    "table_path", "key_cols", "lsn_col", "op_col", "n_buckets",
    "salt_factor", "checkpoint_path", "mismatch_report_cap", "merge_mode",
    "compact_threshold", "quarantine_path", "skip_limit",
    "commit_retries", "writer_id",
}


def load_config(path: str) -> dict[str, dict]:
    with open(path) as f:
        raw = json.load(f)
    tables = raw.get("tables")
    if not tables:
        raise SystemExit(f"config {path}: no 'tables' section")
    return tables


def engine_config(name: str, entry: dict) -> EngineConfig:
    kw = {k: v for k, v in entry.items() if k in _CFG_KEYS}
    if "table_path" not in kw:
        raise SystemExit(f"table '{name}': table_path is required")
    if "key_cols" in kw:
        kw["key_cols"] = tuple(kw["key_cols"])
    return EngineConfig(**kw)


def _schema_for(entry: dict) -> T.StructType:
    if "schema_json" in entry:
        with open(entry["schema_json"]) as f:
            return T.StructType.fromJson(json.load(f))
    return DEFAULT_SCHEMA


def _registry_for(entry: dict) -> SchemaRegistry | None:
    if "registry" in entry:
        return SchemaRegistry.load(entry["registry"])
    return None


def _engines(spark, tables: dict[str, dict], only: str | None,
             create: bool = False) -> dict[str, Engine]:
    if only is not None:
        if only not in tables:
            raise SystemExit(f"unknown table '{only}' "
                             f"(configured: {sorted(tables)})")
        tables = {only: tables[only]}
    out = {}
    for name, entry in tables.items():
        cfg = engine_config(name, entry)
        if create and not SnapshotTable.exists(cfg.table_path):
            SnapshotTable.create(spark, cfg.table_path, _schema_for(entry),
                                 list(cfg.key_cols), cfg.n_buckets,
                                 lsn_col=cfg.lsn_col)
        out[name] = Engine(spark, cfg, registry=_registry_for(entry))
    return out


def cmd_jobs_run(args) -> int:
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table, create=True)
    group = EngineGroup.from_engines(spark, engines)
    sources = {n: tables[n].get("source") for n in engines}
    result = group.replay_all(sources, streaming=not args.batch)
    print(json.dumps(result, default=str))
    bad = [n for n, r in result.items() if r.get("status") == "FAILED"]
    return 1 if bad else 0


def cmd_jobs_status(args) -> int:
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    print(json.dumps(
        {n: e.status(detail=args.detail) for n, e in engines.items()},
        default=str))
    return 0


def cmd_verify(args) -> int:
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    out, ok = {}, True
    for name, eng in engines.items():
        exp_path = args.expected or tables[name].get("expected")
        if not exp_path:
            out[name] = {"status": "NO_EXPECTATION"}
            ok = False
            continue
        res = eng.verify(spark.read.parquet(exp_path),
                         content_col=args.content_col,
                         sample_denominator=args.sample)
        out[name] = {
            "status": "CONSISTENT" if res.consistent else "INCONSISTENT",
            **({"sampled": res.extra} if args.sample else {}),
            "source_rows": res.source_rows,
            "target_rows": res.target_rows,
            "n_mismatch": res.n_mismatch,
            "n_missing_in_target": res.n_missing_in_target,
            "n_missing_in_source": res.n_missing_in_source,
            "report": res.report,
            "more": res.more,
        }
        ok = ok and res.consistent
    print(json.dumps(out, default=str))
    return 0 if ok else 1


def cmd_repair(args) -> int:
    """Verification-driven anti-entropy (Engine.repair): diff each table
    against its source-of-truth parquet and apply the minimal fix batch —
    or just report it with --dry-run. Exit 1 if any table still diverges
    after the repair (or would change under --dry-run)."""
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    out, ok = {}, True
    for name, eng in engines.items():
        exp_path = args.expected or tables[name].get("expected")
        if not exp_path:
            out[name] = {"status": "NO_EXPECTATION"}
            ok = False
            continue
        rep = eng.repair(spark.read.parquet(exp_path), dry_run=args.dry_run,
                         since_snapshot=args.since_snapshot)
        if args.dry_run:
            rep["status"] = ("CLEAN" if rep["n_upserts"] + rep["n_deletes"]
                             == 0 else "WOULD_REPAIR")
            ok = ok and rep["status"] == "CLEAN"
        else:
            rep["status"] = ("CONVERGED"
                             if rep.get("residual_bad_keys", 0) == 0
                             else "RESIDUAL_DIVERGENCE")
            ok = ok and rep["status"] == "CONVERGED"
        out[name] = rep
    print(json.dumps(out, default=str))
    return 0 if ok else 1


def cmd_cleanup(args) -> int:
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    print(json.dumps({n: e.cleanup() for n, e in engines.items()}))
    return 0


def cmd_maintain(args) -> int:
    """Metadata-only health report per table; --apply acts on it (compact
    flagged buckets, expire old snapshots). The advisor never runs a Spark
    job, so `maintain` without --apply is safe on any schedule."""
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    out = {}
    for name, eng in engines.items():
        plan = eng.maintenance_plan(keep_snapshots=args.keep_snapshots,
                                    compact_at=args.compact_at)
        actions = {}
        if args.apply:
            if plan["compact"]["buckets"]:
                from data_migration_service_spark.operators.merge import compact

                actions["compact_snapshot"] = compact(
                    eng.table, eng.cfg, buckets=plan["compact"]["buckets"])
                actions["compacted_buckets"] = plan["compact"]["buckets"]
            actions["expired"] = eng.expire_snapshots(
                keep_last=args.keep_snapshots)
        out[name] = {"plan": plan, "actions": actions}
    print(json.dumps(out, default=str))
    return 0


def cmd_optimize(args) -> int:
    """Rewrite base files under the current layout rules (OPTIMIZE /
    rewrite_data_files — re-cluster after a write_sort change, fold
    deltas, re-roll file sizes). `--set-prop k=v` commits layout props
    first, so `optimize --set-prop write_sort=zorder:a,b` is the Delta
    `OPTIMIZE ZORDER BY (a, b)` one-liner."""
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    out = {}
    for name, eng in engines.items():
        for kv in args.set_prop or []:
            k, _, v = kv.partition("=")
            if not _:
                print(json.dumps({"error": f"bad --set-prop {kv!r}"}))
                return 1
            eng.table.set_props(**{k: v})
        sid = eng.optimize(buckets=args.buckets or None)
        out[name] = {"snapshot_id": sid}
    print(json.dumps(out, default=str))
    return 0


def cmd_fsck(args) -> int:
    """Metadata-vs-storage consistency audit per table (manifest chain,
    HEAD, refs, referenced dirs/buckets present) — directory listings only,
    no data decode. Exit 1 if any table is broken."""
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    out = {n: e.fsck(deep=args.deep) for n, e in engines.items()}
    print(json.dumps(out, default=str))
    return 0 if all(r["ok"] for r in out.values()) else 1


def cmd_erase(args) -> int:
    """Compliance erase (GDPR right-to-be-forgotten) for one table: hard
    delete + history expiry + sub-dir purge + residual-rows verification
    (Engine.erase_keys). `--keys` is a parquet path whose columns include
    the table's merge key. Exits 1 if any residual row survives."""
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    if args.table is None:
        raise SystemExit("erase requires --table (one table per erase)")
    eng = engines[args.table]
    keys = spark.read.parquet(args.keys)
    report = eng.erase_keys(keys)
    print(json.dumps(report, default=str))
    return 0 if report.get("residual_rows", 1) == 0 else 1


def cmd_merge(args) -> int:
    """Ad-hoc conditional MERGE (Delta MERGE INTO analogue): --source is a
    parquet path, --spec a JSON file {"matched": [{"action": "update"|
    "delete", "condition": <SQL over t./s.>, "set": {col: expr}}, ...],
    "not_matched": {"condition": ..., "values": {...}}, "epoch": n,
    "lsn": n}. Runs under the table's job lock (can't race a replay)."""
    import dataclasses

    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    if args.table is None:
        raise SystemExit("merge requires --table (one table per merge)")
    engines = _engines(spark, tables, args.table)
    eng = engines[args.table]
    with open(args.spec) as f:
        spec = json.load(f)
    src = spark.read.parquet(args.source)
    st = eng.merge(src, matched=spec.get("matched", ()),
                   not_matched=spec.get("not_matched"),
                   not_matched_by_source=spec.get("not_matched_by_source",
                                                  ()),
                   epoch=spec.get("epoch"), lsn=spec.get("lsn"))
    print(json.dumps({"table": args.table, **dataclasses.asdict(st)},
                     default=str))
    return 0


def cmd_tag_create(args) -> int:
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    print(json.dumps({n: e.tag(args.name, epoch=args.epoch)
                      for n, e in engines.items()}))
    return 0


def cmd_tag_list(args) -> int:
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    print(json.dumps({n: e.table.tags() for n, e in engines.items()}))
    return 0


def cmd_tag_drop(args) -> int:
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    for e in engines.values():
        e.table.drop_tag(args.name)
    print(json.dumps({"dropped": args.name, "tables": sorted(engines)}))
    return 0


def cmd_index_create(args) -> int:
    from data_migration_service_spark.tables.index import SecondaryIndex

    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    (name, eng), = engines.items()
    ix = SecondaryIndex.create(spark, args.path, eng.table, args.column,
                               n_buckets=args.n_buckets)
    st = ix.sync(eng.table)
    print(json.dumps({"table": name, "column": args.column,
                      "path": args.path, **st}))
    return 0


def cmd_index_sync(args) -> int:
    from data_migration_service_spark.tables.index import SecondaryIndex

    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    (name, eng), = engines.items()
    ix = SecondaryIndex.open(spark, args.path)
    st = ix.sync(eng.table)
    if args.compact:
        ix.compact()
    print(json.dumps({"table": name, "path": args.path,
                      "compacted": bool(args.compact), **st}))
    return 0


def cmd_index_find(args) -> int:
    from data_migration_service_spark.tables.index import SecondaryIndex

    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    (name, eng), = engines.items()
    ix = SecondaryIndex.open(spark, args.path)
    rows = ix.lookup(eng, args.value).limit(args.limit).collect()
    print(json.dumps({"table": name, "values": args.value,
                      "rows": [r.asDict(recursive=True) for r in rows]},
                     default=str))
    return 0


def _one_engine(engines: dict) -> tuple | None:
    """Derived verbs operate on exactly one source table; anything else is
    a usage error reported through the JSON {"error": ...} + exit-1
    contract every other verb follows (not a bare unpack traceback)."""
    if len(engines) != 1:
        print(json.dumps({
            "error": f"derived verbs need exactly one source table; "
                     f"--table matched {len(engines)} "
                     f"({sorted(engines) or 'none'}) — pass --table <name>"}))
        return None
    return next(iter(engines.items()))


def cmd_derived_create(args) -> int:
    from data_migration_service_spark.tables.derived import DerivedTable

    # argument validation BEFORE starting Spark: a usage error should not
    # cost a JVM spin-up
    if bool(args.sql) == bool(args.sql_file):
        print(json.dumps({"error": "give exactly one of --sql / --sql-file"}))
        return 1
    sql = (open(args.sql_file).read() if args.sql_file else args.sql)
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    picked = _one_engine(_engines(spark, tables, args.table))
    if picked is None:
        return 1
    name, eng = picked
    d = DerivedTable.create(spark, args.path, eng.table, sql,
                            seq_col=args.seq_col, n_buckets=args.n_buckets)
    st = d.sync(eng.table)
    print(json.dumps({"table": name, "path": args.path, **st}))
    return 0


def cmd_derived_sync(args) -> int:
    from data_migration_service_spark.tables.derived import DerivedTable

    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    picked = _one_engine(_engines(spark, tables, args.table))
    if picked is None:
        return 1
    name, eng = picked
    d = DerivedTable(spark, args.path)
    st = d.sync(eng.table)
    if args.compact:
        d.compact()
    print(json.dumps({"table": name, "path": args.path,
                      "compacted": bool(args.compact), **st}))
    return 0


def cmd_replay_keys(args) -> int:
    """Targeted re-replay (reference POST /jobs/migrateSpecificRecords,
    DataMigrationService.java:312-342): re-apply only the events whose
    merge key appears in --keys, from --source (or the table's configured
    source). Semi-join, bucket-pruned — never a table scan."""
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    picked = _one_engine(_engines(spark, tables, args.table))
    if picked is None:
        return 1
    name, eng = picked
    src = args.source or tables[name].get("source")
    if not src:
        print(json.dumps({"error": f"table '{name}' has no source; "
                                   f"pass --source <parquet>"}))
        return 1
    events = spark.read.parquet(src)
    keys = spark.read.parquet(args.keys)
    stats = eng.replay_keys(events, keys, epoch=args.epoch)
    print(json.dumps({
        "table": name, "epoch": stats.epoch, "skipped": stats.skipped,
        "rows_in_batch": stats.rows_in_batch,
        "rows_matched": stats.rows_matched,
        "rows_inserted": stats.rows_inserted,
        "rows_deleted": stats.rows_deleted,
        "snapshot_id": stats.snapshot_id,
    }, default=str))
    return 0


def _emit_rows(df, args, base: dict) -> int:
    """Shared result shaping for row-returning verbs: --out writes the
    full result as parquet (the scale path — rows never land on the
    driver); otherwise up to --limit rows are inlined in the JSON doc."""
    if getattr(args, "out", None):
        df.write.mode("overwrite").parquet(args.out)
        # count the WRITTEN files, not the plan: re-executing df would run
        # the full query a second time and could disagree with the output
        # under a nondeterministic plan
        n = df.sparkSession.read.parquet(args.out).count()
        print(json.dumps({**base, "out": args.out,
                          "rows_written": n}, default=str))
        return 0
    rows = df.limit(args.limit).collect()
    print(json.dumps({**base, "n_rows": len(rows), "limit": args.limit,
                      "rows": [r.asDict(recursive=True) for r in rows]},
                     default=str))
    return 0


def cmd_changes(args) -> int:
    """Changefeed export: ordered change rows between two snapshots
    (operators/changefeed.table_changes) — the engine's CDC-out surface.
    --out writes parquet (downstream consumers tail it); without --out a
    --limit sample is inlined."""
    from data_migration_service_spark.operators.changefeed import (
        table_changes,
    )

    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    picked = _one_engine(_engines(spark, tables, args.table))
    if picked is None:
        return 1
    name, eng = picked
    to_sid = (args.to_snapshot if args.to_snapshot is not None
              else eng.table.current().snapshot_id)
    ch = table_changes(eng.table, args.from_snapshot, to_sid,
                       include_old=args.include_old)
    return _emit_rows(ch, args, {
        "table": name, "from_snapshot": args.from_snapshot,
        "to_snapshot": to_sid})


def cmd_sql(args) -> int:
    """Ad-hoc SQL over the table group (EngineGroup.sql): every configured
    table is a view under its name; --catalog-root pins reads to the last
    sealed cross-table transaction."""
    if bool(args.query) == bool(args.sql_file):
        print(json.dumps({"error": "give exactly one of --query / "
                                   "--sql-file"}))
        return 1
    q = (open(args.sql_file).read() if args.sql_file else args.query)
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    engines = _engines(spark, tables, args.table)
    group = EngineGroup.from_engines(spark, engines)
    df = group.sql(q, catalog_root=args.catalog_root)
    return _emit_rows(df, args, {"tables": sorted(engines)})


def cmd_blame(args) -> int:
    """Row provenance (Engine.blame): which replay epoch(s) wrote each
    key's current version, from the lineage store's per-epoch per-bucket
    LSN intervals. Requires checkpoint_path in the table config."""
    tables = load_config(args.config)
    spark = get_spark(app_name="dms-cli")
    picked = _one_engine(_engines(spark, tables, args.table))
    if picked is None:
        return 1
    name, eng = picked
    if not eng.cfg.checkpoint_path:
        print(json.dumps({"error": f"table '{name}' has no "
                                   f"checkpoint_path; blame needs the "
                                   f"lineage store"}))
        return 1
    keys = spark.read.parquet(args.keys)
    df = eng.blame(keys, last_epochs=args.last_epochs)
    return _emit_rows(df, args, {"table": name})


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m data_migration_service_spark")
    ap.add_argument("--config", required=True,
                    help="JSON config: {'tables': {name: {...}}}")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("jobs", help="run or inspect replay jobs")
    jsub = p.add_subparsers(dest="jobs_cmd", required=True)
    run = jsub.add_parser("run")
    run.add_argument("--table", default=None)
    run.add_argument("--batch", action="store_true",
                     help="batch replay instead of streaming availableNow")
    run.set_defaults(fn=cmd_jobs_run)
    st = jsub.add_parser("status")
    st.add_argument("--table", default=None)
    st.add_argument("--detail", action="store_true")
    st.set_defaults(fn=cmd_jobs_status)

    v = sub.add_parser("verify")
    v.add_argument("--table", default=None)
    v.add_argument("--expected", default=None,
                   help="parquet of expected final state "
                        "(default: per-table 'expected' in the config)")
    v.add_argument("--content-col", default="content")
    v.add_argument("--sample", type=int, default=None, metavar="N",
                   help="verify a deterministic 1/N key-sample (the cheap "
                        "every-epoch canary; salt rotates with the epoch)")
    v.set_defaults(fn=cmd_verify)

    rp = sub.add_parser("repair",
                        help="diff vs source of truth, apply minimal fix")
    rp.add_argument("--table", default=None)
    rp.add_argument("--expected", default=None,
                    help="parquet of expected state "
                         "(default: per-table 'expected' in the config)")
    rp.add_argument("--dry-run", action="store_true",
                    help="report the planned fix without writing")
    rp.add_argument("--since-snapshot", type=int, default=None,
                    help="incremental mode: diff only buckets changed "
                         "since this clean snapshot")
    rp.set_defaults(fn=cmd_repair)

    tg = sub.add_parser("tag", help="pin/list/drop named snapshot refs")
    tsub = tg.add_subparsers(dest="tag_cmd", required=True)
    tc = tsub.add_parser("create")
    tc.add_argument("name")
    tc.add_argument("--table", default=None)
    tc.add_argument("--epoch", type=int, default=None,
                    help="pin a past epoch's final snapshot (default: HEAD)")
    tc.set_defaults(fn=cmd_tag_create)
    tl = tsub.add_parser("list")
    tl.add_argument("--table", default=None)
    tl.set_defaults(fn=cmd_tag_list)
    td = tsub.add_parser("drop")
    td.add_argument("name")
    td.add_argument("--table", default=None)
    td.set_defaults(fn=cmd_tag_drop)

    ix = sub.add_parser("index", help="secondary (value->key) indexes")
    ixsub = ix.add_subparsers(dest="index_cmd", required=True)
    ic = ixsub.add_parser("create")
    ic.add_argument("--table", required=True)
    ic.add_argument("--column", required=True)
    ic.add_argument("--path", required=True)
    ic.add_argument("--n-buckets", type=int, default=16)
    ic.set_defaults(fn=cmd_index_create)
    isy = ixsub.add_parser("sync")
    isy.add_argument("--table", required=True)
    isy.add_argument("--path", required=True)
    isy.add_argument("--compact", action="store_true",
                     help="fold to value-sorted base after sync "
                          "(read fast path)")
    isy.set_defaults(fn=cmd_index_sync)
    dv = sub.add_parser("derived",
                        help="incrementally-maintained derived tables "
                             "(row-local SQL transforms)")
    dvsub = dv.add_subparsers(dest="derived_cmd", required=True)
    dc = dvsub.add_parser("create")
    dc.add_argument("--table", default=None,
                    help="source table (optional when exactly one is "
                         "configured)")
    dc.add_argument("--path", required=True)
    dc.add_argument("--sql", default=None,
                    help="transform SQL over __source__")
    dc.add_argument("--sql-file", default=None)
    dc.add_argument("--seq-col", default="seq")
    dc.add_argument("--n-buckets", type=int, default=None,
                    help="default: inherit the source's bucket count "
                         "(keeps the derived table co-located)")
    dc.set_defaults(fn=cmd_derived_create)
    ds = dvsub.add_parser("sync")
    ds.add_argument("--table", default=None,
                    help="source table (optional when exactly one is "
                         "configured)")
    ds.add_argument("--path", required=True)
    ds.add_argument("--compact", action="store_true")
    ds.set_defaults(fn=cmd_derived_sync)

    ifd = ixsub.add_parser("find")
    ifd.add_argument("--table", required=True)
    ifd.add_argument("--path", required=True)
    ifd.add_argument("--value", action="append", required=True)
    ifd.add_argument("--limit", type=int, default=100)
    ifd.set_defaults(fn=cmd_index_find)

    rk = sub.add_parser("replay-keys",
                        help="re-apply events for specific merge keys "
                             "(migrateSpecificRecords)")
    rk.add_argument("--table", default=None)
    rk.add_argument("--keys", required=True,
                    help="parquet of merge-key rows")
    rk.add_argument("--source", default=None,
                    help="events parquet (default: table's configured "
                         "source)")
    rk.add_argument("--epoch", type=int, default=None)
    rk.set_defaults(fn=cmd_replay_keys)

    cf = sub.add_parser("changes",
                        help="export the changefeed between two snapshots")
    cf.add_argument("--table", default=None)
    cf.add_argument("--from-snapshot", type=int, required=True)
    cf.add_argument("--to-snapshot", type=int, default=None,
                    help="default: HEAD")
    cf.add_argument("--include-old", action="store_true",
                    help="carry before-image old_<col> columns")
    cf.add_argument("--out", default=None,
                    help="write full result parquet here (scale path)")
    cf.add_argument("--limit", type=int, default=100)
    cf.set_defaults(fn=cmd_changes)

    sq = sub.add_parser("sql", help="SQL over the table group")
    sq.add_argument("--table", default=None,
                    help="restrict the registered views to one table")
    sq.add_argument("--query", "-q", default=None)
    sq.add_argument("--sql-file", default=None)
    sq.add_argument("--catalog-root", default=None,
                    help="pin reads to the last sealed cross-table txn")
    sq.add_argument("--out", default=None)
    sq.add_argument("--limit", type=int, default=100)
    sq.set_defaults(fn=cmd_sql)

    bl = sub.add_parser("blame", help="per-row epoch provenance")
    bl.add_argument("--table", default=None)
    bl.add_argument("--keys", required=True,
                    help="parquet of merge-key rows")
    bl.add_argument("--last-epochs", type=int, default=10_000)
    bl.add_argument("--out", default=None)
    bl.add_argument("--limit", type=int, default=100)
    bl.set_defaults(fn=cmd_blame)

    c = sub.add_parser("cleanup")
    c.add_argument("--table", default=None)
    c.set_defaults(fn=cmd_cleanup)

    op = sub.add_parser("optimize",
                        help="rewrite base files under current layout "
                             "rules (re-cluster / fold deltas)")
    op.add_argument("--table", default=None)
    op.add_argument("--buckets", type=int, nargs="*", default=None)
    op.add_argument("--set-prop", action="append", default=None,
                    metavar="K=V",
                    help="commit layout props first (e.g. "
                         "write_sort=zorder:a,b)")
    op.set_defaults(fn=cmd_optimize)

    mt = sub.add_parser("maintain",
                        help="metadata-only health report; --apply acts")
    mt.add_argument("--table", default=None)
    mt.add_argument("--apply", action="store_true",
                    help="compact flagged buckets and expire old snapshots")
    mt.add_argument("--keep-snapshots", type=int, default=2)
    mt.add_argument("--compact-at", type=int, default=4,
                    help="flag buckets whose MOR delta depth >= this")
    mt.set_defaults(fn=cmd_maintain)

    fs = sub.add_parser("fsck",
                        help="metadata-vs-storage consistency audit")
    fs.add_argument("--table", default=None)
    fs.add_argument("--deep", action="store_true",
                    help="also cross-check _stats.json sidecars against "
                         "parquet footer row counts")
    fs.set_defaults(fn=cmd_fsck)

    mg = sub.add_parser("merge",
                        help="ad-hoc conditional MERGE (Delta MERGE INTO "
                             "analogue) from a parquet source + JSON spec")
    mg.add_argument("--table", required=True)
    mg.add_argument("--source", required=True,
                    help="parquet path of the merge source")
    mg.add_argument("--spec", required=True,
                    help="JSON file with matched / not_matched clauses")
    mg.set_defaults(fn=cmd_merge)

    er = sub.add_parser("erase",
                        help="compliance erase: hard delete + history "
                             "purge + no-trace verification")
    er.add_argument("--table", required=True)
    er.add_argument("--keys", required=True,
                    help="parquet path carrying the merge-key columns")
    er.set_defaults(fn=cmd_erase)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
