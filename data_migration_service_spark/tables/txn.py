"""Cross-table group commit — multi-table transactions over snapshot tables.

A CDC source transaction often touches SEVERAL tables (an order row and its
line items; a document and its embedding). Per-table exactly-once makes each
table individually correct, but readers can still observe table A with the
transaction applied and table B without it. The reference side-steps this by
migrating tables independently (DataMigrationService.java:298-310 — each
table its own job); a lake-side CDC engine should do better, and Iceberg's
REST-catalog multi-table transactions are the shape to borrow.

Protocol (write-ahead intent over per-table write-audit-publish):

1. STAGE — the caller applies each table's batch with `publish=False`
   (`cdc_apply(..., publish=False)`): data files land, manifests commit
   STAGED, every table's readers still see the pre-transaction state. While
   a table holds a staged snapshot, its main commits are blocked (the WAP
   single-lineage rule) — exactly the lock the group needs, acquired
   per-table with no global coordination.
2. INTENT — `group_commit` writes one `txn-%08d.json` intent file
   (create-if-absent = the atomic commit point of the WHOLE transaction)
   listing every (table root, staged snapshot id).
3. PUBLISH — each table's HEAD flips (atomic per table, idempotent:
   re-publishing an already-published id is a no-op).
4. SEAL — the intent is rewritten with status "committed" (os.replace).

Crash anywhere after step 2 is completed by `recover()`: a pending intent
is re-driven through step 3 (idempotent) and sealed. Crash BEFORE step 2
means no intent exists — the staged snapshots are orphans and the normal
WAP discard path reclaims them; no table published anything. The intent
file is therefore the transaction's all-or-nothing point, with per-table
visibility converging to it.

Readers that need cross-table consistency do not race HEADs at all:
`consistent_snapshots()` returns the (table -> snapshot id) map of the
LAST SEALED transaction — pin reads with `read(snapshot=...)` and the view
is transactionally consistent no matter how far individual HEADs have
moved since.

The catalog dir's primitives are the same two the table commit uses
(create-if-absent, atomic replace); on an object store they map to
conditional PUT — the `tables/metastore.py` boundary note applies verbatim.
"""

from __future__ import annotations

import json
import os
from typing import Any

from data_migration_service_spark.tables.lake import SnapshotTable


def _intent_path(catalog_root: str, k: int) -> str:
    return os.path.join(catalog_root, f"txn-{k:08d}.json")


def _list_txns(catalog_root: str) -> list[int]:
    if not os.path.isdir(catalog_root):
        return []
    out = []
    for f in os.listdir(catalog_root):
        if f.startswith("txn-") and f.endswith(".json"):
            out.append(int(f[4:-5]))
    return sorted(out)


def _read_intent(catalog_root: str, k: int) -> dict[str, Any]:
    with open(_intent_path(catalog_root, k)) as f:
        return json.load(f)


def _seal(catalog_root: str, intent: dict[str, Any]) -> None:
    intent["status"] = "committed"
    p = _intent_path(catalog_root, intent["txn"])
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(intent, f)
    os.replace(tmp, p)


def _publish_all(intent: dict[str, Any],
                 tables: dict[str, SnapshotTable]) -> None:
    for name, pin in intent["pins"].items():
        tables[name].publish(int(pin["sid"]))  # idempotent per table


def group_commit(catalog_root: str,
                 staged: dict[str, tuple[SnapshotTable, int]]) -> int:
    """Atomically publish one staged snapshot per table as ONE transaction.

    `staged` maps table name -> (table, staged snapshot id) — produced by
    `cdc_apply(..., publish=False).snapshot_id` per table. Returns the
    transaction id. The create-if-absent intent write is the commit point;
    everything after it is completed by `recover()` if this process dies.
    """
    os.makedirs(catalog_root, exist_ok=True)
    for name, (t, sid) in staged.items():
        if sid not in t.staged_snapshots():
            raise ValueError(
                f"table {name!r}: snapshot {sid} is not staged "
                f"(staged: {t.staged_snapshots()})")
    ks = _list_txns(catalog_root)
    # ids must clear both the live intents and any ids already folded into
    # the base by prune_txns (a reused id would resurrect a pruned txn)
    k = max((ks[-1] + 1) if ks else 0, _read_base(catalog_root)["through"] + 1)
    intent = {
        "txn": k,
        "status": "pending",
        "pins": {name: {"root": t.root, "sid": sid}
                 for name, (t, sid) in staged.items()},
    }
    # create-if-absent: two racing group committers elect one winner per id
    # (the loser retries with the next id)
    while True:
        try:
            with open(_intent_path(catalog_root, k), "x") as f:
                json.dump(intent, f)
            break
        except FileExistsError:
            k += 1
            intent["txn"] = k
    _publish_all(intent, {n: t for n, (t, _) in staged.items()})
    _seal(catalog_root, intent)
    return k


def recover(catalog_root: str,
            tables: dict[str, SnapshotTable]) -> list[int]:
    """Complete every pending intent (crash between intent and seal):
    re-publish each pin (idempotent) and seal. Returns the txn ids
    completed. A pin whose table is not in `tables` raises — recovery must
    see the whole group."""
    done = []
    for k in _list_txns(catalog_root):
        intent = _read_intent(catalog_root, k)
        if intent.get("status") == "committed":
            continue
        missing = [n for n in intent["pins"] if n not in tables]
        if missing:
            raise ValueError(f"txn {k}: no table handle for {missing}")
        _publish_all(intent, tables)
        _seal(catalog_root, intent)
        done.append(k)
    return done


_BASE = "pins.json"


def _read_base(catalog_root: str) -> dict[str, Any]:
    p = os.path.join(catalog_root, _BASE)
    if not os.path.exists(p):
        return {"pins": {}, "through": -1}
    with open(p) as f:
        return json.load(f)


def consistent_snapshots(catalog_root: str) -> dict[str, int]:
    """(table name -> snapshot id) of the LAST SEALED transaction — the
    cross-table-consistent read pin. Tables absent from that transaction
    keep their pin from the latest earlier sealed transaction that named
    them (a transaction only moves the tables it touched). Reads the
    folded base (`pins.json`, see `prune_txns`) plus the unpruned intent
    tail — O(tail), not O(all transactions ever)."""
    base = _read_base(catalog_root)
    pins: dict[str, int] = {k: int(v) for k, v in base["pins"].items()}
    for k in _list_txns(catalog_root):
        if k <= base["through"]:
            continue
        intent = _read_intent(catalog_root, k)
        if intent.get("status") != "committed":
            continue
        for name, pin in intent["pins"].items():
            pins[name] = int(pin["sid"])
    return pins


def prune_txns(catalog_root: str, keep_last: int = 16) -> int:
    """Fold sealed intents older than the newest `keep_last` into the
    base pins file and delete them — the catalog stays O(keep_last) no
    matter how many transactions ever committed (at one transaction per
    micro-batch the intent dir would otherwise grow forever). Pending
    intents are NEVER pruned (recover() still needs them), and a pending
    intent blocks folding past it (seal order is pin order). Returns the
    number of intents folded. Atomic: the base is os.replace'd after the
    fold, and a crash between fold and deletes only leaves already-folded
    intents behind for the next prune."""
    base = _read_base(catalog_root)
    ks = [k for k in _list_txns(catalog_root) if k > base["through"]]
    if len(ks) <= keep_last:
        return 0
    foldable: list[int] = []
    for k in ks[:-keep_last] if keep_last else ks:
        if _read_intent(catalog_root, k).get("status") != "committed":
            break  # never fold past a pending intent
        foldable.append(k)
    if not foldable:
        return 0
    for k in foldable:
        for name, pin in _read_intent(catalog_root, k)["pins"].items():
            base["pins"][name] = int(pin["sid"])
    base["through"] = foldable[-1]
    p = os.path.join(catalog_root, _BASE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(base, f)
    os.replace(tmp, p)
    for k in foldable:
        os.remove(_intent_path(catalog_root, k))
    return len(foldable)
