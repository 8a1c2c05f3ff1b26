"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The authoritative criterion — throughput scaling efficiency >= 0.8 from N to
4N executors — cannot use a real cluster in this sandbox, so per the driver
instructions it is evidenced by running the IDENTICAL CDC replay job (same
seed-stable input, same partitioning/salting config) at two local parallelism
levels in fresh JVMs:

    python tools/bench_scaling.py [--events 500000] [--low 8] [--high 32]

Each run invokes `bench.py --replay-only --master local[K]` as a subprocess
(cold JVM, no shared state), parses its JSON line, and reports

    efficiency = (R_high / R_low) / (high / low)

appending a markdown row to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(master: str, events: int, epochs: int, sf_dir: str,
            content_blocks: int, reps: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
         "--master", master, "--events", str(events), "--epochs", str(epochs),
         "--content-blocks", str(content_blocks), "--reps", str(reps)],
        capture_output=True, text=True, env=env, cwd=REPO, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=500_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--content-blocks", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3,
                    help="replays per level inside one JVM; best-of-K guards "
                         "against host noise (sandbox timings swing ~2x)")
    args = ap.parse_args()

    lo = run_one(f"local[{args.low}]", args.events, args.epochs, args.sf_dir,
                 args.content_blocks, args.reps)
    hi = run_one(f"local[{args.high}]", args.events, args.epochs, args.sf_dir,
                 args.content_blocks, args.reps)
    r_lo = lo["cdc"]["events_per_sec"]
    r_hi = hi["cdc"]["events_per_sec"]
    eff = (r_hi / r_lo) / (args.high / args.low)
    result = {
        "n_events": args.events,
        "n_epochs": args.epochs,
        "low_cores": args.low,
        "high_cores": args.high,
        "low_events_per_sec": r_lo,
        "high_events_per_sec": r_hi,
        "low_apply_sec": lo["cdc"]["apply_sec"],
        "high_apply_sec": hi["cdc"]["apply_sec"],
        "scaling_efficiency": round(eff, 3),
        "final_rows_match": lo["cdc"]["final_rows"] == hi["cdc"]["final_rows"],
        "low_all_apply_sec": lo["cdc"].get("all_apply_sec"),
        "high_all_apply_sec": hi["cdc"].get("all_apply_sec"),
    }
    print(json.dumps(result))

    row = (f"| {args.events:,} | {args.epochs} | local[{args.low}] "
           f"{r_lo:,.0f} ev/s ({lo['cdc']['apply_sec']}s) | "
           f"local[{args.high}] {r_hi:,.0f} ev/s ({hi['cdc']['apply_sec']}s) | "
           f"**{eff:.3f}** | {result['final_rows_match']} |")
    bench_md = os.path.join(REPO, "BENCH.md")
    if not os.path.exists(bench_md):
        with open(bench_md, "w") as f:
            f.write(
                "# BENCH — scaling-efficiency evidence\n\n"
                "Same CDC replay (seed-stable event log, identical partitioning/"
                "salting) at two parallelism levels in fresh JVMs; efficiency = "
                "(R_high/R_low)/(cores_high/cores_low); target >= 0.8 "
                "(BASELINE.json). `final rows match` confirms both runs reach "
                "the identical final table state.\n\n"
                "| events | epochs | low run | high run | efficiency | final rows match |\n"
                "|---|---|---|---|---|---|\n"
            )
    with open(bench_md, "a") as f:
        f.write(row + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
