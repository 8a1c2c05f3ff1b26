"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The authoritative criterion — throughput scaling efficiency >= 0.8 from N to
4N executors — cannot use a real cluster in this sandbox, so per the driver
instructions it is evidenced by running the IDENTICAL CDC replay job (same
seed-stable input, same partitioning/salting config) at two local parallelism
levels in fresh JVMs and reporting throughput at both.

PRE-REGISTERED PROTOCOL (fixed before measuring; round-2 verdict required
replacing best-of-K pairing, which under 2-7x host noise overstates whichever
pair happens to align):

1. `--jvm-reps K` (default 8) fresh-JVM runs per level, each a cold
   `bench.py --replay-only` subprocess (own JVM, untimed JIT warm-up
   inside, identical seed-stable input regenerated per run). With
   `--steady` each JVM runs TWO timed replays and the SECOND is its
   sample: at the 10^10-event target a JVM applies thousands of batches,
   so first-batch JIT/page-fault cost is amortized to zero — steady state
   is the representative per-batch cost. Both replays are printed.
2. Levels STRICTLY INTERLEAVED low,high,low,high,... so slow host phases
   (CPU steal) hit both levels equally instead of whichever level ran then.
3. Per-level statistic: MEDIAN OF THE BEST 3 apply times (the best-3 floor
   discards stolen-CPU outliers; the median inside them discards the single
   lucky run best-of-K would have cherry-picked).
4. Efficiency = (R_high / R_low) / (high_cores / low_cores) computed ONLY
   from those two statistics; EVERY sample is appended to BENCH.md so the
   spread is auditable.
5. Nothing else may run on the machine during a measurement (concurrent
   Spark jobs corrupted two round-1 samples).

    python tools/bench_scaling.py [--events 500000] [--low 2] [--high 8]
                                  [--jvm-reps 8]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(master: str, events: int, epochs: int, sf_dir: str,
            content_blocks: int, steady: bool = False,
            heap_per_core_gb: int | None = None,
            verify: bool = False, zipf_s: float | None = None,
            hot_frac: float = 0.0, salt_factor: int = 2,
            task_stats: bool = False) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if heap_per_core_gb and not master.startswith("local-cluster["):
        # cluster-faithful memory model: N->4N executors brings 4x total
        # heap (each executor owns its own), so each level's single local
        # JVM gets heap proportional to its core count. A fixed total heap
        # across levels hands the LOW level 4x the heap-per-thread (fewer
        # GCs per unit of work) — an anti-scaling bias no cluster has.
        # (Executor mode needs no emulation: each executor JVM's heap is
        # fixed in the master string, identical at both levels.)
        cores = int(master.split("[")[1].rstrip("]"))
        env["SPARK_DRIVER_MEMORY"] = f"{heap_per_core_gb * cores}g"
    # one shared pre-generated event log for the WHOLE protocol: every
    # JVM at every level replays the byte-identical input (generation is
    # untimed; reuse also cuts protocol wall time ~3x at 16M events)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    tag = ""
    if zipf_s is not None:
        tag += f"_z{zipf_s}"
    if hot_frac:
        tag += f"_hot{hot_frac}"
    ev_path = os.path.join(
        shm, f"dms_scaling_ev_{events}_{content_blocks}{tag}")
    extra = []
    if verify:
        extra.append("--verify")
    if zipf_s is not None:
        extra += ["--zipf-s", str(zipf_s)]
    if hot_frac:
        extra += ["--hot-frac", str(hot_frac)]
    if salt_factor != 2:
        extra += ["--salt-factor", str(salt_factor)]
    if task_stats:
        extra.append("--task-stats")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only",
         "--master", master, "--events", str(events), "--epochs", str(epochs),
         "--content-blocks", str(content_blocks),
         "--events-path", ev_path,
         "--reps", "2" if steady else "1"]
        + extra,
        capture_output=True, text=True, env=env, cwd=REPO, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    if steady:
        # the JVM's sample is its SECOND timed replay (steady state), not
        # the best — bench.py reports all reps in order in all_apply_sec
        secs = r["cdc"]["all_apply_sec"]
        r["cdc"]["apply_sec"] = secs[-1]
        r["cdc"]["events_per_sec"] = round(events / secs[-1], 1)
        r["cdc"]["cold_apply_sec"] = secs[0]
    return r


def median_of_best3(samples_sec: list[float]) -> float:
    best3 = sorted(samples_sec)[:3]
    return statistics.median(best3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=500_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--content-blocks", type=int, default=8)
    ap.add_argument("--jvm-reps", type=int, default=8,
                    help="fresh-JVM runs per level, interleaved (protocol)")
    ap.add_argument("--heap-per-core", type=int, default=None, metavar="GB",
                    help="per-level JVM heap = GB * cores (cluster-faithful "
                         "memory scaling; default: fixed host-sized heap)")
    ap.add_argument("--steady", action="store_true",
                    help="sample = 2nd timed replay per JVM (steady state)")
    ap.add_argument("--verify", action="store_true",
                    help="timed window = apply + sha256 final-state "
                         "verification (the full north-rule metric: "
                         "events/sec TO exact sha256 state match)")
    ap.add_argument("--executors", action="store_true",
                    help="levels are EXECUTOR-JVM counts, not thread counts: "
                         "each level runs Spark local-cluster[level, "
                         "--exec-cores, --exec-mem-mb] — N separate executor "
                         "JVMs of identical fixed spec, the truest sandbox "
                         "analogue of the criterion's N vs 4N executors")
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mem-mb", type=int, default=8192)
    ap.add_argument("--zipf-s", type=float, default=None,
                    help="key-skew exponent for the generated log")
    ap.add_argument("--hot-frac", type=float, default=0.0,
                    help="fraction of events remapped to ONE merge key")
    ap.add_argument("--salt-factor", type=int, default=2,
                    help="writer fan-out (0 = per-batch auto probe)")
    ap.add_argument("--task-stats", action="store_true",
                    help="record per-task duration quantiles per level")
    args = ap.parse_args()

    samples: dict[int, list[dict]] = {args.low: [], args.high: []}
    final_rows: dict[int, set] = {args.low: set(), args.high: set()}
    for i in range(args.jvm_reps):
        for level in (args.low, args.high):  # interleaved by construction
            m = (f"local-cluster[{level},{args.exec_cores},{args.exec_mem_mb}]"
                 if args.executors else f"local[{level}]")
            r = run_one(m, args.events, args.epochs,
                        args.sf_dir, args.content_blocks, steady=args.steady,
                        heap_per_core_gb=args.heap_per_core,
                        verify=args.verify, zipf_s=args.zipf_s,
                        hot_frac=args.hot_frac,
                        salt_factor=args.salt_factor,
                        task_stats=args.task_stats)
            samples[level].append(r["cdc"])
            final_rows[level].add(r["cdc"]["final_rows"])
            print(json.dumps({"rep": i, "cores": level,
                              "apply_sec": r["cdc"]["apply_sec"],
                              "cold_apply_sec": r["cdc"].get("cold_apply_sec"),
                              "events_per_sec": r["cdc"]["events_per_sec"]}),
                  flush=True)

    stat = {lvl: median_of_best3([s["apply_sec"] for s in samples[lvl]])
            for lvl in samples}
    r_lo = args.events / stat[args.low]
    r_hi = args.events / stat[args.high]
    eff = (r_hi / r_lo) / (args.high / args.low)
    rows_match = (final_rows[args.low] == final_rows[args.high]
                  and len(final_rows[args.low]) == 1)
    lvl_name = (lambda n: f"local-cluster[{n},{args.exec_cores},"
                f"{args.exec_mem_mb}]") if args.executors else (
                lambda n: f"local[{n}]")
    result = {
        "protocol": ("interleaved fresh-JVM reps, median-of-best-3 per level"
                     + (", steady-state (2nd replay per JVM)" if args.steady
                        else "")),
        "n_events": args.events,
        "n_epochs": args.epochs,
        "jvm_reps": args.jvm_reps,
        "low_cores": args.low,
        "high_cores": args.high,
        "low_stat_sec": round(stat[args.low], 3),
        "high_stat_sec": round(stat[args.high], 3),
        "low_events_per_sec": round(r_lo, 1),
        "high_events_per_sec": round(r_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "final_rows_match": rows_match,
        "low_all_apply_sec": [s["apply_sec"] for s in samples[args.low]],
        "high_all_apply_sec": [s["apply_sec"] for s in samples[args.high]],
        "salt_factors": samples[args.high][-1].get("salt_factors"),
        "task_stats": {lvl: samples[lvl][-1].get("task_stats")
                       for lvl in samples} if args.task_stats else None,
    }
    print(json.dumps(result))

    mode = "steady " if args.steady else ""
    if args.verify:
        mode += "apply+sha256-verify "
    if args.executors:
        mode += (f"executor-JVMs x{args.exec_cores}c/"
                 f"{args.exec_mem_mb}m ")
    if args.heap_per_core:
        mode += f"heap {args.heap_per_core}g/core "
    if args.zipf_s is not None:
        mode += f"zipf-s={args.zipf_s} "
    if args.hot_frac:
        mode += f"hot-key {args.hot_frac:.0%} of events "
    if args.salt_factor != 2:
        mode += f"salt={'auto' if args.salt_factor == 0 else args.salt_factor} "
    row = (f"| {args.events:,} | {args.epochs} | {mode}{args.jvm_reps}x2 interleaved "
           f"| {lvl_name(args.low)} {r_lo:,.0f} ev/s (mob3 {stat[args.low]:.2f}s; "
           f"all {result['low_all_apply_sec']}) "
           f"| {lvl_name(args.high)} {r_hi:,.0f} ev/s (mob3 {stat[args.high]:.2f}s; "
           f"all {result['high_all_apply_sec']}) "
           f"| **{eff:.3f}** | {rows_match} |")
    bench_md = os.path.join(REPO, "BENCH.md")
    if not os.path.exists(bench_md):
        with open(bench_md, "w") as f:
            f.write(
                "# BENCH — scaling-efficiency evidence\n\n"
                "Pre-registered protocol (see tools/bench_scaling.py "
                "docstring): interleaved fresh-JVM reps, median-of-best-3 "
                "per level, ALL samples recorded; efficiency = "
                "(R_high/R_low)/(cores_high/cores_low); target >= 0.8 "
                "(BASELINE.json). `final rows match` confirms both levels "
                "reach the identical final table state.\n\n"
                "| events | epochs | reps | low level | high level "
                "| efficiency | final rows match |\n"
                "|---|---|---|---|---|---|---|\n"
            )
    if args.task_stats:
        notes = []
        for lvl in (args.low, args.high):
            ts = samples[lvl][-1].get("task_stats") or []
            ts = [t for t in ts if "task_ms_median" in t]
            if ts:
                big = ts[0]  # heaviest stage
                notes.append(
                    f"{lvl_name(lvl)} heaviest stage {big['num_tasks']} "
                    f"tasks p50 {big['task_ms_median']/1000:.1f}s max "
                    f"{big['task_ms_max']/1000:.1f}s "
                    f"(max/median {big['max_over_median']})")
        salts = samples[args.high][-1].get("salt_factors")
        if salts:
            notes.append(f"per-epoch salt fan-out {salts}")
        if notes:
            row += f" _({'; '.join(notes)})_"
    with open(bench_md, "a") as f:
        f.write(row + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
