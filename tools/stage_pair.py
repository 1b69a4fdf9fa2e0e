#!/usr/bin/env python
"""One pinned 1->4-core scaling pair with per-stage attribution.

Runs the EXACT gate protocol (bench.one_build_pinned halves: core
affinity before the JVM spawns, identical plan sizing, 12g ParallelGC
pre-touched heap, interference monitor through both halves,
repo-process contamination check) with BENCH_STAGE_LOG=1 so each half
prints elapsed-stamped stage lines. Output: per-stage seconds at both
core counts + per-stage scaling efficiency — the attribution table
for the north rule's one hard perf gate.

    python tools/stage_pair.py [n_docs] [--ledger] [--reps K]

--ledger appends a pinned_c1_c4_interference row per pair to
BENCH/pairs_ledger.jsonl (clean flag from the monitor, same admission
rule as bench.py's in-run gate).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
    else 800_000
REPS = int(sys.argv[sys.argv.index("--reps") + 1]) \
    if "--reps" in sys.argv else 1
LEDGER = "--ledger" in sys.argv
LOW, HIGH = 1, 4
WORK = bench.WORK
PAGES = f"{WORK}/pages_{N_DOCS}"


def run_half(cores: int, out: str) -> tuple[float, list[str]]:
    code = bench._PINNED_BUILD.format(repo=REPO)
    env = dict(os.environ, BENCH_STAGE_LOG="1")
    p = subprocess.run([sys.executable, "-c", code, str(cores), out,
                        PAGES, str(HIGH)],
                       capture_output=True, text=True, timeout=3600,
                       env=env)
    secs, stages = None, []
    for raw in (p.stdout or "").splitlines():
        for ln in raw.split("\r"):  # Spark progress bars share lines
            ln = ln.strip()
            if ln.startswith("BUILD_SECONDS"):
                secs = float(ln.split()[1])
            elif ln.startswith("STAGE "):
                stages.append(ln)
    if secs is None:
        raise RuntimeError(f"half c{cores} failed:\n{p.stderr[-3000:]}")
    return secs, stages


def stage_marks(lines: list[str]) -> dict[str, float]:
    """elapsed timestamp of each stage-completion marker."""
    import re
    marks = {}
    for ln in lines:
        ts = float(ln.split("@", 1)[1].split("s", 1)[0])
        label = ln.split("s ", 1)[1].strip()
        # normalize variable parts so labels match across halves:
        # per-batch encode keys, embedded durations, and counters
        if label.startswith("[index] buckets_"):
            label = "[index] encode batch done"
        label = re.sub(r"[+ ]\d+(\.\d+)?s\b", "", label)
        label = re.sub(r"\d[\d,~]*", "N", label)
        marks[label] = ts
    return marks


def main() -> None:
    if not os.path.exists(os.path.join(PAGES, "_SUCCESS")):
        print(f"materializing {N_DOCS} pages ...", flush=True)
        spark = bench.make_session(bench.CPUS)
        from jivesearch_spark import corpus
        corpus.write_pages(spark, PAGES, N_DOCS, partitions=bench.CPUS * 4)
        spark.stop()

    for rep in range(REPS):
        bench.wait_for_quiet(float(os.environ.get("BENCH_QUIET_WAIT", "420")))
        contam = bench.wait_for_no_contamination()
        mon = bench.InterferenceMonitor()
        try:
            if rep % 2 == 0:
                tl, sl = run_half(LOW, f"{WORK}/stage_low")
                mon.mark()
                th, sh = run_half(HIGH, f"{WORK}/stage_high")
            else:
                th, sh = run_half(HIGH, f"{WORK}/stage_high")
                mon.mark()
                tl, sl = run_half(LOW, f"{WORK}/stage_low")
        finally:
            m = mon.stop()
        eff = (tl / th) / (HIGH / LOW)
        clean = bench.interference_clean(m) and not contam and eff <= 1.0

        ml, mh = stage_marks(sl), stage_marks(sh)
        print(f"\n=== rep {rep}: {N_DOCS} docs  c1={tl:.1f}s  c4={th:.1f}s  "
              f"eff={eff:.3f}  clean={clean} "
              f"(steal {m['steal_frac_a']:.2%}/{m['steal_frac_b']:.2%} "
              f"foreign {m['foreign_mean']:.3f})")
        print(f"{'stage':38s} {'c1':>8s} {'c4':>8s} {'eff':>6s}")
        prev_l = prev_h = 0.0
        for label in ml:
            if label not in mh:
                continue
            dl, dh = ml[label] - prev_l, mh[label] - prev_h
            prev_l, prev_h = ml[label], mh[label]
            e = (dl / dh) / 4 if dh > 0 else float("nan")
            print(f"{label[:38]:38s} {dl:8.1f} {dh:8.1f} {e:6.2f}")
        print(f"{'(untracked tail)':38s} {tl - prev_l:8.1f} "
              f"{th - prev_h:8.1f}")

        if LEDGER:
            row = {"date": datetime.now().strftime("%Y-%m-%d"),
                   "commit": subprocess.run(
                       ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                       capture_output=True, text=True).stdout.strip() + "+",
                   "protocol": "pinned_c1_c4_interference",
                   "n_docs": N_DOCS, "t1": round(tl, 1), "t4": round(th, 1),
                   "eff": round(eff, 3), "clean": bool(clean),
                   "contaminated": bool(contam),
                   "steal_frac_a": m["steal_frac_a"],
                   "steal_frac_b": m["steal_frac_b"],
                   "steal_frac_sustained": m["steal_frac_sustained"],
                   "foreign_mean": m["foreign_mean"],
                   "foreign_sustained": m["foreign_sustained"],
                   "rep": rep, "ts": datetime.now().strftime("%H:%M:%S")}
            with open(os.path.join(REPO, "BENCH", "pairs_ledger.jsonl"),
                      "a") as f:
                f.write(json.dumps(row) + "\n")
            print("ledger row appended")


if __name__ == "__main__":
    main()
