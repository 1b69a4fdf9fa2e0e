#!/usr/bin/env python
"""Half-box constant-executor-shape strong pair (round-4 verdict ask #4).

The committed strong_exec4_cluster pairs (1 vs 4 four-core executor
JVMs) read 0.418/0.46 — attributed to a HOST artifact: the 17-core
high half occupies every physical core, so its 16 Python workers share
one memory bus that a real cluster adds per host. This variant removes
that confound: local-cluster[1,4] vs local-cluster[2,4] — the high
half uses 9 of 32 cores (2×4 executors + driver), so the memory-bus
saturation never engages and the ratio isolates what actually changes
with cluster size (cross-JVM shuffle, scheduler fan-out, stage tails).

Same admission protocol as every gate pair: quiet-window wait,
repo-process contamination check, interference monitor through both
halves, eff = t1/(2·t2), clean only if monitor-clean and eff ≤ 1.

    python tools/exec_halfbox_pair.py [n_docs] [--ledger] [--reps K]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
    else 4_000_000
REPS = int(sys.argv[sys.argv.index("--reps") + 1]) \
    if "--reps" in sys.argv else 1
LEDGER = "--ledger" in sys.argv
PAGES = f"{bench.WORK}/pages_{N_DOCS}"


def main():
    if not os.path.exists(os.path.join(PAGES, "_SUCCESS")):
        print(f"[exec2] materializing {N_DOCS} pages …", flush=True)
        spark = bench.make_session(32)
        from jivesearch_spark import corpus
        corpus.write_pages(spark, PAGES, N_DOCS, partitions=128)
        spark.stop()

    for rep in range(REPS):
        bench.wait_for_quiet(300.0)
        contam = bench.wait_for_no_contamination()
        mon = bench.InterferenceMonitor()
        try:
            # both halves run the identical plan sized for the HIGH
            # half (8 cores), per-executor shape constant (4 cores,
            # same heap/GC) — production clusters grow by adding
            # same-shape executors
            t1 = bench.one_build_cluster(1, f"{bench.WORK}/x2_low",
                                         PAGES, exec_cores=4,
                                         plan_cores=8)
            mon.mark()
            t2 = bench.one_build_cluster(2, f"{bench.WORK}/x2_high",
                                         PAGES, exec_cores=4,
                                         plan_cores=8)
        finally:
            m = mon.stop()
            shutil.rmtree(f"{bench.WORK}/x2_low", ignore_errors=True)
            shutil.rmtree(f"{bench.WORK}/x2_high", ignore_errors=True)
        eff = t1 / (2 * t2)
        clean = (bench.interference_clean(m) and not contam
                 and eff <= 1.0)
        row = {
            "date": datetime.now().strftime("%Y-%m-%d"),
            "commit": os.popen(
                f"git -C {REPO} rev-parse --short HEAD").read().strip()
            + "+",
            "protocol": "strong_exec2_halfbox",
            "n_docs": N_DOCS, "t1": round(t1, 1), "t2": round(t2, 1),
            "eff": round(eff, 3), "clean": clean,
            "contaminated": bool(contam),
            "steal_frac_a": m["steal_frac_a"],
            "steal_frac_b": m["steal_frac_b"],
            "steal_frac_sustained": m["steal_frac_sustained"],
            "foreign_mean": m["foreign_mean"],
            "foreign_sustained": m["foreign_sustained"],
            "rep": rep,
            "ts": datetime.now().strftime("%H:%M:%S"),
        }
        print(json.dumps(row), flush=True)
        if LEDGER:
            with open(os.path.join(REPO, "BENCH/pairs_ledger.jsonl"),
                      "a") as f:
                f.write(json.dumps(row) + "\n")
        if clean:
            break
        time.sleep(30)


if __name__ == "__main__":
    main()
