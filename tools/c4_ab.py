#!/usr/bin/env python
"""Interleaved A/B of build variants at ONE pinned core count.

The stage attribution (tools/stage_pair.py) localizes the remaining
1->4 scaling loss to the tf+stats stage (0.61 eff at 800k docs; the
encode stage is 0.95 post-Arrow-fix). This harness compares variant
configs of that stage back-to-back in the same window — interleaved
ABAB so drift hits all variants — at a single pinned core count
(default 4, the half where the contention lives). Variants are env
knobs the library already honors plus Spark confs injected via
BENCH_EXTRA_CONFS (JSON dict), which _PINNED_AB below passes to
get_spark.

    python tools/c4_ab.py [n_docs] [--cores 4] [--reps 2] \
        --var name:ENV=V,ENV2=V2 --var name2:...
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

_PINNED_AB = '''
import sys, os, shutil, json
cores, plan_cores = int(sys.argv[1]), int(sys.argv[4])
os.sched_setaffinity(0, set(range(cores)))
os.environ["JIVESEARCH_ENCODE_PARTITIONS"] = str(3 * plan_cores)
os.environ["JIVESEARCH_STAGING_PARTITIONS"] = str(3 * plan_cores)
sys.path.insert(0, {repo!r})
mem = os.environ.get("BENCH_BUILD_MEM", "12g")
os.environ["SPARK_DRIVER_MEM"] = mem
from jivesearch_spark.session import get_spark
import bench
out, pages = sys.argv[2], sys.argv[3]
confs = {{"spark.driver.extraJavaOptions":
             f"-XX:+UseParallelGC -Xms{{mem}} -XX:+AlwaysPreTouch",
         "spark.sql.adaptive.coalescePartitions.enabled": "false"}}
confs.update(json.loads(os.environ.get("BENCH_EXTRA_CONFS", "{{}}")))
spark = get_spark(master=f"local[{{cores}}]", app_name=f"ab-c{{cores}}",
                  shuffle_partitions=2 * plan_cores, **confs)
spark.sparkContext.setLogLevel("ERROR")
def _warm(batches):
    import numpy, pandas, pyarrow                                # noqa
    from jivesearch_spark import analyze, codec, extract, index  # noqa
    return batches
spark.range(0, cores * 4, 1, cores * 4).mapInPandas(
    _warm, schema="id long").count()
shutil.rmtree(out, ignore_errors=True)
_, t = bench.build_pipeline(spark, pages, out)
print(f"BUILD_SECONDS {{t:.2f}}", flush=True)
spark.stop()
'''


def run_variant(cores: int, plan_cores: int, pages: str, out: str,
                env_kv: dict[str, str]) -> tuple[float, list[str]]:
    code = _PINNED_AB.format(repo=REPO)
    env = dict(os.environ, BENCH_STAGE_LOG="1", **env_kv)
    p = subprocess.run([sys.executable, "-c", code, str(cores), out,
                        pages, str(plan_cores)],
                       capture_output=True, text=True, timeout=3600,
                       env=env)
    secs, stages = None, []
    for raw in (p.stdout or "").splitlines():
        for ln in raw.split("\r"):
            ln = ln.strip()
            if ln.startswith("BUILD_SECONDS"):
                secs = float(ln.split()[1])
            elif ln.startswith("STAGE "):
                stages.append(ln)
    if secs is None:
        raise RuntimeError(f"variant failed:\n{p.stderr[-3000:]}")
    return secs, stages


def main() -> None:
    args = sys.argv[1:]
    n_docs = int(args[0]) if args and args[0].isdigit() else 800_000
    cores = int(args[args.index("--cores") + 1]) if "--cores" in args else 4
    reps = int(args[args.index("--reps") + 1]) if "--reps" in args else 2
    variants: list[tuple[str, dict]] = []
    for i, a in enumerate(args):
        if a == "--var":
            name, _, kvs = args[i + 1].partition(":")
            env = {}
            if kvs:
                for kv in kvs.split(","):
                    k, _, v = kv.partition("=")
                    env[k] = v
            variants.append((name, env))
    if not variants:
        variants = [("base", {})]

    pages = f"{bench.WORK}/pages_{n_docs}"
    if not os.path.exists(os.path.join(pages, "_SUCCESS")):
        print(f"materializing {n_docs} pages ...", flush=True)
        spark = bench.make_session(bench.CPUS)
        from jivesearch_spark import corpus
        corpus.write_pages(spark, pages, n_docs, partitions=bench.CPUS * 4)
        spark.stop()

    results: dict[str, list[float]] = {n: [] for n, _ in variants}
    stage_last: dict[str, list[str]] = {}
    for rep in range(reps):
        for name, env in variants:
            bench.wait_for_quiet(120)
            t, stages = run_variant(cores, 4, pages,
                                    f"{bench.WORK}/ab_{name}", env)
            results[name].append(t)
            stage_last[name] = stages
            print(f"rep{rep} {name}: {t:.1f}s", flush=True)
    print("\n=== medians ===")
    for name, ts in results.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2] if len(ts) % 2 else (
            ts[len(ts) // 2 - 1] + ts[len(ts) // 2]) / 2
        print(f"{name:24s} {med:7.1f}s  {[round(t, 1) for t in ts]}")
    print("\n=== last-rep stage lines ===")
    for name, stages in stage_last.items():
        print(f"-- {name}")
        for ln in stages:
            print("  ", ln)


if __name__ == "__main__":
    main()
