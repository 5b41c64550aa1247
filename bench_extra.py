#!/usr/bin/env python
"""Per-query measurement harness for the optimization rounds (guide §1).

NOT the official bench (bench.py is frozen for the driver): this tool
times an arbitrary subset of declared queries with either the bench's
`.count()` action or a `noop` sink (guide §1.4 — computes every column,
isolating the computation from the action), labels jobs so SQL-tab /
event-log analysis is readable, and can dump `.explain("formatted")`
plans to files.

Usage:
  python bench_extra.py --queries lsh_topk,hex_nearest_cell --reps 3
  python bench_extra.py --all --noop
  python bench_extra.py --queries dissolve_layers --explain plans/r07 --suffix _before
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="time a noop-sink write instead of .count()")
    ap.add_argument("--explain", default="",
                    help="directory to write <query><suffix>.txt plans into")
    ap.add_argument("--suffix", default="",
                    help="filename suffix for --explain (e.g. _before)")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from hexscape_spark.session import get_spark
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    names = list(qmap) if args.all else [
        q for q in args.queries.split(",") if q]
    for q in names:
        if q not in qmap:
            raise SystemExit(f"unknown query {q!r}")

    spark = get_spark(app="hexscape-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    sc = spark.sparkContext
    if not args.no_warmup:
        qmap["hex_cell_counts"](spark, SF_DIR).count()
        spark.range(64, numPartitions=8).mapInPandas(
            lambda it: it, schema="id LONG").count()

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = qmap[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            path = os.path.join(args.explain, f"{name}{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}", file=sys.stderr)

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = qmap[name](spark, SF_DIR)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = round(time.time() - t0, 4)
            samples[name].append(dt)
            timings[name] = min(timings.get(name, 1e18), dt)
        sc.setJobDescription(None)
    print(json.dumps({"sf_dir": SF_DIR, "cpus": int(CPUS),
                      "action": "noop" if args.noop else "count",
                      "queries": timings, "samples": samples,
                      "total": round(sum(timings.values()), 4)}))
    spark.stop()


if __name__ == "__main__":
    main()
