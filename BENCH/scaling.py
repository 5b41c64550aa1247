#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule).

Runs the IDENTICAL hex-tiling + aggregation job at two local parallelism
levels (default local[4] vs local[16], i.e. N and 4N workers) over the SAME
pre-materialised parquet input, and writes throughput at both plus the
scaling efficiency to BENCH/BASELINE.md.

Design choices that make this a faithful strong-scaling measurement:
  * the pages table is generated ONCE (untimed) and read from parquet in
    the timed region — we measure the engine (scan -> geocode -> hex assign
    -> per-cell rollup -> kRing smoothing), not the synthetic generator;
  * fresh SparkSession/JVM per level; a warmup query amortises codegen;
  * two reps per level, min taken (steady state);
  * efficiency(N->4N) = (T_N / T_4N) / 4.

Caveat recorded in the output: on one shared box, >16 active cores hit
turbo-frequency droop (pure-arithmetic codegen itself only scales ~0.7 from
8->32 here), which a multi-machine cluster does not suffer; the 4->16 pair
is the honest in-sandbox analogue of N->4N executors.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.environ.get("SPARK_GRAFT_SCALE_DATA", "/tmp/hexscape_bench_pages")

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from hexscape_spark.session import get_spark
from hexscape_spark.synth import pages
spark = get_spark(app="scaling-gen", master="local[32]", shuffle_partitions=32)
pages(spark, int(sys.argv[1]), num_partitions=128).write.mode("overwrite").parquet(sys.argv[2])
spark.stop()
"""

JOB = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from hexscape_spark.session import get_spark
from hexscape_spark import hexgrid
from pyspark.sql import functions as F

cpus, n, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark(app=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 4))

def pipeline():
    df = spark.read.parquet(path).select("page_id", "text")
    g = hexgrid.with_hex_cell(hexgrid.with_geocode(df, "page_id"))
    cells = g.groupBy("cell_id", "q", "r").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length("text")).alias("sum_chars"))
    disk = hexgrid.kring_offsets_df(spark, 2)
    smoothed = (cells.crossJoin(F.broadcast(disk))
                .select((F.col("q") + F.col("dq")).alias("q"),
                        (F.col("r") + F.col("dr")).alias("r"), "n_pages")
                .groupBy("q", "r").agg(F.sum("n_pages").alias("n_in_disk")))
    return smoothed

# warmup: compile codegen paths on a small slice
spark.read.parquet(path).limit(100000).selectExpr("sum(length(text))").collect()
pipeline().count()

best = 1e18
n_cells = 0
for rep in range(2):
    t0 = time.time()
    n_cells = pipeline().count()
    best = min(best, time.time() - t0)
print(json.dumps({{"cpus": cpus, "n_pages": n, "n_cells": n_cells,
                   "seconds": round(best, 3),
                   "pages_per_sec": round(n / best, 1)}}))
spark.stop()
"""


def run(cpus: int, n: int) -> dict:
    out = subprocess.run([sys.executable, "-c", JOB.format(repo=REPO),
                          str(cpus), str(n), DATA],
                         capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "40000000"))
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "16"))
    marker = os.path.join(DATA, "_SUCCESS")
    if not os.path.exists(marker):
        subprocess.run([sys.executable, "-c", GEN.format(repo=REPO),
                        str(n), DATA], check=True, capture_output=True)
    r_lo = run(lo, n)
    r_hi = run(hi, n)
    speedup = r_lo["seconds"] / r_hi["seconds"]
    eff = speedup / (hi / lo)
    md = f"""# BENCH/BASELINE.md — scaling evidence (north rule)

Identical job — parquet scan -> deterministic geocode -> hex-cell assign
(pure column math, zero UDFs) -> per-cell rollup -> kRing-2 smoothing join —
on the same pre-materialised {n:,}-page table at two parallelism levels,
fresh JVM each, 2 reps, min taken (stand-in for N vs 4N executors per the
driver instruction; see BASELINE.md):

| parallelism | wall (s) | pages/sec | cells |
|---|---|---|---|
| local[{lo}] | {r_lo['seconds']} | {r_lo['pages_per_sec']:,.0f} | {r_lo['n_cells']:,} |
| local[{hi}] | {r_hi['seconds']} | {r_hi['pages_per_sec']:,.0f} | {r_hi['n_cells']:,} |

speedup {lo}->{hi}: **{speedup:.2f}x** over a {hi // lo}x core increase
=> scaling efficiency **{eff:.2f}** (target >= 0.8).

Notes:
* Throughput metric (BASELINE.json): **{r_hi['pages_per_sec']:,.0f} pages/sec**
  and {r_hi['n_cells'] / r_hi['seconds']:,.0f} cells/sec at local[{hi}].
  Reference baseline (BASELINE.md): hexscape processes the Denmark CORINE
  extraction (~10^5-10^6 polygons) in ~3 minutes on one core.
* Single-box caveat: beyond 16 active cores this VM hits turbo-frequency
  droop (even pure-codegen arithmetic only scales ~0.7x-per-core 8->32),
  which independent cluster machines do not suffer; the {lo}->{hi} pair is
  the honest in-sandbox analogue of the N->4N executor comparison.
* The hex assignment itself is a map-only stage — at 10^12 rows it shards
  perfectly; the only shuffles are the two rollup groupBys.

Generated by `python BENCH/scaling.py` on {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"lo": r_lo, "hi": r_hi, "speedup": round(speedup, 3),
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
