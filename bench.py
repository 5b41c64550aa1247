#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Also computes pages/sec + cells/sec for the hex-tiling pipeline (the
BASELINE.json metric).  Scaling-efficiency evidence across two parallelism
levels lives in BENCH/scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_QUERIES = [
    "hex_assign_docs",
    "hex_cell_counts",
    "hex_cell_lang_mode",
    "hex_neighbours",
    "hex_kring_profile",
    "hex_nearest_cell",
    "events_hex_rollup",
    "salted_cell_counts",
    "tpch_q1",
    "revenue_by_nation",
    "top_order_per_cust",
    "dedup_exact",
    "token_stats",
    "lang_dist_by_source",
    "knn_cosine",
    "minhash_pairs",
    "ngram_jaccard",
    "lsh_topk",
    "patches_landuse",
    "neighbours_square",
    "cover_landuse",
    "dissolve_layers",
]

# In-JVM repetitions per query (min taken).  r2 flagged a +0.1-0.4 s drift
# on nine sub-second queries vs r1; running the suite twice in one JVM
# shows pass 2 systematically faster and stable -> the drift is JIT/
# suite-position noise, and min-of-2 reports the steady-state number
# (pass totals are still emitted so the warmup cost stays visible).
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


# r3 post-mortem: the BASELINE.json metric swung 7.43M -> 5.13M pages/sec on
# identical code because the timed job ran <1 s (min-of-2) on a box whose
# background load swings 2-5x.  Fix (VERDICT r03 #1): size the job to run
# >= 10 s, take min over >= 3 reps, and gate/record the 1-min load average so
# a noisy measurement is visible in the JSON rather than silently recorded.
THROUGHPUT_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "150000000"))
THROUGHPUT_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_TREPS", "3"))
LOAD_LIMIT = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_LIMIT", "2.0"))
LOAD_WAIT_MAX_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "180"))


def _cpu_jiffies() -> tuple[int, int]:
    """(busy, steal) jiffies across all CPUs from ONE /proc/stat read —
    busy = user+nice+system+irq+softirq+steal (everything except
    idle/iowait).  Steal is reported separately too (r6): it sits
    inside the external-cores number (busy-not-ours) but its remedy
    differs — guest noise can be killed, host contention only waited
    out — so a host-noisy run is distinguishable from a guest-noisy
    one.  Kernels exposing fewer fields simply report 0 steal."""
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return sum(v[:3]) + sum(v[5:8]), (v[7] if len(v) > 7 else 0)


def _self_tree_jiffies() -> int:
    """utime+stime+cutime+cstime summed over this process and every live
    descendant (the Spark JVM and its Python workers).  cutime/cstime
    fold in reaped children, so workers dying between samples still
    count as OURS, not as external load."""
    import os

    ppid_of: dict[int, int] = {}
    jiff: dict[int, int] = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                rest = f.read().rsplit(")", 1)[1].split()
        except OSError:
            continue
        ppid_of[int(d)] = int(rest[1])
        jiff[int(d)] = sum(int(rest[i]) for i in (11, 12, 13, 14))
    mine = {os.getpid()}
    grew = True
    while grew:
        grew = False
        for pid, pp in ppid_of.items():
            if pp in mine and pid not in mine:
                mine.add(pid)
                grew = True
    return sum(jiff.get(p, 0) for p in mine)


class _PassLoadMeter:
    """Per-pass EXTERNAL load (VERDICT r04 #3): the r4 start-only gate
    missed mid-run spikes, and a between-pass loadavg check would mostly
    read our own JVM's decaying 1-min average.  Instead, each pass
    measures total busy CPU minus our own process subtree — external
    cores occupied while the pass ran — so a regressed per-query number
    is attributable to box noise rather than code."""

    def start(self) -> None:
        self.t0 = time.time()
        self.tot0, self.steal0 = _cpu_jiffies()
        self.own0 = _self_tree_jiffies()
        self.steal_cores = 0.0

    def stop(self) -> float:
        dt = max(time.time() - self.t0, 1e-9)
        hz = os.sysconf("SC_CLK_TCK")
        # one cpu-line read for busy AND steal, BEFORE the /proc tree
        # walk, so both deltas cover the same window (r6 review)
        tot1, steal1 = _cpu_jiffies()
        ext = (tot1 - self.tot0) - (_self_tree_jiffies() - self.own0)
        self.steal_cores = max(0.0, (steal1 - self.steal0) / (dt * hz))
        return max(0.0, ext / (dt * hz))


def _wait_for_quiet_box() -> dict:
    """Block (bounded) until the 1-min load average drops under LOAD_LIMIT.

    Called BEFORE the engine does any work, so the reading reflects
    EXTERNAL load, not our own JVM.  Returns what it saw either way — a
    reader of BENCH_rN.json can tell whether the number was taken on a
    quiet box."""
    waited = 0
    load = os.getloadavg()[0]
    while load > LOAD_LIMIT and waited < LOAD_WAIT_MAX_SEC:
        time.sleep(15)
        waited += 15
        load = os.getloadavg()[0]
    return {"load_1min_at_start": round(load, 2),
            "load_wait_sec": waited,
            "load_ok": load <= LOAD_LIMIT}


def _throughput(spark) -> dict:
    """BASELINE.json metric: hex-tile assignment + aggregation throughput on
    a real multi-hundred-million-row pages table (pre-materialised, read
    untimed).  The timed job runs ~10 s+ so a single descheduled task can
    no longer move the headline number by 2x."""
    from pyspark.sql import functions as F
    from hexscape_spark import hexgrid
    from hexscape_spark.synth import pages

    path = f"/tmp/hexscape_bench_pages_{THROUGHPUT_PAGES}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        pages(spark, THROUGHPUT_PAGES, num_partitions=128) \
            .write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).select("page_id", "text")

    def job():
        g = hexgrid.with_hex_cell(hexgrid.with_geocode(df, "page_id"))
        return (g.groupBy("cell_id", "q", "r")
                .agg(F.count(F.lit(1)).alias("n_pages"),
                     F.sum(F.length("text")).alias("sum_chars")))

    job().count()                       # warmup (codegen + parquet footers)
    best = 1e18
    reps = []
    ext_cores = []
    steal_cores = []
    n_cells = 0
    meter = _PassLoadMeter()
    for _ in range(max(3, THROUGHPUT_REPS)):
        meter.start()
        t0 = time.time()
        n_cells = job().count()
        dt = time.time() - t0
        ext_cores.append(round(meter.stop(), 2))
        steal_cores.append(round(meter.steal_cores, 2))
        reps.append(round(dt, 3))
        best = min(best, dt)
    return {"pages_per_sec": round(THROUGHPUT_PAGES / best, 1),
            "cells_per_sec": round(n_cells / best, 1),
            "throughput_pages": THROUGHPUT_PAGES,
            "throughput_sec": round(best, 3),
            "throughput_reps_sec": reps,
            "throughput_external_cores": ext_cores,
            "throughput_steal_cores": steal_cores,
            "load_1min_after_throughput": round(os.getloadavg()[0], 2)}


def main() -> None:
    from hexscape_spark.session import get_spark
    import __spark_entry__ as entrymod

    # external-load gate BEFORE any of our own work touches the CPUs
    load_info = _wait_for_quiet_box()

    spark = get_spark(app="hexscape-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    queries = entrymod.queries()
    # untimed warmup: JVM/codegen + parquet footers + Python/Arrow workers
    # (otherwise the first pandas-UDF query pays worker spawn alone)
    queries["hex_cell_counts"](spark, SF_DIR).count()
    spark.range(64, numPartitions=8).mapInPandas(
        lambda it: it, schema="id LONG").count()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    pass_totals: list[float] = []
    pass_external_cores: list[float] = []
    pass_steal_cores: list[float] = []
    meter = _PassLoadMeter()
    # up to 2 extra passes if a pass ran against external load, so the
    # min-of-passes number usually includes at least one clean pass
    max_passes = max(1, REPS) + 2
    done = 0
    while done < max(1, REPS) or (
            done < max_passes
            and all(x > LOAD_LIMIT for x in pass_external_cores)):
        meter.start()
        t_all = time.time()
        for name in BENCH_QUERIES:
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            rows[name] = df.count()
            dt = round(time.time() - t0, 4)
            timings[name] = min(timings.get(name, 1e18), dt)
        pass_totals.append(round(time.time() - t_all, 4))
        pass_external_cores.append(round(meter.stop(), 2))
        pass_steal_cores.append(round(meter.steal_cores, 2))
        done += 1
    total = round(sum(timings.values()), 4)
    thr = _throughput(spark)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline query wall-clock (hex tiling + rollups + dedup)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "rows": rows,
        "cpus": int(CPUS),
        "reps": max(1, REPS),
        "timing": "per-query min over reps in one JVM",
        "pass_totals": pass_totals,
        "pass_external_cores": pass_external_cores,
        "pass_steal_cores": pass_steal_cores,
        "pass_load_ok": [x <= LOAD_LIMIT for x in pass_external_cores],
        **load_info,
        **thr,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
