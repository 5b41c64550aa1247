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
    "hex_kring_counts",
    "events_hex_rollup",
    "tpch_q1",
    "revenue_by_nation",
    "top_order_per_cust",
    "dedup_exact",
    "token_stats",
    "knn_cosine",
    "minhash_pairs",
    "patches_landuse",
    "neighbours_square",
]


def main() -> None:
    from hexscape_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app="hexscape-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    queries = entrymod.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.time()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        rows[name] = df.count()
        timings[name] = round(time.time() - t0, 4)
    total = round(time.time() - t_all, 4)

    # throughput metric (BASELINE.json): pages/sec through geocode+assign+agg
    n_pages = spark.read.parquet(f"{SF_DIR}/documents.parquet").count() + \
        spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assign_sec = timings["hex_assign_docs"] + timings["events_hex_rollup"]
    pages_per_sec = round(n_pages / assign_sec, 1) if assign_sec else None
    n_cells = rows["hex_cell_counts"] if "hex_cell_counts" in rows else \
        rows.get("hex_assign_docs", 0)
    cells_per_sec = round(rows.get("hex_cell_counts", 0) /
                          timings.get("hex_cell_counts", 1), 1)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline query wall-clock (hex tiling + rollups + dedup)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "rows": rows,
        "pages_per_sec": pages_per_sec,
        "cells_per_sec": cells_per_sec,
        "cpus": int(CPUS),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
