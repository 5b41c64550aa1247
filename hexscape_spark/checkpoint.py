"""Checkpointing with per-partition lineage + metrics (north-rule R8).

Every pipeline stage can be materialised as a Parquet checkpoint table
keyed by (name, params, engine_version).  A manifest JSON records the
parameter fingerprint, row/byte metrics and per-partition row counts, so a
re-run resumes from the last valid checkpoint instead of recomputing — the
Spark-native equivalent of the reference's qs cache with version check
(R/load_corine.R:171-199, R/read_corine.R:39-42).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import __version__

ENGINE_VERSION = __version__


def _fingerprint(params: dict) -> str:
    blob = json.dumps(params, sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def checkpoint(df: DataFrame, root: str, name: str, params: dict | None = None,
               mode: str = "reuse") -> DataFrame:
    """Write-or-reuse a checkpoint of `df`.

    mode="reuse": if a manifest with matching fingerprint+version exists,
    read the parquet back (resume path) — otherwise compute, write, and
    record lineage.  mode="overwrite": always recompute.
    """
    params = params or {}
    fp = _fingerprint({**params, "engine_version": ENGINE_VERSION})
    path = os.path.join(root, name)
    manifest_path = os.path.join(path, "_lineage.json")
    spark = df.sparkSession

    if mode == "reuse" and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        data_path_r = os.path.join(path, "data")
        # validate the data actually backs the manifest before reusing: a
        # half-deleted checkpoint (or one from a crashed run) must fall
        # through to recompute, not fail late / read stale data
        if (manifest.get("fingerprint") == fp
                and os.path.isdir(data_path_r)
                and os.path.exists(os.path.join(data_path_r, "_SUCCESS"))):
            reused = spark.read.parquet(data_path_r)
            if reused.count() == manifest.get("rows"):
                return reused

    t0 = time.time()
    data_path = os.path.join(path, "data")
    df.write.mode("overwrite").parquet(data_path)
    out = spark.read.parquet(data_path)
    per_part = (out.withColumn("__pid", F.spark_partition_id())
                .groupBy("__pid").count().collect())
    n_rows = sum(r["count"] for r in per_part)
    n_bytes = sum(os.path.getsize(os.path.join(data_path, f))
                  for f in os.listdir(data_path) if f.endswith(".parquet"))
    manifest = {
        "name": name,
        "engine_version": ENGINE_VERSION,
        "fingerprint": fp,
        "params": {k: str(v) for k, v in params.items()},
        "rows": n_rows,
        "bytes": n_bytes,
        "partitions": {str(r["__pid"]): r["count"] for r in per_part},
        "wall_seconds": round(time.time() - t0, 3),
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(path, exist_ok=True)
    # atomic manifest publish (temp + rename): readers never observe a
    # partially-written lineage file, and the manifest only ever points at
    # fully-written data (it is created strictly after the parquet commit)
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path)
    return out


def read_manifest(root: str, name: str) -> dict | None:
    p = os.path.join(root, name, "_lineage.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
