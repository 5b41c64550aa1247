"""NUTS/LAU code algebra + ego-set difference + colour regrouping
(all_nuts_codes.R:26-29, load_map.R:34-63, download_maps.R:123-124,
load_corine.R:73-76, notebooks/network_distance.R:124-130)."""

import pytest

from pyspark.sql import functions as F

from hexscape_spark.codes import (nuts_ancestor, promote_lau,
                                  rollup_to_level, with_nuts_level)


def test_nuts_level_and_ancestor(spark):
    df = spark.createDataFrame(
        [("DK",), ("DK0",), ("DK01",), ("DK011",)], "code STRING")
    lv = {r.code: r.level for r in with_nuts_level(df).collect()}
    assert lv == {"DK": 0, "DK0": 1, "DK01": 2, "DK011": 3}
    anc = df.select(nuts_ancestor(F.col("code"), 1).alias("a")) \
        .where("length(code) = 5").collect()[0].a
    assert anc == "DK0"


def test_rollup_to_level(spark):
    rows = [("DK011", 10.0), ("DK012", 20.0), ("DK021", 5.0), ("SE110", 7.0)]
    df = spark.createDataFrame(rows, "code STRING, v DOUBLE")
    out = {r.code: r.sum_v
           for r in rollup_to_level(df, 2, aggs={"v": "sum"}).collect()}
    assert out == {"DK01": 30.0, "DK02": 5.0, "SE11": 7.0}
    counts = {r.code: r.n for r in rollup_to_level(df, 1).collect()}
    assert counts == {"DK0": 3, "SE1": 1}


def test_promote_lau(spark):
    nuts = spark.createDataFrame([("DK011",), ("DK012",)], "code STRING")
    lau = spark.createDataFrame([("DK011", "0101"), ("DK011", "0102")],
                                "nuts3 STRING, lau_code STRING")
    out = promote_lau(nuts, lau).collect()
    got = {(r.code, r.level) for r in out}
    assert ("DK011", 3) in got and ("DK011_0101", 4) in got
    assert len(got) == 4


def test_ego_difference_equals_exact_ring(spark):
    from hexscape_spark.graph import ego_difference, kring_cells
    cells = spark.createDataFrame([(0, 0), (3, -1)], "q LONG, r LONG")
    diff = ego_difference(cells, 2).toPandas()
    ring = kring_cells(cells, 2).where("ring = 2") \
        .select("q", "r", "nbr_q", "nbr_r").toPandas()
    key = ["q", "r", "nbr_q", "nbr_r"]
    a = diff.sort_values(key).reset_index(drop=True)
    b = ring.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # the set operator (O5) is really in the logical plan (Catalyst then
    # rewrites ExceptAll into joins — that's its job, not ours)
    assert "Except" in ego_difference(cells, 2)._jdf.queryExecution() \
        .analyzed().toString()


def test_regroup_colours_average(spark):
    from hexscape_spark.pipeline import regroup_colours
    legend = spark.createDataFrame(
        [("211", "#FF0000"), ("212", "#000000"), ("311", "#0000FF")],
        "clc STRING, colour STRING")
    out = {r.clc: r.colour for r in regroup_colours(legend, 2).collect()}
    # mean(FF, 00) = 0x80 after rounding (127.5 -> 128)
    assert out["21"] == "#800000"
    assert out["31"] == "#0000FF"
