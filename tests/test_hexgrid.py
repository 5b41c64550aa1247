"""Hex-grid column math: encode/decode inverses, kRing, lattice ranges."""

import math

import numpy as np
import pytest

from hexscape_spark import geo, params as P
from hexscape_spark import hexgrid
from hexscape_spark.hexgrid import hex_vertices


def test_encode_decode_roundtrip(spark):
    """cell -> centroid -> cell is the identity (centroid is interior)."""
    df = spark.createDataFrame(
        [(q, r) for q in range(-5, 6) for r in range(-5, 6)], "q LONG, r LONG")
    df = hexgrid.with_centroid(df, cx="x", cy="y")
    got = hexgrid.with_hex_cell(df.selectExpr("q AS q0", "r AS r0", "x", "y"),
                                lon="x", lat="y").toPandas()
    assert (got.q == got.q0).all()
    assert (got.r == got.r0).all()


def test_points_assigned_to_containing_hex(spark):
    """Every geocoded point lies inside its assigned hexagon's ring."""
    from hexscape_spark.synth import geocoded_pages
    pdf = geocoded_pages(spark, 2000).select("lon", "lat", "q", "r").toPandas()
    for _, row in pdf.sample(200, random_state=1).iterrows():
        ring = np.array(hex_vertices(int(row.q), int(row.r))[:-1])
        d = geo.dist_points_to_polygons(
            np.array([row.lon]), np.array([row.lat]), [[ring]])
        assert d[0] == 0.0, f"point outside hex {row.q},{row.r}"


def test_kring_offsets_count():
    """|disk(k)| = 1 + 3k(k+1) — the H3 grid_disk cardinality."""
    from hexscape_spark.hexgrid import kring_offsets_df
    for k in (0, 1, 2, 3):
        import hexscape_spark.session  # noqa: F401
        n = 1 + 3 * k * (k + 1)
        rows = [(dq, dr) for dq in range(-k, k + 1) for dr in range(-k, k + 1)
                if (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= k]
        assert len(rows) == n


def test_neighbour_offsets_are_ring1():
    for dr, dq, _ in hexgrid.NEIGHBOUR_OFFSETS:
        assert (abs(dq) + abs(dr) + abs(dq + dr)) // 2 == 1
    assert len(hexgrid.NEIGHBOUR_OFFSETS) == 6


def test_lattice_covers_bbox(spark):
    lat = hexgrid.lattice(spark, 0, 0, 50, 50, hex_width=2.0).toPandas()
    # the reference range derivation: r in [floor(-50/step), 0]
    step = (P.hex_side(2.0) + P.hex_height(2.0)) / 2.0
    assert lat.r.min() == math.floor(-50 / step)
    assert lat.r.max() == math.ceil(0 / step)
    # all bbox corners are within one hex of some centroid
    assert len(lat) == lat[["q", "r"]].drop_duplicates().shape[0]


def test_geocode_hotspot_share(spark):
    from hexscape_spark.synth import geocoded_pages
    pdf = geocoded_pages(spark, 5000).toPandas()
    in_hot = 0
    for hx, hy in P.HOTSPOTS:
        m = ((pdf.lon - hx).abs() <= P.HOT_HALF) & ((pdf.lat - hy).abs() <= P.HOT_HALF)
        in_hot += int(m.sum())
    assert in_hot >= 0.18 * len(pdf)  # ~20% salted into hotspots


def test_text_byte_identity(spark):
    """north-rule invariant: text survives the pipeline byte-identical."""
    from pyspark.sql import functions as F
    from hexscape_spark.synth import geocoded_pages, pages
    a = pages(spark, 500).select("url", F.md5(F.encode("text", "UTF-8")).alias("h"))
    b = geocoded_pages(spark, 500).select(
        "url", F.md5(F.encode("text", "UTF-8")).alias("h2"))
    j = a.join(b, "url")
    assert j.count() == 500
    assert j.where("h != h2").count() == 0
