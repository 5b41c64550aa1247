"""Axial hex-grid core — pure column math, zero UDFs, zero shuffles.

DataFrame-API surface over the shared SQL fragments in ``sqlgen`` (single
source of truth with the DuckDB oracle).  Everything here stays inside
whole-stage codegen; the point->cell encode of a 10^12-row table is a
map-only stage with no shuffle.

Reference parity:
  * hex constants            -> R/generate_patches.R:45-50
  * axial lattice & centroid -> R/generate_patches.R:89-115
  * kRing / ego rings        -> notebooks/network_distance.R:93-133
  * 6 axial neighbour offsets-> R/generate_neighbours.R:57-62
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import params as P
from . import sqlgen


def _apply_layers(df: DataFrame, layers) -> DataFrame:
    for layer in layers:
        df = df.selectExpr("*", *[f"{expr} AS {alias}" for alias, expr in layer])
    return df


def with_geocode(df: DataFrame, key: str) -> DataFrame:
    """Add deterministic (lon, lat) derived from integer column `key`."""
    return _apply_layers(df, sqlgen.geocode_layers(key))


def with_hex_cell(df: DataFrame, lon: str = "lon", lat: str = "lat",
                  hex_width: float = P.HEX_WIDTH,
                  refx: float = P.REFX, refy: float = P.REFY,
                  drop_tmp: bool = True) -> DataFrame:
    """Assign each point to its containing hexagon: adds q, r, cell_id."""
    out = _apply_layers(df, sqlgen.hex_layers(lon, lat, hex_width, refx, refy))
    if drop_tmp:
        out = out.drop("rf", "qf", "sf", "qg", "rg", "sg", "dq", "dr", "ds")
    return out


def with_centroid(df: DataFrame, q: str = "q", r: str = "r",
                  hex_width: float = P.HEX_WIDTH,
                  refx: float = P.REFX, refy: float = P.REFY,
                  cx: str = "hex_cx", cy: str = "hex_cy") -> DataFrame:
    ex, ey = sqlgen.centroid_exprs(q, r, hex_width, refx, refy)
    return df.selectExpr("*", f"{ex} AS {cx}", f"{ey} AS {cy}")


# The six axial neighbour offsets, in the reference's enumeration order
# (expand_grid(r_adj,q_adj) row-major minus self and |r+q|==2:
#  R/generate_neighbours.R:57-62), with the compass direction implied by the
# centroid delta (R/generate_neighbours.R:149-157) — exact because hex
# centroids are a pure function of (q, r).
NEIGHBOUR_OFFSETS = [
    # (dr, dq, direction)
    (-1, 0, "NW"),
    (-1, 1, "NE"),
    (0, -1, "W"),
    (0, 1, "E"),
    (1, -1, "SW"),
    (1, 0, "SE"),
]


def offsets_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(dr, dq, d) for dr, dq, d in NEIGHBOUR_OFFSETS],
        "dr INT, dq INT, direction STRING")


def kring_offsets_df(spark: SparkSession, k: int) -> DataFrame:
    """All (dq, dr) with hex distance <= k, incl. (0,0) — the H3 grid_disk."""
    rows = []
    for dq in range(-k, k + 1):
        for dr in range(-k, k + 1):
            if (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= k:
                rows.append((dq, dr))
    return spark.createDataFrame(rows, "dq INT, dr INT")


def with_hex_distance(df: DataFrame, q1: str, r1: str, q2: str, r2: str,
                      out: str = "hex_dist") -> DataFrame:
    return df.selectExpr("*", f"{sqlgen.hex_distance_expr(q1, r1, q2, r2)} AS {out}")


def hex_vertices(q: int, r: int, hex_width: float = P.HEX_WIDTH,
                 refx: float = P.REFX, refy: float = P.REFY):
    """Driver-side 7-vertex ring of hexagon (q, r).

    Exactly genpoly (reference: R/generate_patches.R:53-64): vertices at
    (0,+h/2),(+w/2,+s/2),(+w/2,-s/2),(0,-h/2),(-w/2,-s/2),(-w/2,+s/2),(0,+h/2)
    translated to the cell centroid.
    """
    h = P.hex_height(hex_width)
    s = P.hex_side(hex_width)
    cx = refx + r * hex_width / 2.0 + q * hex_width
    cy = refy - r * (s + h) / 2.0
    pts = [(0.0, h / 2), (hex_width / 2, s / 2), (hex_width / 2, -s / 2),
           (0.0, -h / 2), (-hex_width / 2, -s / 2), (-hex_width / 2, s / 2),
           (0.0, h / 2)]
    return [(cx + x, cy + y) for x, y in pts]


def lattice(spark: SparkSession, minx: float, miny: float, maxx: float,
            maxy: float, hex_width: float = P.HEX_WIDTH,
            refx: float = P.REFX, refy: float = P.REFY,
            num_partitions: int | None = None) -> DataFrame:
    """Distributed hex lattice covering a bbox: DataFrame(q, r, hex_cx, hex_cy).

    Range derivation mirrors R/generate_patches.R:89-101 exactly:
      r in [floor((refy-ymax)/step) .. ceil((refy-ymin)/step)], step=(s+h)/2
      q from the 30-degree-sheared x-range over hex_width.
    Generated with spark.range -> divmod, so a country- or planet-scale
    lattice never materialises on the driver.
    """
    import math
    h = P.hex_height(hex_width)
    s = P.hex_side(hex_width)
    step = (s + h) / 2.0
    r_lo = math.floor((refy - maxy) / step)
    r_hi = math.ceil((refy - miny) / step)
    tan30 = math.tan(math.pi / 6.0)
    x_lo = (minx + (miny - refy) * tan30 - refx) / hex_width
    x_hi = (maxx + (maxy - refy) * tan30 - refx) / hex_width
    q_lo = math.floor(x_lo)
    q_hi = math.ceil(x_hi)
    nr = r_hi - r_lo + 1
    nq = q_hi - q_lo + 1
    if num_partitions is None:
        # ~256 cells per task (r7, guide §2.5): the old 4096-cell target
        # put the fixture-scale lattice's entire clip stage in ONE Python
        # task; per-task worker overhead is ~10-30 ms, far below the
        # serial-clip cost it was avoiding.  Planet-scale lattices still
        # fan out fully (capped at the session parallelism either way).
        num_partitions = max(1, min(spark.sparkContext.defaultParallelism,
                                    (nr * nq) // 256 + 1))
    rng = spark.range(0, nr * nq, 1, num_partitions)
    df = rng.selectExpr(
        f"CAST(id % {nq} + {q_lo} AS BIGINT) AS q",
        f"CAST(CAST(id / {nq} AS BIGINT) + {r_lo} AS BIGINT) AS r",
    )
    ex, ey = sqlgen.centroid_exprs("q", "r", hex_width, refx, refy)
    return df.selectExpr("q", "r", f"{ex} AS hex_cx", f"{ey} AS hex_cy",
                         f"{sqlgen.cell_id_expr('q', 'r')} AS cell_id")
