"""Raster <-> vector resampling onto the hex lattice (north-star op).

A raster is a DataFrame of (ix, iy, value) cells with an affine georeference
(origin + pixel size).  Both directions are pure column math + one hash
aggregation — no UDFs, no shuffle beyond the rollup:

  * raster -> hex:  pixel centre -> containing hex (the same cube-rounding
    encode as pages), then per-hex aggregation (mean/sum/count, optionally
    pixel-area weighted).  This is how a land-cover or climate raster rolls
    up onto the patch lattice.
  * hex -> raster:  generate the pixel grid (spark.range), assign each
    pixel centre to its hex, equi-join hex values — the rasterisation of a
    per-cell attribute for export.

Exactness contract: a pixel belongs to the hex containing its CENTRE
(standard nearest-centre resampling); both engines evaluate the identical
expressions, so the driver oracle checks it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import params as P
from . import sqlgen
from .hexgrid import _apply_layers


def raster_to_hex(raster: DataFrame, origin_x: float, origin_y: float,
                  pixel: float, value: str = "value",
                  hex_width: float = P.HEX_WIDTH,
                  refx: float = P.REFX, refy: float = P.REFY) -> DataFrame:
    """Aggregate raster pixels onto hex cells: mean/sum/count per cell."""
    px = f"{sqlgen._f(origin_x)} + (ix + {sqlgen._f(0.5)}) * {sqlgen._f(pixel)}"
    py = f"{sqlgen._f(origin_y)} + (iy + {sqlgen._f(0.5)}) * {sqlgen._f(pixel)}"
    df = raster.selectExpr("*", f"{px} AS __px", f"{py} AS __py")
    df = _apply_layers(df, sqlgen.hex_layers("__px", "__py", hex_width,
                                             refx, refy))
    return (df.groupBy("cell_id", "q", "r")
            .agg(F.count(F.lit(1)).alias("n_pixels"),
                 F.sum(value).alias(f"sum_{value}"),
                 F.avg(value).alias(f"avg_{value}")))


def hex_to_raster(cells: DataFrame, spark: SparkSession,
                  minx: float, miny: float, maxx: float, maxy: float,
                  pixel: float, value: str = "value",
                  hex_width: float = P.HEX_WIDTH,
                  refx: float = P.REFX, refy: float = P.REFY) -> DataFrame:
    """Rasterise a per-cell attribute: pixel grid -> hex assign -> join."""
    import math
    nx = int(math.ceil((maxx - minx) / pixel))
    ny = int(math.ceil((maxy - miny) / pixel))
    grid = spark.range(nx * ny).selectExpr(
        f"CAST(id % {nx} AS BIGINT) AS ix",
        f"CAST(id DIV {nx} AS BIGINT) AS iy")
    px = f"{sqlgen._f(minx)} + (ix + {sqlgen._f(0.5)}) * {sqlgen._f(pixel)}"
    py = f"{sqlgen._f(miny)} + (iy + {sqlgen._f(0.5)}) * {sqlgen._f(pixel)}"
    grid = grid.selectExpr("ix", "iy", f"{px} AS __px", f"{py} AS __py")
    grid = _apply_layers(grid, sqlgen.hex_layers("__px", "__py", hex_width,
                                                 refx, refy)) \
        .select("ix", "iy", "cell_id")
    return grid.join(cells.select("cell_id", value), "cell_id", "left")
