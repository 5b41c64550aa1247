"""Nearest-feature / kNN joins on the hex index (SURVEY §2.3 J8/J9).

st_nearest_feature (presentation_2022/get_jutland.R:92-94) becomes a
kRing-expanding candidate equi-join: each point joins the occupied cells in
its k-disk (pure offset arithmetic — bounded candidates, optimisation R5),
then a per-point window keeps the nearest by true euclidean distance.
Never a cross join; the shuffle key is the cell id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import params as P
from . import sqlgen
from .hexgrid import kring_offsets_df


def nearest_cells(points: DataFrame, cells: DataFrame, k_ring: int = 3,
                  k_nearest: int = 1,
                  hex_width: float = P.HEX_WIDTH,
                  refx: float = P.REFX, refy: float = P.REFY,
                  point_id: str = "point_id", px: str = "lon",
                  py: str = "lat") -> DataFrame:
    """For each point, the k_nearest occupied cells within its k_ring disk.

    points: (point_id, px, py, q, r) — already hex-assigned.
    cells:  (q, r, cell_id) — the occupied-cell set.
    Output: point_id, nn_cell_id, nn_rank, dist.

    Note the candidate disk must be wide enough that the true nearest is
    inside it; k_ring >= 1 guarantees correctness whenever the point's own
    cell or a ring-1 cell is occupied (the common case for dense corpora).
    An iterative wrapper can re-run unmatched points with a larger ring.
    """
    offs = F.broadcast(kring_offsets_df(points.sparkSession, k_ring))
    cand = (points.select(point_id, px, py, "q", "r")
            .crossJoin(offs)
            .select(F.col(point_id), F.col(px), F.col(py),
                    (F.col("q") + F.col("dq")).alias("q"),
                    (F.col("r") + F.col("dr")).alias("r")))
    cx, cy = sqlgen.centroid_exprs("q", "r", hex_width, refx, refy)
    occ = cells.select("q", "r", "cell_id").distinct() \
        .selectExpr("q", "r", "cell_id", f"{cx} AS __cx", f"{cy} AS __cy")
    joined = (cand.join(occ, on=["q", "r"])
              .withColumn("dist", F.sqrt(
                  (F.col(px) - F.col("__cx")) * (F.col(px) - F.col("__cx")) +
                  (F.col(py) - F.col("__cy")) * (F.col(py) - F.col("__cy")))))
    w = Window.partitionBy(point_id).orderBy(F.asc("dist"), F.asc("cell_id"))
    return (joined.withColumn("nn_rank", F.row_number().over(w))
            .where(F.col("nn_rank") <= k_nearest)
            .select(point_id, F.col("cell_id").alias("nn_cell_id"),
                    "nn_rank", "dist"))
