"""A2: geometric union aggregate (dissolve) per group — two-level.

summarise(geometry = st_union(geometry)) (R/extract_corine.R:156,
R/load_corine.R:254,278) with the distributed shape SURVEY §2.4 A2
prescribes: partition-local pre-union -> final merge, so one CLC class
with 10^7 features never lands in a single task with the raw inputs —
level 1 collapses each (key, salt) slice to its exact union boundary
(typically a tiny fraction of the input vertices), and level 2 unions the
partial boundaries.

The emitted `geom_wkb` is now the TRUE dissolved boundary
(geo.union_polygons: exact trapezoid-sweep boundary trace — every vertex
an input vertex, a segment crossing, or an exact evaluation at an event
x), closing the r2 gap where consumers clipping/plotting the dissolved
geometry inherited source-ring overlaps.  `area` is the exact union area
(overlap counted once) and `n_parts` the number of touch/overlap-connected
components (the st_union merge criterion, crossing-aware per ADVICE r02).

If boundary tracing ever fails on degenerate input (UnionTraceError — the
trace self-validates against the trapezoid-sum area), the group falls back
to the r2 representation: source rings as geometry with area/n_parts still
exact via the independent strip-sweep kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import geo


def _union_or_fallback(polys: list[list[np.ndarray]]
                       ) -> tuple[list[list[np.ndarray]], int, float, bool]:
    """(union pieces, n_components, exact area, traced?) for one group."""
    comps = geo.overlap_components(polys)
    pieces: list[list[np.ndarray]] = []
    area = 0.0
    traced = True
    for comp in comps:
        sub = [polys[i] for i in comp]
        try:
            merged = geo.union_component(sub)
            pieces.extend(merged)
            area += geo.polygons_area(merged)
        except geo.UnionTraceError:
            pieces.extend(sub)                      # fallback: source rings
            area += geo.union_area(sub)             # area stays exact
            traced = False
    return pieces, len(comps), area, traced


def dissolve(df: DataFrame, key: str = "clc", geom: str = "geom_wkb",
             num_salts: int = 32,
             simplify_keep: float | None = None) -> DataFrame:
    """groupBy(key) -> true-union multipolygon + exact union area and
    connected-part count, computed in two levels:

      level 1: groupBy(key, salt) pre-union per slice (salt =
               xxhash64(geometry) % num_salts — deterministic, spreads a
               hot key over num_salts tasks);
      level 2: groupBy(key) union of the partial boundaries.

    Both levels run geo.union_polygons; n_parts at level 2 counts the
    global components (partials from different slices merge when they
    touch/overlap across slice boundaries).

    `simplify_keep` optionally DP-simplifies the final dissolved boundary
    to that kept-vertex ratio (the reference's ms_simplify-after-st_union
    flow, R/extract_corine.R:156,273); `area`/`n_parts` stay the EXACT
    pre-simplification values (the numbers downstream rollups need), and
    only `geom_wkb` is reduced.
    """
    l1_schema = f"{key} STRING, geom_wkb BINARY"

    def pre_union(pdf: pd.DataFrame) -> pd.DataFrame:
        polys: list[list[np.ndarray]] = []
        for w in pdf[geom]:
            polys.extend(geo.wkb_to_polygons(bytes(w)))
        pieces, _, _, _ = _union_or_fallback(polys)
        return pd.DataFrame({
            key: [pdf[key].iloc[0]],
            "geom_wkb": [geo.multipolygon_to_wkb(pieces)],
        })

    salted = df.select(key, geom).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(geom)), F.lit(num_salts)))
    partial = salted.groupBy(key, "__salt").applyInPandas(
        pre_union, schema=l1_schema)

    out_schema = f"{key} STRING, geom_wkb BINARY, area DOUBLE, n_parts INT"

    def final_union(pdf: pd.DataFrame) -> pd.DataFrame:
        polys: list[list[np.ndarray]] = []
        for w in pdf["geom_wkb"]:
            polys.extend(geo.wkb_to_polygons(bytes(w)))
        pieces, n_comps, area, _ = _union_or_fallback(polys)
        if simplify_keep is not None:
            pieces = geo.simplify_polygons_keep(pieces, simplify_keep)
        return pd.DataFrame({
            key: [pdf[key].iloc[0]],
            "geom_wkb": [geo.multipolygon_to_wkb(pieces)],
            "area": [area],
            "n_parts": [n_comps],
        })

    return partial.groupBy(key).applyInPandas(final_union, schema=out_schema)
