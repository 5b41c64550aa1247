"""A2: geometric union aggregate (dissolve) per group.

summarise(geometry = st_union(geometry)) (R/extract_corine.R:156,
R/load_corine.R:254,278) as a grouped-map aggregation.  The union AREA is
exact for arbitrary overlapping inputs (geo.union_area — strip-sweep
boolean area, overlap counted once); `n_parts` is the number of connected
components of the union (polygons touching or overlapping merge — the same
criterion st_union uses), computed by union-find over the pairwise
bbox-prefiltered distance==0 test.

The emitted multipolygon WKB keeps the input rings (a coverage-exact
boundary representation would need full polygon clipping; every numeric
the engine computes downstream — area, components — is overlap-aware), so
consumers must treat `geom_wkb` as the collection of source rings, while
`area`/`n_parts` are true-union values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import geo


def _component_count(polys: list[list[np.ndarray]]) -> int:
    """Connected components of the union: union-find over touch/overlap."""
    n = len(polys)
    parent = list(range(n))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    bounds = [geo.polygons_bounds([p]) for p in polys]
    for i in range(n):
        for j in range(i + 1, n):
            bi, bj = bounds[i], bounds[j]
            if bi[2] < bj[0] or bj[2] < bi[0] or bi[3] < bj[1] or bj[3] < bi[1]:
                continue                     # bbox-disjoint: cannot touch
            if geo.polygons_distance([polys[i]], [polys[j]]) == 0.0:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    return len({find(i) for i in range(n)})


def dissolve(df: DataFrame, key: str = "clc",
             geom: str = "geom_wkb") -> DataFrame:
    """groupBy(key) -> one multipolygon per key + true-union area and
    connected-part count."""
    schema = f"{key} STRING, geom_wkb BINARY, area DOUBLE, n_parts INT"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = []
        for w in pdf[geom]:
            polys.extend(geo.wkb_to_polygons(bytes(w)))
        return pd.DataFrame({
            key: [pdf[key].iloc[0]],
            "geom_wkb": [geo.multipolygon_to_wkb(polys)],
            "area": [geo.union_area(polys)],
            "n_parts": [_component_count(polys)],
        })

    return df.select(key, geom).groupBy(key).applyInPandas(merge, schema=schema)
