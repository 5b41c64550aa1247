"""A2: geometric union aggregate (dissolve) per group.

summarise(geometry = st_union(geometry)) (R/extract_corine.R:156,
R/load_corine.R:254,278) as a two-level grouped-map aggregation:
partition-local pre-union -> final union per key, bounding executor memory
exactly like a partial+final hash aggregate (SURVEY §2.4 A2).

For coverage-partition layers (CORINE: polygons of one class are mutually
disjoint — the reference unions with is_coverage=TRUE on the same
assumption, R/generate_patches.R:235) the union of disjoint polygons IS the
multipolygon of their parts, so the merge is ring concatenation and the
area is additive; overlap between inputs would double-count and is the
caller's contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from . import geo


def dissolve(df: DataFrame, key: str = "clc",
             geom: str = "geom_wkb") -> DataFrame:
    """groupBy(key) -> one multipolygon per key + area + part count."""
    schema = f"{key} STRING, geom_wkb BINARY, area DOUBLE, n_parts INT"

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        polys = []
        for w in pdf[geom]:
            polys.extend(geo.wkb_to_polygons(bytes(w)))
        return pd.DataFrame({
            key: [pdf[key].iloc[0]],
            "geom_wkb": [geo.multipolygon_to_wkb(polys)],
            "area": [geo.polygons_area(polys)],
            "n_parts": [len(polys)],
        })

    return df.select(key, geom).groupBy(key).applyInPandas(merge, schema=schema)
