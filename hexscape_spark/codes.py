"""NUTS/LAU code-table algebra (hierarchical region codes).

Reference semantics:
  * level derivation: NUTS level = nchar(code) - 2 — "DK" is level 0,
    "DK0" level 1, "DK01" level 2, "DK011" level 3
    (all_nuts_codes.R:26-29, load_map.R:34-63);
  * ancestor rollup: a code's level-k ancestor is its (2+k)-char prefix;
  * LAU promotion: LAU units bind under their NUTS-3 parent as one level
    deeper (download_maps.R:123-124).

All pure column expressions — the code table is a dimension that joins
broadcast; rollups are prefix groupBys Catalyst pushes down like any
other key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_nuts_level(df: DataFrame, code: str = "code",
                    out: str = "level") -> DataFrame:
    """NUTS level = nchar(code) - 2 (all_nuts_codes.R:26-29)."""
    return df.withColumn(out, (F.length(code) - 2).cast("int"))


def nuts_ancestor(code_col, level: int):
    """Column expr: the level-`level` ancestor code (2+level chars)."""
    return F.substring(code_col, 1, 2 + level)


def rollup_to_level(df: DataFrame, level: int, code: str = "code",
                    aggs: dict[str, str] | None = None) -> DataFrame:
    """Aggregate code-keyed measures to a NUTS level: groupBy the ancestor
    prefix (load_map.R:34-63 'codes above/below' algebra as one groupBy).

    aggs: {column: 'sum'|'count'|...}; default counts rows."""
    keyed = df.withColumn("__anc", nuts_ancestor(F.col(code), level)) \
              .where(F.length(code) >= 2 + level)
    if not aggs:
        return (keyed.groupBy(F.col("__anc").alias(code))
                .agg(F.count(F.lit(1)).alias("n")))
    exprs = [getattr(F, fn)(c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    return keyed.groupBy(F.col("__anc").alias(code)).agg(*exprs)


def promote_lau(nuts: DataFrame, lau: DataFrame, code: str = "code",
                lau_code: str = "lau_code",
                parent: str = "nuts3") -> DataFrame:
    """Bind LAU units under their NUTS-3 parents as one extra hierarchy
    level (download_maps.R:123-124): output rows carry code = the LAU id
    namespaced by its parent, level = parent level + 1."""
    n3 = with_nuts_level(nuts, code)
    lau_rows = (lau.select(
        F.concat_ws("_", F.col(parent), F.col(lau_code)).alias(code),
        (F.length(parent) - 2 + 1).cast("int").alias("level")))
    return n3.select(code, "level").unionByName(lau_rows)
