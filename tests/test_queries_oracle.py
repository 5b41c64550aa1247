"""Mimic the driver's correctness gate: every queries() entry that has an
oracle_sql() runs in Spark AND DuckDB at sf=0.01 and must match on row
count, column set and exact values (doubles engineered for bit parity)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR_ORACLE

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalise(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    got = _normalise(QUERIES[name](spark, SF_DIR_ORACLE).toPandas())
    con = _duck(SF_DIR_ORACLE)
    exp = _normalise(con.execute(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), \
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    # The driver hashes rendered values, so dtype drift (e.g. DuckDB HUGEINT
    # -> pandas float64 vs Spark BIGINT -> int64) IS a failure even when the
    # numbers are equal.  Oracle SQL must CAST integer SUMs to BIGINT.
    for c in got.columns:
        assert got[c].dtype == exp[c].dtype, \
            f"{name}.{c}: dtype {got[c].dtype} != oracle {exp[c].dtype}"
    for c in got.columns:
        if got[c].dtype == "float64":
            same = (got[c].values == exp[c].values) | \
                   (np.isnan(got[c].values) & np.isnan(exp[c].values))
            assert same.all(), \
                f"{name}.{c}: max abs diff {np.nanmax(np.abs(got[c].values - exp[c].values))}"
        else:
            assert (got[c].values == exp[c].values).all(), f"{name}.{c} mismatch"


def test_contract_size_and_ordering():
    """The driver records correctness rows for AT MOST 50 queries() entries
    in insertion order (CORRECTNESS_r01 truncated 52 -> 50), so the dict
    must hold <= 50 entries with every oracle-gated query first."""
    names = list(QUERIES)
    assert len(names) <= 50, len(names)
    gated = [n for n in names if n in ORACLES]
    assert names[:len(gated)] == gated, "oracle-gated queries must lead"


def test_all_queries_run(spark):
    """Queries without an oracle must still execute and return rows."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR_ORACLE)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
