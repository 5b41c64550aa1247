"""Physical-plan shape assertions — the scale contract, enforced.

Correct results that shuffle wastefully would still fail at 100 TB; these
tests pin the plan properties the engine's design promises (SURVEY §4):
column pruning reaches the scan, small dimensions broadcast, hex math stays
map-only, and kRing joins are equi-joins, never nested loops.
"""

import pytest

import __spark_entry__ as m

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hex_assign_is_map_only(spark):
    """Geocode + cube-rounding must compile to a single scan->project plan:
    no Exchange, no Python (BatchEvalPython/ArrowEval), no UDFs."""
    df = m.queries()["hex_assign_docs"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan
    assert "Scan parquet" in plan


def test_cell_counts_single_shuffle(spark):
    """One hash aggregation: exactly one Exchange (partial+final agg)."""
    df = m.queries()["hex_cell_counts"](spark, SF)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "HashAggregate" in plan


def test_column_pruning_reaches_scan(spark):
    """token_stats reads only doc_id + text from the documents parquet."""
    df = m.queries()["token_stats"](spark, SF)
    plan = _plan(df)
    scan_line = [ln for ln in plan.splitlines() if "Scan parquet" in ln
                 or "ReadSchema" in ln]
    txt = "\n".join(scan_line) or plan
    assert "doc_id" in txt and "text" in txt
    assert "lang" not in txt and "source" not in txt, txt


def test_predicate_pushdown_reaches_scan(spark):
    """tpch_q1's shipdate filter appears as a pushed parquet filter."""
    df = m.queries()["tpch_q1"](spark, SF)
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan


def test_dimension_joins_broadcast(spark):
    """revenue_by_nation: customer + nation joins are broadcast hash joins
    (no shuffle of the big fact side for dimensions)."""
    df = m.queries()["revenue_by_nation"](spark, SF)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_kring_join_is_equi_not_nested_loop(spark):
    """The kRing disk aggregation must never be a nested-loop theta join."""
    df = m.queries()["hex_kring_counts"](spark, SF)
    plan = _plan(df)
    # the 19-row offsets VALUES cross join is the only acceptable
    # nested-loop; the cells-to-cells join must be hash-based
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_neighbours_join_is_equi(spark):
    df = m.queries()["hex_neighbours"](spark, SF)
    plan = _plan(df)
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan


def test_whole_stage_codegen_covers_hex_math(spark):
    """The assign expressions live inside WholeStageCodegen spans."""
    df = m.queries()["hex_assign_docs"](spark, SF)
    plan = _plan(df)
    # the `*(N)` operator prefix marks whole-stage-codegen spans
    assert plan.lstrip().startswith("*("), plan[:200]
