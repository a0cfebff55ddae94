"""Automated physical-plan anti-pattern guard — PLANS.md, mechanized.

The hand-audit in PLANS.md records the scale-critical plan properties
(no cartesian products, scans pruned and filter-pushed, top-k compiled
to TakeOrderedAndProject instead of a global sort). Those are exactly
the properties a refactor can silently regress: a dropped join key
turns a hash join into a cartesian product, a stray ``select('*')``
unprunes a scan, an orderBy+limit reshuffle reappears. This suite pins
them for every driver query. Planning only — ``explainString`` never
runs a job — though a few query callables do eager work (checkpoints,
model fits) at construction; sf0.001 keeps that to seconds.
"""

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def _plan(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="module")
def plans(spark):
    """Formatted physical plan for every driver query at sf0.001."""
    out = {}
    for name, fn in entry.queries().items():
        out[name] = _plan(fn(spark, SF_DIR))
    return out


def test_no_cartesian_product_anywhere(plans):
    """A cartesian product in ANY driver query is a planning bug: every
    join in this engine is an equi-join (blocking keys, band keys,
    cluster ids) or an explicitly-bounded broadcast. At 100 TB a
    cartesian product is not slow, it is unrunnable."""
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_no_unbounded_nested_loop_join(plans):
    """BroadcastNestedLoopJoin appears only where a join genuinely has
    no equi-key AND the build side is a bounded singleton (scalar
    aggregate used as a threshold). Anything else is a regression."""
    # known-bounded: singleton scalar build sides (explicitly audited —
    # the build side is an Aggregate producing exactly 1 row):
    # predicate_costs' total-row scalar subquery; carry_forward's
    # neg_floor fresh-id floor (clustering.py: crossJoin(broadcast(
    # prev_map.agg(...))) — one row by construction); temperature_mix's
    # order-fixed sum-of-n^alpha scalar (sampling.py: counts.crossJoin(
    # broadcast(tot)) where tot is a global Aggregate — one row)
    allowed = {"predicate_costs", "carry_forward", "temperature_mix"}
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in allowed
    ]
    assert offenders == []


def test_scan_pruning_normalize_project(plans):
    """P1's parquet scan must read only the projected columns and push
    both filters down (PLANS.md 'Scans'): a scan that decodes every
    column for a 3-column projection re-reads the whole table at scale."""
    p = plans["normalize_project"]
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p
    (schema_line,) = [
        ln for ln in p.splitlines() if "ReadSchema" in ln
    ][:1]
    # struct<...> column list: the projection needs 3 columns; a few
    # struct fields of slack would still catch a select('*') regression
    ncols = schema_line.count(":")
    assert ncols <= 4, schema_line


def test_filter_pushdown_pricing_summary(plans):
    """The shipdate predicate must reach the lineitem scan, not sit in
    a post-scan Filter over all rows."""
    p = plans["pricing_summary"]
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), pushed


def test_topk_compiles_to_take_ordered(plans):
    """Top-10 reports must compile to TakeOrderedAndProject (per-
    partition heap + driver merge), never a global Sort + Limit —
    a global sort of the aggregate output is a full extra shuffle."""
    for name in ("top_entities", "biggest_clusters"):
        assert "TakeOrderedAndProject" in plans[name], name


def test_no_row_at_a_time_python_udf(plans):
    """input_hint mandates 'vectorized pandas/Arrow UDFs (no per-row
    Python) throughout'. A row-at-a-time Python UDF plans as
    BatchEvalPython (pickle per row, no Arrow batching, ~10-100x slower
    than ArrowEvalPython); one slipping into any driver query would
    silently violate the contract. Arrow-batched pandas UDFs plan as
    ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and remain
    allowed."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == []


def test_aggregates_have_partial_phase(plans):
    """The headline aggregation queries must keep map-side partial
    aggregation (two HashAggregate levels). Losing the partial phase
    (e.g. by aggregating over a non-deterministic column) ships every
    input row through the shuffle."""
    p = plans["pricing_summary"]
    assert p.count("HashAggregate") >= 2, "partial agg phase lost"
