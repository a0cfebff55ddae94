"""The declarative variable system compiled to Catalyst features —
reference parity with dedupe's field types (SURVEY.md §1.2 table)."""

import math

import pytest

from ny_campaign_finance_dedupe_spark.operators import scoring


def _feat(spark, rows, schema, spec):
    df = spark.createDataFrame(rows, schema)
    out = scoring.with_variable_features(df, spec)
    return out.collect()[0]


def test_exact_price_variables(spark):
    r = _feat(
        spark,
        [("x", "x", 100.0, 1000.0)],
        "name_a string, name_b string, amt_a double, amt_b double",
        [
            {"field": "name", "type": "Exact"},
            {"field": "amt", "type": "Price"},
        ],
    )
    assert r["name"] == 1.0
    assert r["amt"] == pytest.approx(1.0)  # |log10(100)-log10(1000)|


def test_price_nonpositive_is_zero(spark):
    r = _feat(
        spark,
        [(0.0, 10.0)],
        "amt_a double, amt_b double",
        [{"field": "amt", "type": "Price"}],
    )
    assert r["amt"] == 0.0


def test_latlong_sqrt_haversine(spark):
    # ~111.2 km per degree of latitude at the equator
    r = _feat(
        spark,
        [("0.0,0.0", "1.0,0.0")],
        "pos_a string, pos_b string",
        [{"field": "pos", "type": "LatLong"}],
    )
    assert r["pos"] == pytest.approx(math.sqrt(111.19), rel=1e-3)


def test_set_and_categorical(spark):
    r = _feat(
        spark,
        [(["a", "b"], ["b", "c"], "IND", "IND")],
        "tags_a array<string>, tags_b array<string>, typ_a string, typ_b string",
        [
            {"field": "tags", "type": "Set"},
            {"field": "typ", "type": "Categorical", "categories": ["IND", "CORP"]},
        ],
    )
    assert r["tags"] == pytest.approx(0.5)  # 1 / sqrt(2*2)
    assert r["typ"] == 1.0
    assert r["typ_is_IND"] == 1.0
    assert r["typ_is_CORP"] == 0.0


def test_missing_indicator_and_exists(spark):
    r = _feat(
        spark,
        [("x", None)],
        "name_a string, name_b string",
        [
            {"field": "name", "type": "Exact", "has missing": True},
            {"field": "name", "type": "Exists"},
        ],
    )
    assert r["name"] == 0.0
    assert r["name_missing"] == 1.0
    assert r["name_both"] == 0.0
    assert r["name_one"] == 1.0


def test_interaction_product(spark):
    r = _feat(
        spark,
        [("x", "x", "y", "y")],
        "a_a string, a_b string, b_a string, b_b string",
        [
            {"field": "a", "type": "Exact"},
            {"field": "b", "type": "Exact"},
            {"type": "Interaction", "interaction": ["a", "b"]},
        ],
    )
    assert r["a_x_b"] == 1.0


def test_string_variable_blends_cosine_and_lev(spark):
    r = _feat(
        spark,
        [("main street", "main street", "main street", "oak avenue")],
        "s1_a string, s1_b string, s2_a string, s2_b string",
        [
            {"field": "s1", "type": "String"},
            {"field": "s2", "type": "String"},
        ],
    )
    assert r["s1"] == pytest.approx(1.0)
    assert r["s2"] < 0.5
