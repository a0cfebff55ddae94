"""C4 cleaning filters (textstats.c4_clean; Raffel et al. 2020 §2.2)."""

import pyspark.sql.functions as F

from ny_campaign_finance_dedupe_spark.functions import textstats


def _clean(spark, rows):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r["record_id"]: r
        for r in textstats.c4_clean(df, "doc_id", "text").collect()
    }


GOOD = "this line has enough words here."


def test_line_filters_branch_coverage(spark):
    out = _clean(
        spark,
        [
            # kept: 3 good lines => 3 sentences => keep_doc
            (1, "\n".join([GOOD, GOOD, GOOD])),
            # no terminal punctuation => all lines dropped
            (2, "this line has enough words here"),
            # fewer than 5 words
            (3, "too few words here."),
            # javascript mention, case-insensitive
            (4, "Enable JavaScript to view this content."),
        ],
    )
    assert out[1]["n_kept"] == 3 and out[1]["keep_doc"]
    assert out[1]["clean_text"] == "\n".join([GOOD, GOOD, GOOD])
    for i in (2, 3, 4):
        assert out[i]["n_kept"] == 0 and not out[i]["keep_doc"]


def test_doc_gates(spark):
    three = "\n".join([GOOD, GOOD, GOOD])
    out = _clean(
        spark,
        [
            (1, three + "\nsome Lorem Ipsum filler text appears."),
            (2, three + "\nvar x = { a: 1 };"),
            (3, three + "\nthis mentions porn explicitly in text."),
            # only 2 sentences
            (4, "\n".join([GOOD, GOOD])),
            (5, three),
        ],
    )
    assert not out[1]["keep_doc"]  # lorem ipsum phrase
    assert not out[2]["keep_doc"]  # curly brace
    assert not out[3]["keep_doc"]  # blocklist word (word-bounded)
    assert not out[4]["keep_doc"]  # < 3 sentences
    assert out[5]["keep_doc"]


def test_bad_word_requires_word_boundary(spark):
    three = "\n".join([GOOD, GOOD, GOOD])
    out = _clean(spark, [(1, three + "\nxxxy is not the blocked token.")])
    assert out[1]["keep_doc"]  # 'xxx' inside 'xxxy' must not match


def test_null_text(spark):
    out = _clean(spark, [(1, None)])
    assert out[1]["clean_text"] == ""
    assert out[1]["n_kept"] == 0 and not out[1]["keep_doc"]


def test_zero_shuffle_plan(spark):
    """The whole operator must evaluate inside the scan projection: any
    Exchange would shuffle the corpus for a per-row computation."""
    df = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    out = textstats.c4_clean(df, "doc_id", "text")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
