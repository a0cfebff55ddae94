"""Sources & sinks beyond the checkpoint store (SURVEY.md §2.1).

- S2 fixed-schema CSV read: headerless CSV with an explicit column list
  and non-UTF8 encodings (reference: data_load/all_txt_to_csv.py:12-42,
  fix_all_reports.py:16-60 — NYSBOE dumps are latin-1).
- S6 CSV snapshot export (campaign_finance_dedupe.py:361-367).
- S7 model/settings artifact: the reference pickles (data_model,
  classifier, predicates) (dedupe/api.py:1069-1086). Here the artifact
  is plain JSON — weights, bias, predicate names, pipeline params —
  loadable anywhere, broadcast at use; never executable code.
- S8 training-pairs file: JSON with `match`/`distinct` record-pair
  lists (dedupe/api.py:1051-1067, serializer.py:1-30) -> a labeled-pairs
  DataFrame (label 1/0).
"""

from __future__ import annotations

import codecs
import json
from pathlib import Path

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


def read_fixed_csv(
    spark: SparkSession,
    path: str,
    columns: list[str] | list[tuple[str, str]],
    encoding: str = "utf-8",
    delimiter: str = ",",
) -> DataFrame:
    """S2: headerless CSV with caller-supplied schema.

    ``columns`` is a list of names (all string-typed, like the raw BOE
    load) or (name, sparkType) tuples.
    """
    # Spark's CSVOptions takes canonical charset names only.
    # python-style `unicode_escape` (the reference's all_txt_to_csv.py
    # dump format: ASCII bytes carrying \uXXXX / \xNN escapes) is not a
    # JVM charset — read the ASCII-compatible bytes as UTF-8, then
    # decode the escapes per string column (Arrow-batched, cold path).
    unescape = encoding.lower() == "unicode_escape"
    encoding = {"latin-1": "iso-8859-1", "latin1": "iso-8859-1",
                "unicode_escape": "utf-8"}.get(encoding.lower(), encoding)
    fields = [
        T.StructField(c, T.StringType(), True)
        if isinstance(c, str)
        else T.StructField(c[0], getattr(T, c[1])(), True)
        for c in columns
    ]
    df = (
        spark.read.schema(T.StructType(fields))
        .option("header", "false")
        .option("encoding", encoding)
        .option("sep", delimiter)
        .csv(path)
    )
    if unescape:
        ue = _unicode_unescape_udf()
        df = df.select(
            *[
                ue(F.col(f.name)).alias(f.name)
                if isinstance(f.dataType, T.StringType)
                else F.col(f.name)
                for f in df.schema.fields
            ]
        )
    return df


def _unicode_unescape_udf():
    """codecs 'unicode_escape' per cell; non-string columns untouched."""

    @F.pandas_udf("string")
    def _ue(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else codecs.decode(v.encode("latin-1", "backslashreplace"),
                               "unicode_escape")
        )

    return _ue


def write_csv_snapshot(df: DataFrame, path: str) -> None:
    """S6: header CSV export of a (small) result table."""
    df.write.mode("overwrite").option("header", "true").csv(path)


def save_model_artifact(path: str, model_dict: dict, params: dict) -> None:
    """S7: persist the trained model + pipeline settings as JSON."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(
        json.dumps({"model": model_dict, "params": params}, sort_keys=True)
    )


def load_model_artifact(path: str) -> tuple[dict, dict]:
    d = json.loads(Path(path).read_text())
    return d["model"], d["params"]


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("url_a", T.StringType(), False),
        T.StructField("url_b", T.StringType(), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)


def read_training_pairs(spark: SparkSession, path: str) -> DataFrame:
    """S8: `{"match": [[a,b],...], "distinct": [[a,b],...]}` -> DataFrame
    (url_a, url_b, label) with url_a < url_b canonical order."""
    d = json.loads(Path(path).read_text())
    rows = [(min(a, b), max(a, b), 1) for a, b in d.get("match", [])] + [
        (min(a, b), max(a, b), 0) for a, b in d.get("distinct", [])
    ]
    return spark.createDataFrame(rows, _PAIR_SCHEMA)


def write_training_pairs(labeled: DataFrame, path: str) -> None:
    """S8 inverse: labeled-pairs DataFrame -> match/distinct JSON."""
    rows = labeled.select(
        F.least("url_a", "url_b").alias("a"),
        F.greatest("url_a", "url_b").alias("b"),
        "label",
    ).collect()
    out = {"match": [], "distinct": []}
    for r in rows:
        out["match" if r["label"] == 1 else "distinct"].append([r["a"], r["b"]])
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(out, sort_keys=True))
