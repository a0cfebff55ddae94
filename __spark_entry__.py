"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ER pipeline (documents-as-pages ->
blocking -> scoring -> connected components) at sf0.001.

``queries()`` exposes every implemented operator family from SURVEY.md §2
as a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for everything SQL-expressible. Column names/aliases
match exactly on both sides. Float-valued outputs are restricted to
values derived from integer inputs through identical single expressions
(bit-identical across engines); money aggregates are summed as
decimal(18,2) on both sides for exactness.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ny_campaign_finance_dedupe_spark.functions import (  # noqa: E402
    keygen,
    normalize,
    textstats,
)
from ny_campaign_finance_dedupe_spark.operators import (  # noqa: E402
    ann,
    blocking,
    clustering,
    dedup,
    linkage,
    pairs as pairs_ops,
    refine,
)
from ny_campaign_finance_dedupe_spark.plans import training  # noqa: E402
from ny_campaign_finance_dedupe_spark.plans import reports  # noqa: E402
from ny_campaign_finance_dedupe_spark.plans.pipeline import (  # noqa: E402
    DedupePipeline,
    PipelineConfig,
)
from ny_campaign_finance_dedupe_spark.sources.checkpoint import (  # noqa: E402
    CheckpointStore,
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _documents_as_pages(docs: DataFrame) -> DataFrame:
    """Adapt the documents table to the pages(url, warc_ts, html, text,
    lang) input shape (input_hint)."""
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full checkpointed dedupe pipeline over sf0.001 documents."""
    docs = _t(spark, DEFAULT_SF_DIR, "documents")
    pages = _documents_as_pages(docs)
    store = CheckpointStore(tempfile.mkdtemp(prefix="nycfd_entry_"))
    pipe = DedupePipeline(PipelineConfig(), store)
    entity_map = pipe.run(spark, pages)
    return entity_map.select("record_id", "cluster_id", "cluster_score")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_exact_dedup_clusters(spark, sf_dir):
    """P5/C8: byte-identical payload dedup, cluster id = min member id."""
    docs = _t(spark, sf_dir, "documents")
    return (
        dedup.exact_duplicates(docs, "doc_id", "text")
        .select("record_id", "cluster_id", "cluster_size")
        .orderBy("record_id")
    )


def q_fingerprint_clusters(spark, sf_dir):
    """N-family + C8: cluster by sorted-distinct-token fingerprint
    (predicates.py:421-422) — order-insensitive exact dedup."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.select(
        F.col("doc_id").alias("record_id"),
        textstats.doc_fingerprint(F.col("text")).alias("fp"),
    )
    agg = fp.groupBy("fp").agg(F.min("record_id").alias("cluster_id"))
    return fp.join(agg, "fp").select("record_id", "cluster_id").orderBy("record_id")


def q_blocking_first_token_pairs(spark, sf_dir):
    """J1: the blocking self-join on a firstToken predicate
    (predicates.py:358-363 + campaign_finance_dedupe.py:310-314)."""
    docs = _t(spark, sf_dir, "documents")
    bm = blocking.build_blocking_map(
        docs, "doc_id", {"ft": keygen.first_token(F.col("text"))}
    )
    return pairs_ops.candidate_pairs(bm).orderBy("src", "dst")


def q_ngram_jaccard_dedup(spark, sf_dir):
    """Exact word-trigram Jaccard >= 0.8 near-dup pairs (equi-join plan)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8).orderBy(
        "src", "dst"
    )


def q_cc_jaccard_clusters(spark, sf_dir):
    """C1/C5: connected components over Jaccard>=0.8 edges + singletons —
    the transitive-clustering operator with a recursive-CTE oracle."""
    docs = _t(spark, sf_dir, "documents")
    edges = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    comp = clustering.connected_components(edges.select("src", "dst"))
    full = clustering.add_singletons(docs, "doc_id", comp.withColumn("cluster_score", F.lit(1.0)))
    return full.select("record_id", "cluster_id").orderBy("record_id")


def q_token_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("record_id"),
        textstats.token_count(F.col("text")).alias("n_tokens"),
        textstats.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
    ).orderBy("record_id")


def q_quality_score(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("record_id"),
        textstats.quality_score(F.col("text")).alias("quality"),
    ).orderBy("record_id")


def q_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("record_id"),
        textstats.lang_id(F.col("text")).alias("lang_pred"),
    ).orderBy("record_id")


def q_normalize_project(spark, sf_dir):
    """P1/P2/N1: normalization + empty->NULL + predicate filter."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.where(
            (F.col("c_mktsegment") == "BUILDING") & ~F.col("c_name").like("%unitem%")
        )
        .select(
            F.col("c_custkey").alias("record_id"),
            normalize.normalize_text(F.col("c_name")).alias("nname"),
            normalize.empty_to_null(F.col("c_mktsegment")).alias("segment"),
        )
        .orderBy("record_id")
    )


def q_typecode_decode(spark, sf_dir):
    """P4: the 13-arm CASE type decode (init_postgres_db.py:122-147)."""
    ev = _t(spark, sf_dir, "events")
    code = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 3)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "error", 5)
        .otherwise(0)
    )
    return (
        ev.groupBy(code.alias("type_code"))
        .agg(F.count("*").alias("n"))
        .orderBy("type_code")
    )


def q_json_extract(spark, sf_dir):
    """S4-analog: JSON payload projection (row_to_json inverse)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.col("event_id").alias("record_id"),
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
        )
        .orderBy("record_id")
    )


def q_window_topk_per_user(spark, sf_dir):
    """C7: top-N per key via row_number window (clustering.py:280-308)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("user_id", "event_id", "rank")
        .orderBy("user_id", "rank")
    )


def q_top_entities(spark, sf_dir):
    """A1/J6/J7: deduped top-10 by summed measure. Entity map: customers
    clustered by mktsegment (stand-in clusters), facts: orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    em = (
        cust.groupBy("c_mktsegment")
        .agg(F.min("c_custkey").alias("cluster_id"))
        .join(cust, "c_mktsegment")
        .select(F.col("c_custkey").alias("record_id"), "cluster_id")
    )
    facts = orders.select(
        F.col("o_custkey"), F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    return (
        reports.top_entities_by_measure(facts, em, "o_custkey", "price", n=10)
        .select("canon_id", F.col("total").cast("decimal(18,2)").alias("total"))
    )


def q_cluster_size_histogram(spark, sf_dir):
    """A3: cluster-size histogram over the fingerprint clusters."""
    em = q_fingerprint_clusters(spark, sf_dir)
    return reports.cluster_size_histogram(em).orderBy("cluster_id")


def q_run_stats(spark, sf_dir):
    """A5: biggest/avg cluster size, totals, ratio."""
    em = q_fingerprint_clusters(spark, sf_dir)
    return reports.run_stats(em)


def q_canonical_mode(spark, sf_dir):
    """A7: modal value per cluster (customers per nation -> segment)."""
    cust = _t(spark, sf_dir, "customer")
    df = cust.select(
        F.col("c_nationkey").alias("cluster_id"), F.col("c_mktsegment")
    )
    return reports.canonical_value_per_cluster(df, "c_mktsegment").orderBy(
        "cluster_id"
    )


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped reporting aggregate (decimal-exact sums)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "sum_base_price"
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (ids only; threshold margin-safe)."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        ann.cosine_neardup_pairs(emb, "vec_id", "embedding", threshold=0.4)
        .select("src", "dst")
        .orderBy("src", "dst")
    )


def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-3 for the first 32 vectors (ids + rank)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 32)
    return (
        ann.brute_force_topk(q, emb, "vec_id", "embedding", k=3)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def q_canonical_centroid(spark, sf_dir):
    """A8 (dedupe/canonical.py:5-71): per fingerprint-cluster, the member
    text minimizing total edit distance to the others."""
    docs = _t(spark, sf_dir, "documents")
    em = q_fingerprint_clusters(spark, sf_dir)
    return (
        refine.canonicalize_clusters(em, docs, "doc_id", "text")
        .withColumn("cluster_id", F.col("cluster_id").cast("long"))
        .orderBy("cluster_id")
    )


def _doc_link_sides(spark, sf_dir):
    """Split documents into query (doc_id % 7 == 0) and index sides and
    block both on first token — the two-dataset linkage fixture."""
    docs = _t(spark, sf_dir, "documents")
    q = docs.where(F.col("doc_id") % 7 == 0)
    idx = docs.where(F.col("doc_id") % 7 != 0)
    kg = {"ft": keygen.first_token(F.col("text"))}
    bq = blocking.build_blocking_map(q, "doc_id", kg)
    bi = blocking.build_blocking_map(idx, "doc_id", kg)
    cand = pairs_ops.record_link_pairs(bq, bi)
    hyd = pairs_ops.hydrate_pairs(
        cand, docs.select("doc_id", "text"), "doc_id", ["text"]
    )
    from ny_campaign_finance_dedupe_spark.operators import scoring

    feats = scoring.with_features(hyd, "text_a", "text_b")
    return feats.select("src", "dst", F.col("f_jaccard").alias("score"))


def q_gazetteer_topk(spark, sf_dir):
    """C7 (clustering.py:280-308): top-2 index matches per query record
    by token-Jaccard, within first-token blocks."""
    scored = _doc_link_sides(spark, sf_dir)
    return (
        linkage.gazetteer_topk(scored, n_matches=2, threshold=0.0)
        .select(
            F.col("src").alias("query_id"),
            F.col("dst").alias("neighbor_id"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def q_predicate_cover(spark, sf_dir):
    """T4 (dedupe/training.py:133-221): which exact-duplicate pairs each
    candidate predicate co-blocks."""
    docs = _t(spark, sf_dir, "documents")
    fpd = docs.select(
        "doc_id", textstats.doc_fingerprint(F.col("text")).alias("f")
    )
    truth = (
        fpd.alias("a")
        .join(fpd.alias("b"), F.col("a.f") == F.col("b.f"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    cover = training.predicate_cover(
        docs,
        "doc_id",
        {
            "ft": keygen.first_token(F.col("text")),
            "fp": keygen.fingerprint(F.col("text")),
        },
        truth,
    )
    return cover.orderBy("predicate", "src", "dst")


def q_keygen_text(spark, sf_dir):
    """Predicate-family coverage: acronym / prefix / suffix-array /
    2-gram-fingerprint keys as columns (predicates.py:425-473)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("record_id"),
        F.get(keygen.sorted_acronym(F.col("text")), 0).alias("acronym"),
        F.get(keygen.prefix(F.col("text"), 5), 0).alias("pfx5"),
        F.size(keygen.suffix_array(F.col("text"))).alias("n_suffix_keys"),
        F.get(keygen.two_gram_fingerprint(F.col("text")), 0).alias("fp2"),
    ).orderBy("record_id")


def q_hundred_buckets(spark, sf_dir):
    """hundredIntegerPredicate (predicates.py:388-390) over order keys —
    integer-exact bucketing + count per bucket."""
    orders = _t(spark, sf_dir, "orders")
    key = F.get(
        keygen.hundred_integers(F.col("o_orderkey").cast("string")), 0
    )
    return (
        orders.groupBy(key.cast("long").alias("bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


# --- rows-only (not SQL-expressible: LSH/banding/pipeline internals) --------

def q_minhash_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_candidate_pairs(
        docs, "doc_id", "text", est_threshold=0.5
    ).orderBy("src", "dst")


def q_simhash_dedup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash_near_pairs(docs, "doc_id", "text", max_hamming=3).orderBy(
        "src", "dst"
    )


def q_lsh_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 32)
    return (
        ann.lsh_topk(q, emb, dim=64, k=3, bands=8, bits=8)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    )


def q_greedy_link(spark, sf_dir):
    """C6 (clustering.py:265-277): one-to-one greedy matching on the
    doc-linkage fixture (iterative — rows-only check)."""
    scored = _doc_link_sides(spark, sf_dir)
    return (
        linkage.greedy_one_to_one(scored, threshold=0.3)
        .select("src", "dst")
        .orderBy("src", "dst")
    )


def q_hac_refine(spark, sf_dir):
    """C3 (clustering.py:155-238): HAC split of CC components at a higher
    cut (iterative per-component — rows-only check)."""
    docs = _t(spark, sf_dir, "documents")
    edges = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    edges = edges.select("src", "dst", F.col("jaccard").alias("score"))
    comp = clustering.connected_components(edges.select("src", "dst"))
    return refine.hac_refine(edges, comp, threshold=0.9).orderBy("record_id")


def q_phonetic_keys(spark, sf_dir):
    """doubleMetaphone-analog blocking keys (soundex; no DuckDB twin)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("record_id"),
        F.get(
            keygen.phonetic(F.regexp_extract(F.col("text"), r"^([\w']+)", 1)), 0
        ).alias("phonetic_key"),
    ).orderBy("record_id")


def q_incremental_match(spark, sf_dir):
    """Gazetteer/streaming analog (dedupe/api.py:612-896): match a batch
    of new pages against a persistent index (same code path foreachBatch
    drives; minhash/simhash blocking — rows-only check)."""
    from ny_campaign_finance_dedupe_spark.plans.pipeline import PipelineConfig
    from ny_campaign_finance_dedupe_spark.streaming import incremental

    docs = _t(spark, sf_dir, "documents")
    pages = _documents_as_pages(docs.withColumn(
        "source", F.concat(F.col("source"), (F.col("doc_id") % 7).cast("string"))
    ))
    idx_pages = pages.where(F.xxhash64("url") % 7 != 0)
    batch = pages.where(F.xxhash64("url") % 7 == 0)
    cfg = PipelineConfig()
    index = incremental.build_index(idx_pages, cfg)
    return (
        incremental.match_batch(batch, index, cfg, n_matches=1, threshold=0.5)
        .select("query_url", "match_url", "rank")
        .orderBy("query_url")
    )


def q_salted_pairs(spark, sf_dir):
    """Skew-safe pair generation: hot-key bucket-grid salting MUST equal
    the plain blocking self-join (same oracle as
    blocking_first_token_pairs — that equality IS the check)."""
    docs = _t(spark, sf_dir, "documents")
    bm = blocking.build_blocking_map(
        docs, "doc_id", {"ft": keygen.first_token(F.col("text"))}
    )
    return pairs_ops.salted_candidate_pairs(bm, hot_threshold=20, salt=8).orderBy(
        "src", "dst"
    )


def q_identity_join(spark, sf_dir):
    """J5 (init_postgres_db.py:255-295): exact-identity join on
    null-coalesced multi-column equality — Spark's null-safe <=> is the
    idiomatic form of the reference's COALESCE(col,'') equality."""
    docs = _t(spark, sf_dir, "documents")
    a = docs.alias("a")
    b = docs.alias("b")
    return (
        a.join(
            b,
            F.col("a.text").eqNullSafe(F.col("b.text"))
            & F.col("a.lang").eqNullSafe(F.col("b.lang")),
        )
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        .orderBy("src", "dst")
    )


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: documents' bytes as an opaque binary payload
    -> deterministic feature extraction via mapInPandas (decode stubbed;
    schema/batching/null handling real — rows-only check)."""
    from ny_campaign_finance_dedupe_spark.operators import multimodal

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )
    out = multimodal.extract_media_features(media)
    return out.select(
        "media_id",
        F.size(F.col("features")).alias("feature_dim"),
        F.col("features")[0].isNotNull().alias("has_features"),
    ).orderBy("media_id")


def q_er_pipeline(spark, sf_dir):
    """The flagship three-stage ER pipeline over documents-as-pages."""
    docs = _t(spark, sf_dir, "documents")
    pages = _documents_as_pages(docs)
    store = CheckpointStore(tempfile.mkdtemp(prefix="nycfd_q_"))
    pipe = DedupePipeline(PipelineConfig(), store)
    em = pipe.run(spark, pages)
    return em.select("record_id", "cluster_id").orderBy("record_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup_clusters": q_exact_dedup_clusters,
        "fingerprint_clusters": q_fingerprint_clusters,
        "blocking_first_token_pairs": q_blocking_first_token_pairs,
        "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
        "cc_jaccard_clusters": q_cc_jaccard_clusters,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "normalize_project": q_normalize_project,
        "typecode_decode": q_typecode_decode,
        "json_extract": q_json_extract,
        "window_topk_per_user": q_window_topk_per_user,
        "top_entities": q_top_entities,
        "cluster_size_histogram": q_cluster_size_histogram,
        "run_stats": q_run_stats,
        "canonical_mode": q_canonical_mode,
        "pricing_summary": q_pricing_summary,
        "embedding_neardup": q_embedding_neardup,
        "ann_topk": q_ann_topk,
        "minhash_dedup": q_minhash_dedup,
        "simhash_dedup": q_simhash_dedup,
        "lsh_ann_topk": q_lsh_ann_topk,
        "er_pipeline": q_er_pipeline,
        "canonical_centroid": q_canonical_centroid,
        "gazetteer_topk": q_gazetteer_topk,
        "predicate_cover": q_predicate_cover,
        "keygen_text": q_keygen_text,
        "hundred_buckets": q_hundred_buckets,
        "identity_join": q_identity_join,
        "salted_pairs": q_salted_pairs,
        "media_features": q_media_features,
        "greedy_link": q_greedy_link,
        "hac_refine": q_hac_refine,
        "phonetic_keys": q_phonetic_keys,
        "incremental_match": q_incremental_match,
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over pre-registered views)
# ---------------------------------------------------------------------------

_NORM = (
    "nullif(trim(regexp_replace(regexp_replace(lower({c}), '[^\\w\\s]+', ' ', 'g'),"
    " '\\s+', ' ', 'g')), '')"
)

_GRAMS_BODY = """
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
g AS (
  SELECT DISTINCT doc_id, UNNEST(list_transform(
    generate_series(1, greatest(len(words) - 2, 0)),
    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS gram
  FROM w
),
n AS (SELECT doc_id, COUNT(*) AS ng FROM g GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS shared
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT s.src, s.dst,
         s.shared::DOUBLE / (na.ng + nb.ng - s.shared) AS jaccard
  FROM shared s
  JOIN n na ON na.doc_id = s.src
  JOIN n nb ON nb.doc_id = s.dst
)
"""

_GRAMS = "WITH " + _GRAMS_BODY
_GRAMS_REC = "WITH RECURSIVE " + _GRAMS_BODY

_FP = (
    "array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')"
)


def oracle_sql() -> dict[str, str]:
    sw = ", ".join(f"'{w}'" for w in textstats.EN_STOPWORDS)
    langs = {
        code: ", ".join(f"'{w}'" for w in ws)
        for code, ws in textstats.LANG_STOPWORDS.items()
    }
    # mirror textstats.lang_id: strict > scanning codes alphabetically
    vote = {
        code: f"len(list_filter(string_split(lower(text), ' '),"
        f" t -> list_contains([{langs[code]}], t)))"
        for code in langs
    }
    return {
        "exact_dedup_clusters": """
            SELECT d.doc_id AS record_id, g.cluster_id, g.cluster_size
            FROM documents d
            JOIN (SELECT text, MIN(doc_id) AS cluster_id,
                         COUNT(*) AS cluster_size
                  FROM documents GROUP BY text) g USING (text)
            ORDER BY record_id
        """,
        "fingerprint_clusters": f"""
            WITH fp AS (SELECT doc_id AS record_id, {_FP} AS f FROM documents)
            SELECT record_id, MIN(record_id) OVER (PARTITION BY f) AS cluster_id
            FROM fp ORDER BY record_id
        """,
        "blocking_first_token_pairs": """
            WITH b AS (
              SELECT doc_id, split_part(text, ' ', 1) AS k
              FROM documents WHERE text IS NOT NULL
                AND split_part(text, ' ', 1) <> ''
            )
            SELECT DISTINCT l.doc_id AS src, r.doc_id AS dst
            FROM b l JOIN b r ON l.k = r.k AND l.doc_id < r.doc_id
            ORDER BY src, dst
        """,
        "ngram_jaccard_dedup": _GRAMS
        + "SELECT src, dst, jaccard FROM jac WHERE jaccard >= 0.8 ORDER BY src, dst",
        "cc_jaccard_clusters": _GRAMS_REC
        + """,
        e AS (SELECT src, dst FROM jac WHERE jaccard >= 0.8),
        und AS (SELECT src AS a, dst AS b FROM e
                UNION SELECT dst, src FROM e),
        reach(node, other) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.node, u.b FROM reach r JOIN und u ON u.a = r.other
        )
        SELECT node AS record_id, MIN(other) AS cluster_id
        FROM reach GROUP BY node ORDER BY record_id
        """,
        "token_stats": r"""
            SELECT doc_id AS record_id,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE len(string_split_regex(text, '\s+')) END AS n_tokens,
                   CASE WHEN text IS NULL THEN NULL
                        ELSE len(regexp_extract_all(lower(text),
                             '[a-z]+|[0-9]+|[^a-z0-9\s]')) END AS n_bpe_tokens
            FROM documents ORDER BY record_id
        """,
        "quality_score": rf"""
            SELECT doc_id AS record_id,
                   CASE WHEN text IS NULL THEN NULL ELSE
                     0.5 * least(1.0,
                       len(list_filter(string_split_regex(lower(text), '\s+'),
                           t -> list_contains([{sw}], t)))::DOUBLE
                       / (0.04 * len(string_split_regex(text, '\s+'))::DOUBLE))
                   + 0.5 * (length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
                       / greatest(length(text)::DOUBLE, 1.0))
                   END AS quality
            FROM documents ORDER BY record_id
        """,
        # winner = alphabetically-first code among argmax votes; 'und' if all 0
        # (mirrors textstats.lang_id's strict-> forward scan exactly)
        "lang_id": rf"""
            WITH v AS (
              SELECT doc_id, text,
                     {vote['de']} AS vde, {vote['en']} AS ven,
                     {vote['es']} AS ves, {vote['fr']} AS vfr
              FROM documents)
            SELECT doc_id AS record_id,
              CASE WHEN text IS NULL THEN NULL
                   WHEN greatest(vde, ven, ves, vfr) = 0 THEN 'und'
                   WHEN vde = greatest(vde, ven, ves, vfr) THEN 'de'
                   WHEN ven = greatest(vde, ven, ves, vfr) THEN 'en'
                   WHEN ves = greatest(vde, ven, ves, vfr) THEN 'es'
                   ELSE 'fr' END AS lang_pred
            FROM v ORDER BY record_id
        """,
        "normalize_project": f"""
            SELECT c_custkey AS record_id,
                   {_NORM.format(c='c_name')} AS nname,
                   nullif(trim(c_mktsegment), '') AS segment
            FROM customer
            WHERE c_mktsegment = 'BUILDING' AND c_name NOT LIKE '%unitem%'
            ORDER BY record_id
        """,
        "typecode_decode": """
            SELECT CASE event_type
                     WHEN 'click' THEN 1 WHEN 'view' THEN 2
                     WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
                     WHEN 'error' THEN 5 ELSE 0 END AS type_code,
                   COUNT(*) AS n
            FROM events GROUP BY 1 ORDER BY type_code
        """,
        "json_extract": """
            SELECT event_id AS record_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k
            FROM events ORDER BY record_id
        """,
        "window_topk_per_user": """
            SELECT user_id, event_id, rank FROM (
              SELECT user_id, event_id,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rank
              FROM events)
            WHERE rank <= 3 ORDER BY user_id, rank
        """,
        "top_entities": """
            WITH em AS (
              SELECT c.c_custkey AS record_id, g.cluster_id
              FROM customer c
              JOIN (SELECT c_mktsegment, MIN(c_custkey) AS cluster_id
                    FROM customer GROUP BY c_mktsegment) g USING (c_mktsegment)
            )
            SELECT COALESCE(em.cluster_id, o.o_custkey) AS canon_id,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,2)) AS total
            FROM orders o LEFT JOIN em ON em.record_id = o.o_custkey
            GROUP BY 1 ORDER BY total DESC, canon_id LIMIT 10
        """,
        "cluster_size_histogram": f"""
            WITH fp AS (SELECT doc_id AS record_id, {_FP} AS f FROM documents),
            em AS (SELECT record_id,
                          MIN(record_id) OVER (PARTITION BY f) AS cluster_id
                   FROM fp)
            SELECT cluster_id, COUNT(*) AS cluster_size
            FROM em GROUP BY cluster_id ORDER BY cluster_id
        """,
        "run_stats": f"""
            WITH fp AS (SELECT doc_id AS record_id, {_FP} AS f FROM documents),
            em AS (SELECT record_id,
                          MIN(record_id) OVER (PARTITION BY f) AS cluster_id
                   FROM fp),
            h AS (SELECT cluster_id, COUNT(*) AS cluster_size
                  FROM em GROUP BY cluster_id)
            SELECT MAX(cluster_size) AS biggest_cluster_size,
                   AVG(cluster_size) AS avg_cluster_size,
                   COUNT(*) AS total_clusters,
                   SUM(cluster_size) AS total_records,
                   COUNT(*)::DOUBLE / SUM(cluster_size) AS cluster_record_ratio
            FROM h
        """,
        "canonical_mode": """
            SELECT cluster_id, canonical_value FROM (
              SELECT c_nationkey AS cluster_id, c_mktsegment AS canonical_value,
                     ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                        ORDER BY COUNT(*) DESC, c_mktsegment)
                       AS rn
              FROM customer GROUP BY c_nationkey, c_mktsegment)
            WHERE rn = 1 ORDER BY cluster_id
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2))
                     AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                        AS DECIMAL(28,2)) AS sum_base_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS src, b.vec_id AS dst
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(
                    CAST(a.embedding AS DOUBLE[]),
                    CAST(b.embedding AS DOUBLE[])) >= 0.4
            ORDER BY src, dst
        """,
        "canonical_centroid": f"""
            WITH fp AS (SELECT doc_id, text, {_FP} AS f FROM documents),
            em AS (SELECT doc_id, text,
                          MIN(doc_id) OVER (PARTITION BY f) AS cluster_id
                   FROM fp),
            sizes AS (SELECT cluster_id, COUNT(*) AS n FROM em
                      GROUP BY cluster_id),
            cost AS (
              SELECT a.cluster_id, a.doc_id, a.text AS val,
                     SUM(levenshtein(a.text, b.text)) AS tot
              FROM em a JOIN em b
                ON a.cluster_id = b.cluster_id AND a.doc_id <> b.doc_id
              GROUP BY a.cluster_id, a.doc_id, a.text),
            best AS (SELECT cluster_id, val AS canonical_value FROM (
                       SELECT cluster_id, val,
                              ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY tot, val, doc_id) AS rn
                       FROM cost) WHERE rn = 1),
            singles AS (SELECT em.cluster_id, em.text AS canonical_value
                        FROM em JOIN sizes USING (cluster_id) WHERE n = 1)
            SELECT cluster_id, canonical_value FROM best
            UNION ALL SELECT cluster_id, canonical_value FROM singles
            ORDER BY cluster_id
        """,
        "gazetteer_topk": """
            WITH b AS (SELECT doc_id, text, split_part(text, ' ', 1) AS k
                       FROM documents WHERE text IS NOT NULL
                         AND split_part(text, ' ', 1) <> ''),
            cand AS (SELECT DISTINCT q.doc_id AS src, i.doc_id AS dst,
                            q.text AS ta, i.text AS tb
                     FROM b q JOIN b i ON q.k = i.k
                     WHERE q.doc_id % 7 = 0 AND i.doc_id % 7 <> 0),
            sc AS (SELECT src, dst,
                     len(list_intersect(list_distinct(string_split(ta, ' ')),
                                        list_distinct(string_split(tb, ' '))))::DOUBLE
                     / (len(list_distinct(string_split(ta, ' ')))
                        + len(list_distinct(string_split(tb, ' ')))
                        - len(list_intersect(list_distinct(string_split(ta, ' ')),
                                             list_distinct(string_split(tb, ' ')))))
                     AS score
                   FROM cand)
            SELECT query_id, neighbor_id, rank FROM (
              SELECT src AS query_id, dst AS neighbor_id,
                     ROW_NUMBER() OVER (PARTITION BY src
                       ORDER BY score DESC, src, dst) AS rank
              FROM sc WHERE score > 0)
            WHERE rank <= 2 ORDER BY query_id, rank
        """,
        "predicate_cover": f"""
            WITH fpd AS (SELECT doc_id, {_FP} AS f FROM documents),
            t AS (SELECT a.doc_id AS src, b.doc_id AS dst
                  FROM fpd a JOIN fpd b
                    ON a.f = b.f AND a.doc_id < b.doc_id),
            bm AS (
              SELECT 'ft' AS predicate, split_part(text, ' ', 1) AS key, doc_id
              FROM documents WHERE text IS NOT NULL
                AND split_part(text, ' ', 1) <> ''
              UNION ALL
              SELECT 'fp',
                array_to_string(list_sort(list_distinct(
                  string_split(text, ' '))), ''), doc_id
              FROM documents WHERE text IS NOT NULL),
            co AS (SELECT DISTINCT l.predicate, l.doc_id AS src, r.doc_id AS dst
                   FROM bm l JOIN bm r
                     ON l.predicate = r.predicate AND l.key = r.key
                    AND l.doc_id < r.doc_id)
            SELECT co.predicate, co.src, co.dst
            FROM co JOIN t USING (src, dst)
            ORDER BY predicate, src, dst
        """,
        "keygen_text": r"""
            SELECT doc_id AS record_id,
              CASE WHEN text IS NULL THEN NULL ELSE
                array_to_string(list_sort(list_transform(
                  string_split(text, ' '), t -> t[1])), '') END AS acronym,
              CASE WHEN text IS NULL OR length(text) < 5 THEN NULL
                   ELSE text[1:5] END AS pfx5,
              CASE WHEN text IS NULL THEN 0 ELSE
                len(list_distinct(list_transform(
                  generate_series(1, greatest(length(text[1:100]) - 4, 0)),
                  i -> text[1:100][i:]))) END AS n_suffix_keys,
              CASE WHEN length(regexp_replace(text, '\s', '', 'g')) <= 1
                     THEN NULL ELSE
                array_to_string(list_sort(list_distinct(list_transform(
                  generate_series(1,
                    length(regexp_replace(text, '\s', '', 'g')) - 1),
                  i -> regexp_replace(text, '\s', '', 'g')[i:i+1]))), '')
              END AS fp2
            FROM documents ORDER BY record_id
        """,
        "hundred_buckets": """
            SELECT (o_orderkey // 100 * 100) AS bucket, COUNT(*) AS n
            FROM orders GROUP BY 1 ORDER BY bucket
        """,
        "salted_pairs": """
            WITH b AS (
              SELECT doc_id, split_part(text, ' ', 1) AS k
              FROM documents WHERE text IS NOT NULL
                AND split_part(text, ' ', 1) <> ''
            )
            SELECT DISTINCT l.doc_id AS src, r.doc_id AS dst
            FROM b l JOIN b r ON l.k = r.k AND l.doc_id < r.doc_id
            ORDER BY src, dst
        """,
        "identity_join": """
            SELECT a.doc_id AS src, b.doc_id AS dst
            FROM documents a JOIN documents b
              ON a.text IS NOT DISTINCT FROM b.text
             AND a.lang IS NOT DISTINCT FROM b.lang
            WHERE a.doc_id < b.doc_id
            ORDER BY src, dst
        """,
        "ann_topk": """
            SELECT query_id, neighbor_id, rank FROM (
              SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY list_cosine_similarity(
                           CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id) AS rank
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              WHERE a.vec_id < 32)
            WHERE rank <= 3 ORDER BY query_id, rank
        """,
    }


if __name__ == "__main__":
    from ny_campaign_finance_dedupe_spark.session import get_spark

    s = get_spark("entry-smoke")
    df = entry(s)
    df.show(10, truncate=False)
    print("rows:", df.count())
