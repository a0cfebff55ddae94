"""Cluster refinement: within-component HAC + centroid canonicalization.

Reference (SURVEY.md §2.7/§2.8):
- C3 hierarchical agglomerative clustering per connected component:
  condensed distance matrix (1 - score), centroid linkage via
  fastcluster, cut at cophenetic distance (1 - threshold)
  (dedupe/clustering.py:155-238). Components are small after the
  oversize guard (C2), so per-component work is bounded.
- A8 centroid canonicalization: per cluster per field, the value
  minimizing the mean distance to the other members
  (dedupe/canonical.py:5-71, dedupe/convenience.py:240-251).

Spark shape:
- HAC runs per component inside ``applyInPandas`` (grouped-map Arrow
  UDF): the CC output partitions the edge list by cluster_id, each group
  fits in memory by the C2 cap, numpy average-linkage inside (no scipy /
  fastcluster dependency in the sandbox; linkage choice documented as a
  deviation — the pairwise F1 contract is evaluated on edges, SURVEY.md
  §7 'What's hard' (e)).
- canonicalization is a pure DataFrame plan: within-cluster self-join,
  native ``levenshtein``, argmin by window — no Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

# components larger than this skip HAC (O(k^3) driver-free but per-group
# sequential) and keep their CC label; C2 already re-thresholded them
MAX_HAC_COMPONENT = 500


def _hac_cut(
    ids: np.ndarray, d: np.ndarray, max_dist: float, linkage: str = "average"
) -> np.ndarray:
    """Agglomerative clustering over a dense distance matrix, cut at
    ``max_dist``; returns a label per id (index into ids).

    ``linkage``: 'average' (Lance-Williams size-weighted update),
    'single' (min update; the cut then equals connected components at
    distance <= max_dist, which is what makes the hac_refine driver
    query oracle-checkable), or 'centroid' (the reference's exact
    fastcluster method, clustering.py:217-218 — Lance-Williams centroid
    coefficients applied on squared distances:
    d(ij,k)^2 = (ni d(ik)^2 + nj d(jk)^2)/(ni+nj)
                - ni nj d(ij)^2/(ni+nj)^2).

    Vectorized: the working distance matrix stays a dense (n, n) float64
    array; each merge is one argmin over the masked matrix + one row/col
    update — O(n^2) per merge, O(n^3) worst-case total but with numpy
    constants (the pure-Python dict version measured ~40x slower at
    n=500). Missing pairs (never co-blocked / below threshold) carry
    distance 1.0 — the same 'unknown = far' convention as the reference's
    condensed matrix fill (clustering.py:155-193).
    """
    n = len(ids)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    work = d.astype(np.float64).copy()
    np.fill_diagonal(work, np.inf)
    active = np.ones(n, dtype=bool)
    sizes = np.ones(n, dtype=np.int64)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(n - 1):
        sub = np.where(active)[0]
        if len(sub) < 2:
            break
        w = work[np.ix_(sub, sub)]
        flat = np.argmin(w)
        ai, bi = np.unravel_index(flat, w.shape)
        bd = w[ai, bi]
        if not np.isfinite(bd) or bd > max_dist:
            break
        i, j = int(sub[min(ai, bi)]), int(sub[max(ai, bi)])
        if linkage == "single":
            newrow = np.minimum(work[i], work[j])
        elif linkage == "centroid":
            ni, nj = float(sizes[i]), float(sizes[j])
            tot = ni + nj
            new2 = (ni * work[i] ** 2 + nj * work[j] ** 2) / tot - (
                ni * nj * bd * bd
            ) / (tot * tot)
            newrow = np.sqrt(np.maximum(new2, 0.0))
        else:  # average (Lance-Williams, size-weighted)
            newrow = (sizes[i] * work[i] + sizes[j] * work[j]) / (
                sizes[i] + sizes[j]
            )
        work[i, :] = newrow
        work[:, i] = newrow
        work[i, i] = np.inf
        work[j, :] = np.inf
        work[:, j] = np.inf
        sizes[i] += sizes[j]
        active[j] = False
        labels[labels == j] = i
    return labels


def hac_refine(
    scored_edges: DataFrame,
    components: DataFrame,
    threshold: float = 0.5,
    linkage: str = "average",
) -> DataFrame:
    """C3: re-cluster each CC component hierarchically, cutting at
    (1 - threshold). Input: scored_edges(src, dst, score),
    components(record_id, cluster_id). Output: (record_id, cluster_id)
    with cluster_id = min member id of the refined subcluster.

    ``linkage='single'`` makes the cut equal to connected components of
    the >= threshold subgraph (exactly — the property the driver oracle
    checks); 'average' is the reference-shaped default, pinned by the
    ported-fixture pytest instead.
    """
    comp_edges = (
        scored_edges.join(
            components.select(
                F.col("record_id").alias("src"), F.col("cluster_id")
            ),
            "src",
        )
        # keep only intra-component edges (dst in the same component)
        .join(
            components.select(
                F.col("record_id").alias("dst"),
                F.col("cluster_id").alias("_dc"),
            ),
            "dst",
        )
        .where(F.col("cluster_id") == F.col("_dc"))
        .select("cluster_id", "src", "dst", "score")
    )

    out_schema = T.StructType(
        [
            T.StructField("record_id", components.schema["record_id"].dataType),
            T.StructField("cluster_id", components.schema["record_id"].dataType),
        ]
    )
    max_dist = 1.0 - threshold

    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(np.concatenate([pdf["src"].to_numpy(), pdf["dst"].to_numpy()]))
        if len(ids) > MAX_HAC_COMPONENT:
            # agglomeration is O(k^3): a component near the oversize cap
            # would stall an executor. Components this large have already
            # passed the C2 re-threshold guard; keep them as-is (CC
            # min-label) rather than refine.
            root = ids.min()
            return pd.DataFrame({"record_id": ids, "cluster_id": [root] * len(ids)})
        idx = {v: i for i, v in enumerate(ids)}
        n = len(ids)
        d = np.ones((n, n))
        np.fill_diagonal(d, 0.0)
        for s, t, sc in zip(pdf["src"], pdf["dst"], pdf["score"]):
            i, j = idx[s], idx[t]
            d[i, j] = d[j, i] = 1.0 - float(sc)
        lab = _hac_cut(ids, d, max_dist, linkage)
        roots: dict[int, object] = {}
        for i, r in enumerate(lab):
            cur = roots.get(r)
            if cur is None or ids[i] < cur:
                roots[r] = ids[i]
        return pd.DataFrame(
            {"record_id": ids, "cluster_id": [roots[r] for r in lab]}
        )

    return comp_edges.groupBy("cluster_id").applyInPandas(refine, schema=out_schema)


def canonicalize_clusters(
    entity_map: DataFrame,
    records: DataFrame,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """A8 (dedupe/canonical.py:5-71): per cluster, the member value with
    the minimum total edit distance to the other members' values —
    a pure DataFrame plan (within-cluster self-join + native levenshtein
    + argmin window), deterministic ties by value then id.

    Cluster fan-out is bounded by the C2 oversize guard, so the
    within-cluster self-join is at most max_component^2 per cluster.
    """
    m = entity_map.select("record_id", "cluster_id").join(
        records.select(
            F.col(id_col).alias("record_id"), F.col(value_col).alias("val")
        ),
        "record_id",
    )
    # NULL values are not centroid CANDIDATES (an all-NULL levenshtein
    # sum is NULL, and Spark's asc sort is nulls-FIRST vs DuckDB's
    # nulls-last — an unfiltered NULL member would win here and lose in
    # the oracle), but they stay on the PEER side: filtering b too would
    # make a two-member {real, NULL} cluster vanish (no pair rows, not a
    # singleton). SUM ignores NULL pair costs, so a candidate's total is
    # finite whenever it has >= 1 non-null peer, and the only candidate
    # with a NULL total is a cluster's sole non-null member — a one-row
    # partition where sort order is moot. Engines agree in every case.
    a = m.where(F.col("val").isNotNull()).alias("a")
    b = m.alias("b")
    cost = (
        a.join(b, "cluster_id")
        .where(F.col("a.record_id") != F.col("b.record_id"))
        .groupBy(
            "cluster_id",
            F.col("a.record_id").alias("record_id"),
            F.col("a.val").alias("val"),
        )
        .agg(F.sum(F.levenshtein(F.col("a.val"), F.col("b.val"))).alias("tot"))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.asc("tot"), F.asc("val"), F.asc("record_id")
    )
    best = (
        cost.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("cluster_id", F.col("val").alias("canonical_value"))
    )
    # singletons: their own value is canonical
    sizes = entity_map.groupBy("cluster_id").agg(F.count("*").alias("_n"))
    singles = (
        m.join(sizes.where(F.col("_n") == 1), "cluster_id")
        .select("cluster_id", F.col("val").alias("canonical_value"))
    )
    return best.unionByName(singles)


def keep_best(
    df: DataFrame,
    cluster_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-aware canonical selection: one row per cluster — the
    member with the HIGHEST ``score_col`` (ties broken by lowest
    ``id_col``), plus the cluster's member count. This is the
    keep-best-of-cluster rule training pipelines apply after dedup
    (keep the longest / highest-quality copy of a near-dup family, not
    the arbitrary min-id one — Gopher/FineWeb-style), generalizing the
    reference's min-id representative (init_postgres_db.py:110-113) to
    an arbitrary quality ordering.

    Returns (``cluster_col``, ``id_col``, ``score_col``, members).

    Scale shape: a single groupBy(cluster) with ``max(struct(score,
    -id, id))`` — partial aggregation collapses each map task to one
    candidate row per cluster BEFORE the exchange, so a mega-cluster
    (the skew case dedup always produces: boilerplate families) costs
    one row per task, unlike the row_number-window formulation, which
    must shuffle and SORT every member of every cluster to rank them.
    The struct comparison is lexicographic, so max == (max score, then
    min id); id uniqueness makes it total. Only (cluster, score, id)
    transit the shuffle — hydrate payload columns by joining the result
    back on ``id_col`` if needed (J2)."""
    neg = (-F.col(id_col)).alias("_negid")
    best = (
        df.groupBy(F.col(cluster_col))
        .agg(
            F.max(
                F.struct(
                    F.col(score_col).alias("_s"),
                    neg,
                    F.col(id_col).alias("_id"),
                )
            ).alias("_b"),
            F.count(F.lit(1)).cast("bigint").alias("members"),
        )
        .select(
            cluster_col,
            F.col("_b._id").alias(id_col),
            F.col("_b._s").alias(score_col),
            "members",
        )
    )
    return best
