"""The flagship plan: pages -> extract -> block -> pairs -> score -> cluster.

Reference lifecycle: ``run_dedupe`` (campaign_finance_dedupe.py:119-490,
SURVEY.md §3.1) and its resume twin ``start_at_clustering.py:119-374``.
One SparkSession job graph replaces the Python<->Postgres<->multiprocess
topology; each stage checkpoints (sources/checkpoint.py) so any prefix can
be skipped with ``resume_from`` — the reference's stage-level
restartability, generalized.

Scale shape (the 100 TB story):
- extract runs once per page, Arrow-vectorized, then is checkpointed —
  the scan downstream reads (url, ntext, sig, simhash) only, never html.
- blocking emits ~(1 + bands_mh + bands_sh) keys/page: linear.
- the only quadratic danger is block fan-out: capped at
  ``max_block_size`` (canopy stop-word analog) + AQE skew-join.
- scoring is a native column expression — no Python between shuffle and
  shuffle; the pair shuffle carries ids only (hydration re-joins text).
- CC rounds are O(log^2 n) with per-round localCheckpoint.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import hashing, keygen, normalize
from ..operators import blocking, clustering, pairs, scoring
from ..sources.checkpoint import STAGES, CheckpointStore


@dataclass
class PipelineConfig:
    """The 'settings file' (dedupe/api.py:1069-1086) as plain data."""

    # 8 bands x 8 rows: P(co-block) = 1-(1-s^8)^8 = 0.99 at Jaccard 0.9,
    # 0.07 at Jaccard 0.5 — near-dups caught, template noise rejected.
    # (16x4 was ~0.65 at s=0.5: ~22 candidate pairs/page at 200k pages,
    # which is the quadratic blow-up the block cap exists to prevent.)
    minhash_perms: int = 64
    minhash_bands: int = 8
    minhash_rows: int = 8
    shingle_words: int = 3
    simhash_bands: int = 4
    # engine-portable hash family (functions/portable.py): md5-derived
    # minhash/simhash, zero-UDF Catalyst expressions, every signature
    # recomputable by the DuckDB oracle. Slower constants than the
    # xxhash64+Arrow fast path — the correctness-gate configuration, not
    # the bench one. Use 16 perms / 8x2 banding with it.
    portable_hashing: bool = False
    max_block_size: int = 100
    # candidate generation strategy: "join" (plain self-join + AQE),
    # "salted" (hot-key bucket grid, pairs.salted_candidate_pairs), or
    # "cogroup" (north_star's groupBy-cogroup emission)
    pair_strategy: str = "join"
    salt_hot_threshold: int = 1_000
    salt: int = 16
    score_threshold: float = 0.5
    # optional C3 refinement: re-cluster each CC component with HAC cut
    # at (1 - score_threshold) — the reference's per-component
    # hierarchical pass (clustering.py:196-238); off by default because
    # the pairwise-F1 contract is met by CC-at-threshold (SURVEY.md §7e)
    use_hac: bool = False
    max_component: int = clustering.MAX_COMPONENT
    lang_filter: str | None = None
    # Compact block keys to 64-bit xxhash64 before the blocking map is
    # checkpointed / shuffled. The string keys ("mh|<band>|<hex>",
    # "dom_sh|<domain>|<band>", ~30-60 bytes) are only ever compared for
    # EQUALITY downstream (cap count, pair self-join, salt grid), so an
    # 8-byte injective-enough stand-in carries the same information at
    # ~1/5 the shuffle + checkpoint byte volume — the block stage is the
    # pipeline's most bandwidth-bound after signatures (2->8-core
    # executor-CPU inflation +29-134% across the round-4 telemetry
    # draws, BASELINE.md). Collisions merge two blocks (~26M keys in a
    # 64-bit space: P(any) ~ 2e-5 at 2M pages) which only ADDS candidate
    # pairs that scoring then rejects — never drops a true pair.
    # None = compact exactly when the fast hash family runs; the
    # portable family keeps strings so the DuckDB oracle can recompute
    # every key (functions/portable.py contract).
    compact_block_keys: bool | None = None
    model: dict = field(
        default_factory=lambda: scoring.LogisticModel().to_dict()
    )

    def params(self) -> dict:
        return asdict(self)


class DedupePipeline:
    """Stage methods are pure DataFrame transforms usable without a
    store (the streaming matcher reuses extract/signatures/block that
    way); only ``run`` — checkpoint + resume orchestration — needs one.
    """

    def __init__(self, config: PipelineConfig, store: CheckpointStore | None = None):
        self.cfg = config
        self.store = store

    # -- stages ---------------------------------------------------------------
    def extract(self, pages: DataFrame) -> DataFrame:
        """Normalize text (byte-identical per url).

        If ``text`` is null but ``html`` is present, extract text from the
        html bytes (input_hint: text byte-identically derivable from html).
        The UDF input is gated on ``text IS NULL`` — Spark evaluates
        pandas-UDF arguments unconditionally (no short-circuit through
        coalesce), so ungated it would parse every page's html.
        """
        cfg = self.cfg
        df = pages
        if cfg.lang_filter:
            # P1-analog person/type filter (campaign_finance_dedupe.py:154-159)
            df = df.where(F.col("lang") == cfg.lang_filter)
        txt = F.coalesce(
            F.col("text"),
            normalize.extract_text_udf()(
                F.when(F.col("text").isNull(), F.col("html"))
            ),
        )
        # lowercase/punct-strip FIRST (the reference cleans processed_
        # donors, already lowercased at load), THEN the guarded 20-group
        # abbrev canonicalization + org-name expansion (N4 + N5) as an
        # opaque Arrow UDF — every native shape of the 23-step chain is
        # optimizer-toxic (see normalize.canonicalize_udf). The UDF input
        # is gated JVM-side (rlike on the combined abbreviation pattern):
        # pandas-UDF arguments are evaluated unconditionally, so the gate
        # must live INSIDE the argument — non-matching pages ship a null
        # through Arrow instead of their whole text (~2x off the UDF
        # overhead; the two-step select computes the normalize chain once
        # — CollapseProject declines to inline a non-cheap expression
        # referenced three times).
        pre = df.select(
            "url", "warc_ts", "lang",
            normalize.normalize_text(txt).alias("_nt"),
        )
        c = F.col("_nt")
        gated = normalize.canonicalize_udf()(
            F.when(c.rlike(normalize.any_abbrev_pattern()), c)
        )
        return pre.select(
            "url", "warc_ts", "lang", F.coalesce(gated, c).alias("ntext")
        )

    def signatures(self, extracted: DataFrame) -> DataFrame:
        """MinHash + SimHash signatures (plus the exact-dedup sha2 key)
        over checkpointed ntext.

        A separate checkpointed stage on purpose: reading ntext back from
        parquet stops Catalyst's projection collapse from inlining the
        (expensive) normalization chain into every signature expression —
        measured 4x on the extract+sign path at 40k pages.

        The stage's output deliberately does NOT carry ntext: every key
        the blocking stage needs (sha2 exact key, minhash bands, simhash
        bands, url domain) is derivable from the ~150 bytes/row emitted
        here, while ntext is ~1 KB/page of web text. Dropping it cuts the
        signatures write AND the blocking read ~7x — on the shared-memory
        sandbox that byte volume is exactly the contended resource (the
        2→8-core profile showed extract/signatures/block at 2.4-3.0x for
        4x cores while the compute-bound stages hit 3.7-4.1x), and on a
        real cluster it is shuffle-free but still object-store I/O.
        Downstream hydration (score, cluster) re-joins ntext from the
        extract checkpoint by url — the J2 ids-only pattern applied to
        the stage boundary.
        """
        cfg = self.cfg
        exact_key = F.sha2(F.col("ntext"), 256).alias("exact_key")
        head = ["url", "warc_ts", "lang"]
        if cfg.portable_hashing:
            from ..functions import portable

            shingles = keygen.word_ngrams(F.col("ntext"), cfg.shingle_words)
            return extracted.select(
                *head,
                exact_key,
                portable.minhash_sig(shingles, cfg.minhash_perms).alias("sig"),
                portable.simhash32(shingles).alias("simhash"),
            )
        # fast family: token-hash-combined shingle ids — no gram strings
        # ever materialize JVM-side (see hashing.word_ngram_hashes)
        fused = hashing.minhash_simhash_udf(cfg.minhash_perms)(
            hashing.word_ngram_hashes(F.col("ntext"), cfg.shingle_words)
        )
        return extracted.withColumn("_s", fused).select(
            *head,
            exact_key,
            F.col("_s.sig").alias("sig"),
            F.col("_s.simhash").alias("simhash"),
        )

    def predicates(self) -> dict:
        cfg = self.cfg
        if cfg.portable_hashing:
            from ..functions import portable

            mh = portable.minhash_band_keys(
                F.col("sig"), cfg.minhash_bands, cfg.minhash_rows
            )
            sh = portable.simhash_band_keys(
                F.col("simhash"), bands=cfg.simhash_bands, bits=32
            )
        else:
            mh = hashing.minhash_band_keys(
                F.col("sig"), bands=cfg.minhash_bands, rows=cfg.minhash_rows
            )
            sh = hashing.simhash_band_keys(
                F.col("simhash"), bands=cfg.simhash_bands
            )
        return {
            "exact": F.when(
                F.col("exact_key").isNull(), F.array().cast("array<string>")
            ).otherwise(F.array(F.col("exact_key"))),
            "mh": mh,
            "dom_sh": keygen.compound(keygen.domain_key(F.col("url")), sh),
        }

    def block(self, extracted: DataFrame) -> DataFrame:
        bm = blocking.build_blocking_map(extracted, "url", self.predicates())
        compact = self.cfg.compact_block_keys
        if compact is None:
            compact = not self.cfg.portable_hashing
        if compact:
            # before cap_blocks so BOTH shuffles of the map (cap count +
            # pair join) and the stage checkpoint carry 8-byte longs
            bm = bm.select(
                F.xxhash64("block_key").alias("block_key"), "record_id"
            )
        return blocking.cap_blocks(bm, self.cfg.max_block_size)

    def gen_pairs(self, blocking_map: DataFrame) -> DataFrame:
        cfg = self.cfg
        if cfg.pair_strategy == "salted":
            return pairs.salted_candidate_pairs(
                blocking_map, cfg.salt_hot_threshold, cfg.salt
            )
        if cfg.pair_strategy == "cogroup":
            return pairs.pairs_via_cogroup(blocking_map)
        return pairs.candidate_pairs(blocking_map)

    def score(self, cand: DataFrame, extracted: DataFrame) -> DataFrame:
        hyd = pairs.hydrate_pairs(cand, extracted.select("url", "ntext"), "url", ["ntext"])
        feat = scoring.with_features(hyd, "ntext_a", "ntext_b")
        model = scoring.LogisticModel.from_dict(self.cfg.model)
        return scoring.score_pairs(feat, model).select("src", "dst", "score")

    def cluster(
        self,
        scored: DataFrame,
        records: DataFrame,
        c2_report: dict | None = None,
    ) -> DataFrame:
        # materialize the CC map once: split_oversize's emptiness probe
        # and the stage's checkpoint write both consume it, and without a
        # checkpoint each one re-evaluates the idmap-join + relabel +
        # confidence tree (measured ~2x the cluster stage at 1M pages)
        cl = clustering.cluster_edges(
            scored, threshold=self.cfg.score_threshold
        ).localCheckpoint()
        cl = clustering.split_oversize_components(
            scored,
            cl,
            self.cfg.score_threshold,
            self.cfg.max_component,
            report=c2_report,
        )
        if self.cfg.use_hac:
            from ..operators import refine

            refined = refine.hac_refine(
                scored.where(F.col("score") >= self.cfg.score_threshold),
                cl.select("record_id", "cluster_id"),
                threshold=self.cfg.score_threshold,
            )
            conf = clustering.member_confidence(
                scored.where(F.col("score") >= self.cfg.score_threshold), refined
            )
            cl = refined.join(conf, "record_id", "left").select(
                "record_id",
                "cluster_id",
                F.coalesce("cluster_score", F.lit(1.0)).alias("cluster_score"),
            )
        return clustering.add_singletons(records, "url", cl)

    # -- orchestration ----------------------------------------------------------
    def run(
        self,
        spark: SparkSession,
        pages: DataFrame,
        resume_from: str | None = None,
    ) -> DataFrame:
        """Execute all stages with checkpoint + resume.

        ``resume_from='pairs'`` skips extract/block if their checkpoints
        exist with matching params (start_at_clustering semantics).
        """
        if self.store is None:
            raise ValueError("DedupePipeline.run requires a CheckpointStore")
        p = self.cfg.params()
        start = STAGES.index(resume_from) if resume_from else 0

        def stage(idx: int, name: str, build):
            if idx < start and self.store.has(name, p):
                return self.store.read(spark, name)
            # job group = stage name: attributes this stage's Spark jobs
            # in the UI/REST so per-stage executor telemetry
            # (tools/stage_telemetry.py: task retries, GC, CPU-vs-wall)
            # can be aggregated per pipeline stage; cleared afterwards so
            # untagged work (run stats, caller actions) stays outside
            sc = spark.sparkContext
            sc.setJobGroup(f"pipeline:{name}", f"pipeline stage {name}")
            try:
                df = build()
                return self.store.write(df, name, params=p)
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)

        extracted = stage(0, "extract", lambda: self.extract(pages))
        signed = stage(1, "signatures", lambda: self.signatures(extracted))
        bm = stage(2, "block", lambda: self.block(signed))
        cand = stage(3, "pairs", lambda: self.gen_pairs(bm))
        scored = stage(4, "score", lambda: self.score(cand, extracted))
        entity_map = stage(5, "cluster", lambda: self.cluster(scored, extracted))
        # entity_map=None: aggregate the raw cluster-checkpoint scan
        # (params-validated), skipping the read-back's repartition
        self.store.write_run_stats(params=p, spark=spark)
        return entity_map
