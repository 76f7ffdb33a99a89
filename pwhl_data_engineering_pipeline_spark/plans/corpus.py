"""End-to-end training-corpus pipeline — the north-star composition.

What a user of this engine runs nightly over a document feed: quality-score
→ filter → exact dedup → near-dedup (MinHash verify) → PII redaction →
chunking → stats, with the cleaned corpus written day-partitioned. Every
stage is one of the tested operators; this plan wires them in the
reference's orchestrator idiom (plans.pipeline.Orchestrator: ordered, timed,
fail-fast) so the batch ETL and the corpus ETL share one operational shape.

Scale shape of the whole plan: two document-wide shuffles (fingerprint
dedup, MinHash buckets) plus narrow maps — no stage keys on raw text, no
driver collection of documents.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text
from ..operators import dedup
from .pipeline import Orchestrator


@dataclass
class CorpusResult:
    cleaned: DataFrame
    chunks: DataFrame
    stats: DataFrame
    orchestrator: Orchestrator


def run_corpus_pipeline(
    docs: DataFrame,
    quality_threshold: float = 0.5,
    near_dup_jaccard: float = 0.8,
    chunk_chars: int = 512,
    chunk_overlap: int = 64,
    skip_near_dedup: bool = False,
) -> CorpusResult:
    """Run the corpus-cleaning plan over a `documents`-shaped frame
    (doc_id, text, lang, source, ...). Returns lazily-planned outputs —
    callers write `cleaned`/`chunks` where they want them (e.g.
    ``writers.write_parquet_partitioned(..., ("source",))``)."""
    orch = Orchestrator()

    def score() -> DataFrame:
        return docs.withColumn("q", text.quality_score("text")).filter(
            F.col("q") >= quality_threshold
        )

    scored = orch.run_stage("quality_filter", score)

    def exact() -> DataFrame:
        return dedup.dedup_exact(scored)

    exact_kept = orch.run_stage("dedup_exact", exact)

    def near() -> DataFrame:
        return dedup.dedup_minhash(
            exact_kept, jaccard_threshold=near_dup_jaccard, num_hashes=64, num_bands=8
        )

    kept = (
        orch.run_stage("dedup_minhash", near, skip=skip_near_dedup) or exact_kept
    )

    def redact() -> DataFrame:
        return kept.withColumn("text", text.redact_pii(F.col("text")))

    cleaned = orch.run_stage("redact_pii", redact)

    def chunk() -> DataFrame:
        return cleaned.select(
            "doc_id",
            "source",
            F.posexplode(text.chunk_text("text", chunk_chars, chunk_overlap)).alias(
                "__i", "c"
            ),
        ).select(
            "doc_id", "source",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
        )

    chunks = orch.run_stage("chunk", chunk)

    def stats() -> DataFrame:
        return cleaned.groupBy("source", "lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count("text")).alias("total_tokens"),
        )

    stats_df = orch.run_stage("stats", stats)
    return CorpusResult(cleaned=cleaned, chunks=chunks, stats=stats_df, orchestrator=orch)


@dataclass
class CorpusExportResult:
    train: DataFrame
    holdout: DataFrame
    stats: DataFrame
    orchestrator: Orchestrator


def run_corpus_pipeline_v2(
    docs: DataFrame,
    *,
    quality_threshold: float = 0.6,
    lm_floor: float | None = -3.5,
    lm_top_v: int = 30,
    temperature: float = 2.0,
    split_weights=(("train", 0.8), ("val", 0.1), ("test", 0.1)),
) -> CorpusExportResult:
    """The training-EXPORT composition — what turns a cleaned feed into a
    training set, wiring the round-3 curation operators end to end:

    1. heuristic quality gate (``text.quality_score`` >= threshold),
    2. unigram-LM perplexity-proxy gate (``lm.lm_quality_gate``; model
       fitted on the quality-surviving corpus itself; ``None`` skips),
    3. exact dedup (``dedup.dedup_exact``),
    4. leakage-safe split (``sampling.leakage_safe_split`` — duplicate
       clusters cannot straddle train/val/test),
    5. temperature-flattened language mix on the TRAIN slice only
       (``sampling.temperature_sample``; eval splits stay untouched —
       rebalancing an eval set would change what it measures).

    Every stage is deterministic and SQL-mirrorable, so the WHOLE pipeline
    is driver-hash-checked end to end (`ns_corpus_export`) — the audit
    property: an independent engine re-derives the exact same training
    set, not an approximation of it.
    """
    from ..operators import lm as _lm
    from ..operators import sampling as _sampling

    orch = Orchestrator()

    def _quality() -> DataFrame:
        return docs.withColumn("q", text.quality_score("text")).filter(
            F.col("q") >= quality_threshold
        )

    scored = orch.run_stage("quality_filter", _quality)

    def _lm_gate() -> DataFrame:
        return _lm.lm_quality_gate(
            scored, top_v=lm_top_v, min_avg_logprob=lm_floor
        )

    gated = (
        orch.run_stage("lm_gate", _lm_gate, skip=lm_floor is None) or scored
    )

    def _dedup() -> DataFrame:
        return dedup.dedup_exact(gated)

    deduped = orch.run_stage("dedup_exact", _dedup)

    def _split() -> DataFrame:
        return _sampling.leakage_safe_split(
            deduped, "text", "doc_id", split_weights
        )

    labeled = orch.run_stage("leakage_safe_split", _split)

    def _mix() -> DataFrame:
        train = labeled.filter(F.col("split") == "train")
        return _sampling.temperature_sample(
            train, "lang", "doc_id", temperature=temperature
        )

    train = orch.run_stage("temperature_mix_train", _mix)
    holdout = labeled.filter(F.col("split") != "train")

    def _stats() -> DataFrame:
        return (
            train.unionByName(holdout)
            .groupBy("split", "lang")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(text.token_count("text")).alias("total_tokens"),
                F.sum("doc_id").alias("id_sum"),
            )
        )

    stats_df = orch.run_stage("stats", _stats)
    return CorpusExportResult(
        train=train, holdout=holdout, stats=stats_df, orchestrator=orch
    )
