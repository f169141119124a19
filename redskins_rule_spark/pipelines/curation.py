"""End-to-end corpus curation: the operator library composed into the
pipeline a pretraining-data team actually ships — length/quality
floor, language allowlist, exact dedup, near-dup clustering with a
keep-best survivor, optional benchmark decontamination, optional
token-budget source mixing, and a deterministic global index for
sharding.

Every stage is one of the package's audited operators; the pipeline
only composes lazy DataFrames, so Catalyst sees ONE plan per output
and the whole flow inherits the operators' scale contracts (bucketed
candidate generation, broadcast scalars, no driver collects). Nothing
here is eager: callers materialize `kept` once and the stage-count
report reuses the same lineage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redskins_rule_spark.operators.dedup import (
    dedup_by_content,
    ngram_jaccard_pairs_exact,
)
from redskins_rule_spark.operators.graph import dedup_clusters
from redskins_rule_spark.operators.indexing import with_global_index
from redskins_rule_spark.operators.sampling import budget_waterfill, knuth_hash
from redskins_rule_spark.operators.text import contamination_pairs


class _LazyFaces(dict):
    """Curation output mapping whose expensive faces build on FIRST
    ACCESS. `with_global_index` runs its partition-pinning count jobs
    at CONSTRUCTION time (documented there), so building `kept`
    eagerly taxes callers that only consume `report` — q145 paid the
    full survivor pipeline plus a range shuffle for a frame it never
    touched. Plain dict semantics otherwise; thunk values are built
    once and cached."""

    def __init__(self, thunks=None):
        super().__init__()
        self._thunks = dict(thunks or {})

    def __getitem__(self, key):
        if not super().__contains__(key) and key in self._thunks:
            self[key] = self._thunks.pop(key)()
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key) or key in self._thunks


@dataclass
class CurationConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    lang_col: str = "lang"
    source_col: str = "source"
    min_chars: int = 100
    langs: tuple[str, ...] = ("en", "de", "fr")
    near_dup_n: int = 3
    near_dup_threshold: float = 0.8
    near_dup_max_df: int | None = 64
    decontaminate_min_shared: int = 3
    budget_frac: float | None = None
    extra_quality: list = field(default_factory=list)  # extra Column predicates


def curate_corpus(
    docs: DataFrame,
    config: CurationConfig | None = None,
    benchmark: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Run the curation flow; returns lazy DataFrames:

    kept      — surviving documents (all original columns) + a dense
                `shard_idx` global index ordered by (source, id).
    report    — (stage_id, stage, n_docs) head-counts per stage.
    mixture   — per-source waterfilled budget allocation (only when
                config.budget_frac is set; kept is then filtered by
                each source's deterministic hash-rate).

    Survivor rules are all deterministic: exact dedup keeps the MIN id
    per content hash; near-dup clusters keep the longest doc (ties to
    min id); the budget sampler keeps the hash-smallest fraction.
    """
    cfg = config or CurationConfig()
    i, t = cfg.id_col, cfg.text_col

    stage0 = docs
    keep_len = F.col(t).isNotNull() & (F.length(t) >= cfg.min_chars)
    for extra in cfg.extra_quality:
        keep_len = keep_len & extra
    stage1 = stage0.where(keep_len)
    stage2 = stage1.where(F.col(cfg.lang_col).isin(*cfg.langs))

    exact = dedup_by_content(stage2, t, i, keep="min").select(
        F.col("keep_id").alias(i)
    )
    stage3 = stage2.join(exact, i, "left_semi")

    pairs = ngram_jaccard_pairs_exact(
        stage3, i, t,
        n=cfg.near_dup_n,
        threshold=cfg.near_dup_threshold,
        max_df=cfg.near_dup_max_df,
    ).select("id_a", "id_b")
    # cluster ONCE: dedup_clusters eagerly materializes the pair
    # lineage (pointer-jumping checkpoints), so both the keep-best
    # choice and the loser set must derive from this single frame —
    # calling keep_best_per_cluster separately would run the whole
    # near-dup pipeline a second time.
    cl = dedup_clusters(pairs)
    labeled = cl.join(
        stage3.select(F.col(i).alias("id"), F.length(t).alias("_q")), "id"
    )
    kept_best = labeled.groupBy("cluster_id").agg(
        F.max_by("id", F.struct(F.col("_q"), (-F.col("id")))).alias("kept_id")
    )
    losers = cl.select(F.col("id").alias(i)).join(
        kept_best.select(F.col("kept_id").alias(i)), i, "left_anti"
    )
    stage4 = stage3.join(losers, i, "left_anti")

    if benchmark is not None:
        leaked = contamination_pairs(
            stage4, benchmark, id_col=i, text_col=t,
            min_shared=cfg.decontaminate_min_shared,
        ).select(i).distinct()
        stage5 = stage4.join(leaked, i, "left_anti")
    else:
        stage5 = stage4

    out: dict[str, DataFrame] = _LazyFaces()
    if cfg.budget_frac is not None:
        toks = stage5.select(
            cfg.source_col,
            F.size(F.split(F.trim(F.col(t)), r"\s+")).alias("_t"),
        )
        mixture = budget_waterfill(
            toks, cfg.source_col, "_t", cfg.budget_frac
        )
        out["mixture"] = mixture
        # deterministic per-source rate: keep ids whose spread hash
        # falls under rate * 2^63 — no RNG, replayable on any cluster
        final = (
            stage5.join(F.broadcast(mixture.select(cfg.source_col, "rate")),
                        cfg.source_col)
            .where(
                (knuth_hash(F.col(i)) % F.lit(1_000_000))
                < F.col("rate") * F.lit(1_000_000)
            )
            .drop("rate")
        )
    else:
        final = stage5

    # LAZY face: with_global_index is eager (partition-pinning count
    # jobs at construction) — defer it to first access so report-only
    # consumers never run the survivor pipeline for it
    out._thunks["kept"] = lambda: with_global_index(
        final, [cfg.source_col, i], index_col="shard_idx"
    )

    stages = [
        ("total", stage0), ("len_ok", stage1), ("lang_ok", stage2),
        ("exact_dedup", stage3), ("near_dedup", stage4),
        ("decontaminated", stage5), ("final", final),
    ]
    report = None
    for n, (name, sdf) in enumerate(stages, start=1):
        row = sdf.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(n).alias("stage_id"), F.lit(name).alias("stage"), "n_docs"
        )
        report = row if report is None else report.unionByName(row)
    out["report"] = report
    return out
