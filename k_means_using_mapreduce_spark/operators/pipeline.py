"""End-to-end corpus preparation: the composed training-data pipeline.

Every stage exists as an individually oracle-checked operator; this
module wires them in the order production pipelines run them
(RefinedWeb §3, Dolma §2, FineWeb): clean → quality-gate → exact dedup
→ near dedup → decontaminate → mixture-sample. A ``CorpusReport``
records per-stage row/token counts so a run is auditable — at 100 TB
the first question is always "which stage dropped how much".

Scale posture is inherited from the stages (each documented in its own
module); the composition adds nothing wider than what its stages do.
All stages compose lazily except ``near_dedup``, which materializes
its shared shingle relation internally (a deliberate localCheckpoint —
see operators/dedup_pipeline.py). Stage counts are optional
(``report=True`` forces one count action per stage; leave False in
production and count once at the sink).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_ish_token_count, quality_score
from .cleaning import (
    apply_mixture,
    decontaminate,
    mixture_plan,
    pii_redact_expr,
)
from .dedup import dedup_exact
from .dedup_pipeline import near_dedup


@dataclass
class PipelineConfig:
    """Knobs for :func:`prepare_corpus`; defaults mirror the individual
    operators' defaults."""

    min_quality: float = 0.5
    shingle_n: int = 3
    num_hashes: int = 12
    bands: int = 4
    jaccard_threshold: float = 0.7
    contamination_threshold: float = 0.1
    mixture_weights: dict[str, float] | None = None
    mixture_budget_frac: float = 1.0  # 1.0 = keep everything that survived
    redact_pii: bool = True


@dataclass
class CorpusReport:
    """Per-stage survivor counts (rows); filled when ``report=True``."""

    stages: list[tuple[str, int]] = field(default_factory=list)

    def add(self, name: str, n: int) -> None:
        self.stages.append((name, n))


def prepare_corpus(
    df: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    config: PipelineConfig | None = None,
    content_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    report: bool = False,
) -> tuple[DataFrame, CorpusReport]:
    """Run the full preparation pipeline; returns ``(clean_corpus,
    report)``. The output keeps ``(id, source, text, n_tokens)`` where
    ``text`` is the (optionally PII-redacted) surviving content.

    Stage order matters and mirrors production practice: redaction
    first (later hashes must see final text, or a re-run after
    redaction would un-dedup), quality gate before the quadratic-ish
    dedup stages (cheapest filter drops the most rows first), exact
    dedup before MinHash (no point signature-hashing byte-identical
    copies), decontamination after dedup (eval overlap checked once
    per surviving representative), mixture sampling last (rates are
    computed over the clean pool).
    """
    cfg = config or PipelineConfig()
    rep = CorpusReport()

    from ..sources.loaders import fan_out

    # fan_out: the redaction regex chain + quality score below are the
    # pipeline's per-row CPU front door; on a single-row-group scan they
    # run in one task (guide §2.5; no-op at real scale)
    cur = fan_out(
        df.select(
            F.col(id_col).alias(id_col),
            F.col(source_col).alias(source_col),
            F.col(content_col).alias(content_col),
        )
    )
    if report:
        rep.add("input", cur.count())

    if cfg.redact_pii:
        # attach the redacted text INLINE: pii_redact is a zero-shuffle
        # projection of this same relation, so the old join-back was a
        # corpus self-join moving every document's text through an
        # exchange for nothing (round-10; the contract oracle redacts
        # inline too)
        cur = cur.withColumn(content_col, pii_redact_expr(content_col))

    cur = cur.where(quality_score(content_col) >= F.lit(cfg.min_quality))
    # materialize once: every later stage re-reads this relation several
    # times (exact-dedup join-back, near-dedup's two passes,
    # decontamination, the final projection) — without a cut here the
    # regex-redaction + quality-score expression chain re-executes in
    # each consumer (measured 25 s -> 16 s at sf0.1). localCheckpoint
    # also severs lineage so the downstream near-dedup/CC iterations
    # re-plan from a compact scan, the dedup_pipeline.py doctrine.
    cur = cur.localCheckpoint()
    if report:
        rep.add("quality_gate", cur.count())

    survivors = dedup_exact(cur, content_col, id_col).select(id_col)
    cur = cur.join(survivors, id_col, "left_semi")
    if report:
        rep.add("exact_dedup", cur.count())

    # tokenize the corpus ONCE: near-dedup (LSH + verify) and
    # decontamination all consume this one materialized (id, shingle)
    # relation instead of re-exploding the text per stage
    from .dedup import shingle_rows

    sh_all = shingle_rows(cur, content_col, id_col, cfg.shingle_n).localCheckpoint()

    cur = near_dedup(
        cur,
        content_col,
        id_col,
        shingle_n=cfg.shingle_n,
        num_hashes=cfg.num_hashes,
        bands=cfg.bands,
        jaccard_threshold=cfg.jaccard_threshold,
        shingles_df=sh_all,
    ).drop("dup_group_size")
    # the survivor set is consumed twice downstream (decontamination's
    # train-side semi-join AND the final projection); without a cut the
    # near-dedup tail re-executes in each consumer (~15% of pipeline
    # wall-clock at sf0.1)
    cur = cur.localCheckpoint()
    if report:
        rep.add("near_dedup", cur.count())

    if eval_df is not None:
        contaminated = (
            decontaminate(
                cur,
                eval_df,
                content_col=content_col,
                id_col=id_col,
                shingle_n=cfg.shingle_n,
                threshold=cfg.contamination_threshold,
                train_shingles_df=sh_all.join(
                    cur.select(id_col), id_col, "left_semi"
                ),
            )
            .where(F.col("is_contaminated"))
            .select(id_col)
        )
        cur = cur.join(contaminated, id_col, "left_anti")
        if report:
            rep.add("decontaminated", cur.count())

    if cfg.mixture_budget_frac < 1.0 or cfg.mixture_weights is not None:
        plan = mixture_plan(
            cur,
            source_col=source_col,
            content_col=content_col,
            weights=cfg.mixture_weights,
            budget_frac=cfg.mixture_budget_frac,
        )
        cur = apply_mixture(cur, plan, key=id_col, source_col=source_col)
        if report:
            rep.add("mixture_sampled", cur.count())

    out = cur.withColumn("n_tokens", bpe_ish_token_count(content_col))
    return out, rep
