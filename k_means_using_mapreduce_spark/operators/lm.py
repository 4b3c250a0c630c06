"""Unigram language-model scoring — the perplexity-filter shape.

CCNet-style corpus filtering scores every document against a language
model and drops the tails (gibberish scores terribly, boilerplate
suspiciously well). The real pipelines use a KenLM 5-gram; the
distributed shape is identical with a unigram model, and a unigram
model is exactly computable — so this module is both a usable
lightweight scorer and the tested scaffolding that a KenLM Pandas UDF
would slot into (swap `score_documents` internals, keep the contract).

Scale notes: the model is a (token, logprob) table of |vocab| rows —
broadcast. Scoring is explode → broadcast-join → per-doc sum: one
shuffle keyed by doc id carrying (id, logprob) pairs. Fitting is one
token-keyed aggregation. Nothing touches the driver except the vocab
size used for smoothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.loaders import fan_out as _fan_out
from ..functions.text import tokens


def fit_unigram_model(
    df: DataFrame, *, text_col: str = "text", alpha: float = 1.0
) -> DataFrame:
    """Unigram logprobs with add-``alpha`` (Laplace) smoothing.

    Returns ``(token, n, logprob)`` where
    ``logprob = ln((n + alpha) / (N + alpha·(V + 1)))`` — the ``+ 1``
    reserves one share of mass for the unknown token, whose logprob is
    ``ln(alpha / (N + alpha·(V + 1)))`` (see :func:`score_documents`).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    counts = (
        _fan_out(df.select(F.col(text_col)))
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = counts.agg(
        F.sum("n").alias("_total"), F.count("*").alias("_vocab")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        "n",
        F.log(
            (F.col("n") + F.lit(alpha))
            / (F.col("_total") + F.lit(alpha) * (F.col("_vocab") + F.lit(1.0)))
        ).alias("logprob"),
    )


def score_documents(
    df: DataFrame,
    model: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document mean token logprob against a fitted model.

    Output: ``(id, n_tokens, logprob_sum, avg_logprob)``; higher
    avg_logprob = more typical of the model corpus. Out-of-vocabulary
    tokens take the reserved unknown mass
    ``ln(alpha / (N + alpha·(V + 1)))``, recomputed exactly from the
    model's integer counts (``alpha`` must match the fit — it is not
    stored in the model table). Documents with no tokens are omitted
    (there is nothing to score).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    unk = model.agg(
        F.log(
            F.lit(alpha)
            / (F.sum("n") + F.lit(alpha) * (F.count("*") + F.lit(1.0)))
        ).alias("unk_logprob")
    )
    pairs = _fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    joined = (
        pairs.join(F.broadcast(model.select("token", "logprob")), "token", "left")
        .crossJoin(F.broadcast(unk))
        .withColumn("_lp", F.coalesce(F.col("logprob"), F.col("unk_logprob")))
    )
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("_lp").alias("logprob_sum"),
        F.avg("_lp").alias("avg_logprob"),
    )


def source_divergence(
    df: DataFrame,
    *,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-distribution drift vs the whole corpus.

    Output: ``(group, n_tokens, entropy, kl_corpus)`` — Shannon entropy
    of the group's unigram distribution and KL(group ‖ corpus), both in
    nats. The pipeline use: a source whose KL spikes is drifting from
    the mix (a scraper broke, a new domain flooded in) — the
    distribution-level complement of per-document LM scoring.

    No smoothing needed: every group token occurs in the corpus by
    construction, so q(t) > 0 wherever p(t) > 0; zero-count terms
    contribute 0 to both sums.

    Scale: one (group, token)-keyed count, a broadcast join of the
    |vocab|-row corpus counts, one group-keyed aggregate.
    """
    pairs = _fan_out(
        df.select(F.col(group_col).alias("grp"), F.col(text_col))
    ).select("grp", F.explode(tokens(F.col(text_col))).alias("token"))
    gcounts = pairs.groupBy("grp", "token").agg(
        F.count("*").cast("long").alias("n")
    )
    corpus = gcounts.groupBy("token").agg(F.sum("n").alias("cn"))
    corpus_total = corpus.agg(F.sum("cn").alias("ct"))
    joined = (
        gcounts.join(F.broadcast(corpus), "token")
        .crossJoin(F.broadcast(corpus_total))
        .withColumn("gt", F.sum("n").over(Window.partitionBy("grp")))
        .withColumn("p", F.col("n") / F.col("gt"))
        .withColumn("q", F.col("cn") / F.col("ct"))
    )
    return joined.groupBy(F.col("grp").alias(group_col)).agg(
        F.first("gt").cast("long").alias("n_tokens"),
        (-F.sum(F.col("p") * F.log("p"))).alias("entropy"),
        F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))).alias("kl_corpus"),
    )


def fit_bigram_model(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Bigram counts: ``(w1, w2, n12, n1)`` where n1 = w1's total count
    AS A PREDECESSOR (Σ_w2 n12 — exactly what conditions P(w2|w1), so
    the conditional always normalizes). One narrow pair-explode + one
    (w1, w2)-keyed aggregate; the n1 margin reuses the same aggregate.
    """
    toks = tokens(F.col(text_col))
    pairs = _fan_out(df.select(F.col(text_col))).select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("p")
    ).select(F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    counts = pairs.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("n12")
    )
    # the bigram-TYPE table is consumed at least twice here (margins +
    # the return join) and up to five more times by the Kneser-Ney /
    # PMI consumers' broadcast builds — each would re-run the corpus
    # pair explode. Materialize the vocab²-bounded table once
    # (guide §5: it is orders smaller than the corpus it came from).
    counts = counts.localCheckpoint(eager=True)
    margins = counts.groupBy("w1").agg(F.sum("n12").alias("n1"))
    return counts.join(F.broadcast(margins), "w1").select("w1", "w2", "n12", "n1")


def score_documents_bigram(
    df: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
    alpha: float = 1.0,
) -> DataFrame:
    """Interpolated-bigram document scoring (Jelinek-Mercer):
    the first token scores ``ln q(w1)`` (unigram, smoothed); every
    following token scores ``ln(λ·n12/n1 + (1−λ)·q(w2))``, where an
    unseen transition or unseen predecessor contributes only the
    backed-off unigram mass — so NEW batches score without special
    cases. Output: ``(id, n_tokens, logprob_sum, avg_logprob)``.

    Plan: one pair-explode of the documents; two broadcast joins
    (|bigram| and |vocab| rows); one doc-keyed sum. Same shuffle
    profile as the unigram scorer, one join wider.
    """
    if not 0 < lam < 1:
        raise ValueError(f"lam must be in (0, 1), got {lam}")
    uni = unigram.select(
        F.col("token").alias("w2"), F.exp("logprob").alias("q2")
    )
    uni_first = unigram.select(
        F.col("token").alias("w1f"), F.col("logprob").alias("lp1")
    )
    unk = unigram.agg(
        F.log(
            F.lit(alpha)
            / (F.sum("n") + F.lit(alpha) * (F.count("*") + F.lit(1.0)))
        ).alias("unk_lp")
    )
    toks = tokens(F.col(text_col))
    base = (
        _fan_out(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), toks.alias("_t"))
        .where(F.size("_t") > 0)
    )
    firsts = (
        base.select(F.col(id_col), F.element_at("_t", 1).alias("w1f"))
        .join(F.broadcast(uni_first), "w1f", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            F.col(id_col), F.coalesce("lp1", F.col("unk_lp")).alias("_lp")
        )
    )
    pairs = base.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select(
        F.col(id_col), F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2")
    )
    scored_pairs = (
        pairs.join(F.broadcast(bigram.select("w1", "w2", "n12", "n1")), ["w1", "w2"], "left")
        .join(F.broadcast(uni), "w2", "left")
        .crossJoin(F.broadcast(unk))
        .select(
            F.col(id_col),
            F.log(
                F.lit(lam)
                * F.coalesce(F.col("n12") / F.col("n1"), F.lit(0.0))
                + F.lit(1.0 - lam) * F.coalesce("q2", F.exp("unk_lp"))
            ).alias("_lp"),
        )
    )
    return (
        firsts.unionByName(scored_pairs)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_lp").alias("logprob_sum"),
            F.avg("_lp").alias("avg_logprob"),
        )
    )


def collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Collocation (phrase) mining by pointwise mutual information:
    for each bigram type, ``pmi = ln(n12·N / (n1·n2))`` — how much more
    often the pair co-occurs than its parts' frequencies predict
    (Church & Hanks 1990). High-PMI pairs are the multi-word units a
    tokenizer or phrase-merger should treat atomically ("new york",
    "machine learning"); the standard corpus-analytics companion to
    the BPE pair statistics (operators/bpe.py::pair_counts, which
    ranks by raw count, not association strength).

    Margins come from the bigram-TYPE table, never the corpus: ``n1``
    = w1's predecessor count (reused from :func:`fit_bigram_model`),
    ``n2`` = w2's successor count, ``N`` = total bigram tokens.
    ``min_count`` prunes the noise floor BEFORE the log (PMI of
    hapax pairs is maximal and meaningless).

    Scale shape: one corpus pair-explode + (w1,w2) aggregate (the
    fit_bigram pass), then margins/total as vocab-sized aggregates of
    that table. Margins broadcast like fit_bigram's — fine to ~1M
    vocab rows; above that, drop the two F.broadcast hints and let
    AQE choose shuffled joins. PMI arithmetic is in doubles
    (``n12·N`` as int64 overflows once N > ~3e9).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    bi = fit_bigram_model(df, text_col=text_col)  # (w1, w2, n12, n1)
    succ = bi.groupBy("w2").agg(F.sum("n12").alias("n2"))
    total = bi.agg(F.sum("n12").cast("double").alias("N"))
    return (
        bi.where(F.col("n12") >= min_count)
        .join(F.broadcast(succ), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            "n2",
            F.log(
                F.col("n12").cast("double")
                * F.col("N")
                / (F.col("n1").cast("double") * F.col("n2"))
            ).alias("pmi"),
        )
    )


def kneser_ney_bigrams(
    df: DataFrame,
    *,
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    1995; Chen & Goodman 1998's benchmark smoother) — per bigram TYPE:

        P_KN(w2|w1) = max(n12 - D, 0)/n1  +  (D·T(w1)/n1) · P_cont(w2)

    with ``T(w1)`` = distinct successor count of w1 (how much
    probability mass the discount frees), and the CONTINUATION
    distribution ``P_cont(w2) = |{w1: n12>0}| / |bigram types|`` —
    how many contexts w2 completes, not how often it occurs: the
    "Francisco" fix (frequent but single-context words stop inheriting
    unigram mass they never earned).

    Output: ``(w1, w2, n12, n1, p_kn)`` for observed bigrams — the
    smoothed replacement for fit_bigram_model's MLE table in
    score_documents_bigram-style scoring; unseen-pair backoff is
    ``(D·T(w1)/n1)·P_cont(w2)`` with the same margins.

    All four statistics are aggregates OF THE BIGRAM-TYPE TABLE
    (vocab-sized, never corpus-sized): successor types per w1,
    predecessor types per w2, total types. One corpus pair pass +
    three type-table aggregates, margins broadcast like
    fit_bigram_model's.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    bi = fit_bigram_model(df, text_col=text_col)  # (w1, w2, n12, n1)
    succ_types = bi.groupBy("w1").agg(
        F.count("*").alias("t1")  # distinct successors of w1
    )
    pred_types = bi.groupBy("w2").agg(
        F.count("*").alias("t2")  # distinct predecessors of w2
    )
    total_types = bi.agg(F.count("*").cast("double").alias("tt"))
    return (
        bi.join(F.broadcast(succ_types), "w1")
        .join(F.broadcast(pred_types), "w2")
        .crossJoin(F.broadcast(total_types))
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            (
                F.greatest(
                    F.col("n12") - F.lit(discount), F.lit(0.0)
                )
                / F.col("n1")
                + (F.lit(discount) * F.col("t1") / F.col("n1"))
                * (F.col("t2") / F.col("tt"))
            ).alias("p_kn"),
        )
    )


def score_documents_kn(
    df: DataFrame,
    kn: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
    unseen_floor: float = 1e-10,
) -> DataFrame:
    """Per-document Kneser-Ney log-likelihood against a fitted
    :func:`kneser_ney_bigrams` table — the smoother's scoring half,
    same output shape as the other scorers:
    ``(id, n_tokens, logprob_sum, avg_logprob)``.

    Per transition (w1, w2):

    - observed pair → ``ln p_kn`` from the table;
    - unseen pair, known context → the backoff mass
      ``(D·T(w1)/n1)·P_cont(w2)``;
    - unknown context → ``P_cont(w2)`` alone;
    - unknown w2 as well → ``unseen_floor`` (keeps ln finite; a real
      deployment holds out mass for it, a filter only needs "very
      unlikely").

    The FIRST token scores ``ln P_cont(w1)`` — the continuation
    distribution is the model's own unigram-like marginal, so scoring
    needs no second model table. ``discount`` must match the fit (it
    is not stored, the alpha convention of :func:`score_documents`).

    All margins (n1, T(w1), T_pred(w2), total types) are re-derived
    from the kn table itself — vocab-sized aggregates, broadcast.
    """
    if not 0.0 < discount < 1.0:
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    if unseen_floor <= 0:
        raise ValueError(f"unseen_floor must be > 0, got {unseen_floor}")
    ctx = kn.groupBy("w1").agg(
        F.first("n1").alias("n1"), F.count("*").alias("t1")
    )
    pred = kn.groupBy("w2").agg(F.count("*").alias("t2"))
    tt = kn.agg(F.count("*").cast("double").alias("tt"))

    toks = tokens(F.col(text_col))
    pairs = df.select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select(id_col, F.col("p")["0"].alias("w1"), F.col("p")["1"].alias("w2"))
    pcont = (F.col("t2") / F.col("tt"))
    backoff = (F.lit(discount) * F.col("t1") / F.col("n1")) * pcont
    pair_lp = (
        pairs.join(F.broadcast(kn.select("w1", "w2", "p_kn")), ["w1", "w2"], "left")
        .join(F.broadcast(ctx), "w1", "left")
        .join(F.broadcast(pred), "w2", "left")
        .crossJoin(F.broadcast(tt))
        .select(
            id_col,
            F.log(
                F.coalesce(
                    F.col("p_kn"),
                    backoff,
                    pcont,
                    F.lit(unseen_floor),
                )
            ).alias("_lp"),
        )
    )
    firsts = (
        df.select(F.col(id_col), F.element_at(toks, 1).alias("w2"))
        .where(F.col("w2").isNotNull())
        .join(F.broadcast(pred), "w2", "left")
        .crossJoin(F.broadcast(tt))
        .select(
            id_col,
            F.log(F.coalesce(pcont, F.lit(unseen_floor))).alias("_lp"),
        )
    )
    return (
        pair_lp.unionByName(firsts)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_lp").alias("logprob_sum"),
            F.avg("_lp").alias("avg_logprob"),
        )
    )


def zipf_fit(
    df: DataFrame, *, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Zipf's-law fit over the corpus token frequencies: OLS of
    ``ln(freq)`` on ``ln(rank)`` — a healthy natural-language corpus
    slopes near −1; templated/boilerplate corpora flatten, gibberish
    steepens. The one-number companion to the unigram model above.

    Rank is frequency-descending with a deterministic token tie-break;
    the window runs over the |vocab|-row frequency table (the corpus
    itself is reduced by one token-keyed aggregation first, the same
    shape as fit_unigram_model). ``min_count`` trims the hapax tail
    where Zipf fits are known to bend.

    Returns one row ``(vocab, slope, intercept, r2)``; slope/r2 NULL
    for degenerate vocabularies (< 2 tokens).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    counts = (
        _fan_out(df.select(F.col(text_col)))
        .select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("freq"))
        .where(F.col("freq") >= min_count)
    )
    ranked = counts.select(
        F.log("freq").alias("y"),
        F.log(
            F.row_number()
            .over(
                Window.orderBy(F.col("freq").desc(), F.col("token"))
            )
            .cast("double")
        ).alias("x"),
    )
    n = F.count(F.lit(1)).cast("double")
    s = ranked.agg(
        F.count(F.lit(1)).alias("vocab"),
        (
            (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / F.nullif(
                n * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x"),
                F.lit(0.0),
            )
        ).alias("slope"),
        F.sum("x").alias("_sx"),
        F.sum("y").alias("_sy"),
        (
            (
                (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
                * (n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            )
            / F.nullif(
                (
                    n * F.sum(F.col("x") * F.col("x"))
                    - F.sum("x") * F.sum("x")
                )
                * (
                    n * F.sum(F.col("y") * F.col("y"))
                    - F.sum("y") * F.sum("y")
                ),
                F.lit(0.0),
            )
        ).alias("r2"),
    )
    return s.select(
        "vocab",
        "slope",
        (
            (F.col("_sy") - F.col("slope") * F.col("_sx"))
            / F.col("vocab").cast("double")
        ).alias("intercept"),
        "r2",
    )


def spectral_token_loading(
    df: DataFrame,
    *,
    text_col: str = "text",
    iters: int = 5,
    min_count: int = 5,
) -> DataFrame:
    """One-dimensional spectral embedding of the vocabulary: the
    dominant eigenvector of the symmetrized PPMI co-occurrence matrix
    by power iteration — the first axis every PMI-SVD embedding
    (word2vec's implicit factorization, Levy & Goldberg 2014) would
    produce, computed with joins instead of a linear-algebra runtime.

    Matrix: the :func:`collocations` bigram PMI table clipped at zero
    (PPMI), symmetrized by summing both directions — one shared pair
    pass with identical margin conventions. Iteration: ``v ← M·v / ‖M·v‖`` — one token-keyed
    join + grouped sum (the matvec) and a 1-row norm broadcast per
    round, lineage kept flat with localCheckpoint (pagerank doctrine).
    From the uniform positive start, Perron-Frobenius keeps every
    iterate non-negative — no eigenvector sign ambiguity.

    Scale: M has |surviving bigrams|·2 rows keyed by token; each round
    shuffles |vocab| partial sums. ``iters`` is the accuracy knob
    (gap^iters convergence), not a data knob.

    Returns ``(token, loading)`` over tokens incident to M; loadings
    are the unit eigenvector entries (larger = more central to the
    corpus's strongest co-occurrence structure).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    # the PPMI weights ARE the collocation scores clipped at zero —
    # one shared pair pass, identical margins convention (and the
    # contract reuses COLLOCATIONS_SQL verbatim for the matrix CTE)
    ppmi = (
        collocations(df, text_col=text_col, min_count=min_count)
        .select(
            "w1", "w2", F.greatest(F.col("pmi"), F.lit(0.0)).alias("m")
        )
        .where(F.col("m") > 0)
    )
    msym = (
        ppmi.select(F.col("w1").alias("u"), F.col("w2").alias("v"), "m")
        .union(
            ppmi.select(F.col("w2").alias("u"), F.col("w1").alias("v"), "m")
        )
        .groupBy("u", "v")
        .agg(F.sum("m").alias("m"))
        .localCheckpoint(eager=True)
    )
    vec = (
        msym.select(F.col("u").alias("token"))
        .distinct()
        .select("token", F.lit(1.0).alias("x"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        mv = (
            msym.join(vec, msym["v"] == vec["token"])
            .groupBy(F.col("u").alias("token"))
            .agg(F.sum(F.col("m") * F.col("x")).alias("x"))
        )
        norm = mv.agg(
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm")
        )
        vec = (
            mv.crossJoin(F.broadcast(norm))
            .select(
                "token",
                (F.col("x") / F.nullif(F.col("nrm"), F.lit(0.0))).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return vec.select("token", F.col("x").alias("loading"))


def vocab_growth(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    milestones: int = 10,
) -> DataFrame:
    """Vocabulary growth curve (Heaps' law view): cumulative distinct
    token types vs cumulative tokens processed, at ``milestones``
    checkpoints of the corpus in ``id_col`` order — "is new data still
    bringing new vocabulary" answered without re-scanning per
    checkpoint. On a Heapsian corpus ``ln(types)`` grows linearly in
    ``ln(tokens)`` with slope β < 1; saturation (β → 0) says the
    crawl is exhausting its domain.

    No global row sort: milestone boundaries are the exact doc-id
    quantiles (one percentile aggregate, broadcast), each doc's bucket
    is "how many cutoffs are below my id" (an array fold — identical
    in DuckDB), a token's FIRST bucket is where it debuts (one
    token-keyed min), and the cumulative curve is a window over the
    ``milestones``-row table.

    Returns per-milestone rows ``(milestone, n_docs, cum_tokens,
    cum_types)`` with milestone 1..``milestones``.
    """
    if milestones < 2:
        raise ValueError(f"milestones must be >= 2, got {milestones}")
    from pyspark.sql.window import Window

    did = F.col(id_col).cast("long")
    docs = df.where(did.isNotNull()).select(
        did.alias("_id"), tokens(F.col(text_col)).alias("_t")
    )
    fr = [i / milestones for i in range(1, milestones)]
    cuts = docs.agg(
        F.percentile(F.col("_id"), F.array(*[F.lit(p) for p in fr])).alias(
            "_cuts"
        )
    )
    bucket = (
        F.aggregate(
            "_cuts",
            F.lit(0),
            lambda acc, c: acc
            + F.when(c < F.col("_id").cast("double"), 1).otherwise(0),
        )
        + F.lit(1)
    ).alias("milestone")
    with_b = docs.crossJoin(F.broadcast(cuts)).select(
        "_id", "_t", bucket
    )
    per_doc = with_b.select(
        "milestone",
        F.size("_t").alias("_n"),
        F.col("_t"),
    )
    tok_stats = per_doc.groupBy("milestone").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").cast("long").alias("toks"),
    )
    debut = (
        with_b.select("milestone", F.explode("_t").alias("token"))
        .groupBy("token")
        .agg(F.min("milestone").alias("milestone"))
        .groupBy("milestone")
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    joined = tok_stats.join(debut, "milestone", "left").select(
        "milestone",
        "n_docs",
        "toks",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    w = Window.orderBy("milestone").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "milestone",
        "n_docs",
        F.sum("toks").over(w).alias("cum_tokens"),
        F.sum("new_types").over(w).alias("cum_types"),
    )
