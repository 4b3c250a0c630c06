"""Byte-pair-encoding vocabulary induction over a distributed corpus.

Tokenizer training (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") is a standard step of an LLM data
pipeline, and its distributed shape is instructive: the corpus-sized
work is exactly ONE aggregation — the word-frequency histogram — and
every merge iteration after that runs on the histogram, whose size is
bounded by *distinct* words (Heap's law: sublinear in corpus size),
not by the corpus. So the Spark plan is:

1. ``word_counts`` — tokenize (narrow, codegen) → one map-side
   combined aggregation keyed on the word. At 100 TB this is the only
   pass over the data; the output is vocab-sized.
2. ``pair_counts`` — symbol-bigram statistics of the CURRENT
   segmentation, weighted by word frequency. Iteration 0 (chars) is a
   pure-SQL explode + aggregation and is the oracle-checked contract.
3. ``bpe_train`` — collects the histogram (capped at ``max_words`` by
   frequency — the driver-side guard; real tokenizers train on the
   top few hundred thousand words) and runs the classic greedy merge
   loop in plain Python. K merges over a V-word dict is driver-cheap;
   distributing it would shuffle the whole histogram K times for no
   benefit. This is the same partition of labor as kmeans_fit: cluster
   for the data-sized pass, driver for the model-sized loop.
4. ``encode_token_counts`` — applies a trained merge table to score
   the corpus (tokens-per-document). Encoding is inherently
   procedural, so it runs as an Arrow-batched pandas iterator
   (``mapInPandas``) with a per-batch memo cache — the sanctioned slow
   path, never row-at-a-time Python.

Reference scope note: the reference engine (K-Means over CSV points,
`master.py:27-150`) has no text surface; this extends the corpus
toolkit the builder's brief layers on top.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def word_counts(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """``(word, n)`` distinct-word histogram — the single corpus pass.

    One shuffle keyed on the word with map-side partial counts; the
    result is vocab-sized (distinct words), the unit every later BPE
    stage operates on.
    """
    from ..sources.loaders import fan_out

    return (
        fan_out(df.select(F.col(text_col)))
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def pair_counts(
    wc: DataFrame, *, top_k: int | None = None
) -> DataFrame:
    """Adjacent-character pair counts of the char-level segmentation,
    weighted by word frequency: the statistic BPE's first merge
    maximizes. ``(pair, n_pairs)`` with ``pair = 'a b'``.

    Input is the vocab-sized histogram, so the explode factor is
    word-length over *distinct* words — corpus size never re-enters.
    Single-character words contribute no pairs. Deterministic order:
    ties break on the pair string ascending.
    """
    w = F.col("word")
    idx = F.when(
        F.length(w) >= 2, F.sequence(F.lit(1), F.length(w) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = wc.select(
        F.explode(idx).alias("i"), w.alias("word"), F.col("n")
    ).select(
        F.concat(
            F.substring(F.col("word"), F.col("i"), 1),
            F.lit(" "),
            F.substring(F.col("word"), F.col("i") + 1, 1),
        ).alias("pair"),
        F.col("n"),
    )
    out = pairs.groupBy("pair").agg(F.sum("n").alias("n_pairs"))
    if top_k is not None:
        out = out.orderBy(F.desc("n_pairs"), F.asc("pair")).limit(top_k)
    return out


def _merge_pair(symbols: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """One left-to-right merge pass of ``pair`` over a symbol tuple."""
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 32,
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """Greedy BPE merge table learned from the corpus.

    Returns ``num_merges`` merges in learned order. The distributed
    part is ``word_counts`` (one pass); the driver collects at most
    ``max_words`` (by frequency, ties on the word ascending so retries
    and repartitioning cannot change the training set) and iterates in
    memory. Ties between candidate pairs break on the pair ascending —
    fully deterministic, so two runs (or a resume) produce an
    identical table.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    rows = (
        word_counts(df, text_col=text_col)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]): int(r["n"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        # deterministic: highest count, then lexicographically-smallest pair
        top_n = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top_n)
        merges.append(best_pair)
        vocab = {
            _merge_pair(syms, best_pair): n for syms, n in vocab.items()
        }
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table (lowest rank first)."""
    syms: tuple[str, ...] = tuple(word)
    while len(syms) > 1:
        candidates = [
            (ranks[p], p)
            for p in set(zip(syms, syms[1:]))
            if p in ranks
        ]
        if not candidates:
            break
        _, pair = min(candidates)
        syms = _merge_pair(syms, pair)
    return list(syms)


def encode_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts ``(id, n_bpe_tokens)``.

    The realistic "how many tokens is my corpus" pass: Arrow-batched
    ``mapInPandas`` with a per-task memo (word → token count), so each
    distinct word in a batch is encoded once. Zero shuffle — a narrow
    map over the scan; parallelism = input partitions.
    """
    ranks = {p: i for i, p in enumerate(merges)}
    schema = "id long, n_bpe_tokens long"
    cols = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )

    def _encode(batches: "Iterator") -> "Iterator":
        import pandas as pd

        memo: dict[str, int] = {}

        def n_tokens(ws: list[str]) -> int:
            total = 0
            for wrd in ws:
                hit = memo.get(wrd)
                if hit is None:
                    hit = len(encode_word(wrd, ranks))
                    memo[wrd] = hit
                total += hit
            return total

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bpe_tokens": pdf["toks"].map(n_tokens).astype("int64"),
                }
            )

    return cols.mapInPandas(_encode, schema=schema)
