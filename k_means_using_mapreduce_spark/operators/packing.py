"""Context-window chunking and sequence packing — training-batch
construction for LLM data pipelines.

After filtering/dedup, a corpus becomes model input two ways:
long documents are SPLIT into context-window-sized chunks, and short
ones are PACKED together so a batch wastes no tokens as padding. Both
operators here are deterministic (re-runs and stage retries produce
identical batches — same doctrine as operators/sampling.py) and
express entirely in built-in functions.

Scale notes: chunking is a per-row transform + posexplode (narrow, no
shuffle). Packing needs a running total, which is a window — and a
GLOBAL window is a single-task scan at 100 TB, so packing is sharded:
each shard packs independently (one window per shard partition), and
the shard key comes from the id, not ``rand()``, so a retried task
re-packs identically. Real pipelines pack per-shard/per-file exactly
this way; cross-shard waste is bounded by shards × (budget − 1) tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 32,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into consecutive ``chunk_tokens``-token
    chunks: (id, chunk_seq, chunk_text, n_tokens); the final chunk
    keeps the remainder (no padding here — that's the trainer's job).
    Token-less documents produce no chunks.

    Narrow plan: tokens projected once, chunk index list built with
    ``sequence``, one Generate (posexplode) — no shuffle, no UDF."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    toked = df.select(
        F.col(id_col).alias(id_col), tokens(content_col).alias("_toks")
    ).where(F.size("_toks") > 0)
    chunks = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size("_toks") / chunk_tokens).cast("int") - 1),
        lambda i: F.array_join(
            F.slice(F.col("_toks"), i * chunk_tokens + 1, chunk_tokens), " "
        ),
    )
    return toked.select(
        id_col, F.posexplode(chunks).alias("chunk_seq", "chunk_text")
    ).withColumn("n_tokens", token_count("chunk_text"))


def pack_documents(
    df: DataFrame,
    budget_tokens: int = 256,
    shards: int = 8,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign every document to a (shard, bin) so each bin's token
    total approaches ``budget_tokens``: contiguous greedy packing in
    ascending-id order within each shard — ``bin = floor(running_total
    / budget)`` where the running total EXCLUDES the current document,
    so a document straddling a boundary starts the next fill but bins
    can exceed budget by at most that one document (the standard
    streaming-packing bound; exact bin packing is NP-hard and
    order-dependent).

    Shard = ``id mod shards``: deterministic, retry-stable, and the
    window partitions by it so no single task sees the whole corpus.
    Output: (id, shard, bin, n_tokens)."""
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    sized = df.select(
        F.col(id_col).alias(id_col),
        token_count(content_col).alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("int").alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sized.select(
        id_col,
        "shard",
        F.floor(pre / budget_tokens).cast("int").alias("bin"),
        "n_tokens",
    )


def pack_summary(packed: DataFrame) -> DataFrame:
    """Per-(shard, bin) fill report: document count and token total —
    the padding-waste audit a packing run ships with."""
    return packed.groupBy("shard", "bin").agg(
        F.count("*").cast("int").alias("n_docs"),
        F.sum("n_tokens").cast("int").alias("total_tokens"),
    )


def epoch_shuffle(
    df: DataFrame,
    seed: int,
    shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for a training epoch: every row
    gets an ``epoch_pos`` rank and a balanced ``shard``, both pure
    functions of ``(seed, id)`` — a new seed is a new permutation, the
    same seed is byte-identical on every run, task retry, and cluster
    size (the ``rand()``-free doctrine of operators/sampling.py; a
    non-reproducible shuffle makes training runs unrepeatable and
    mid-epoch resume impossible).

    Plan: one md5 projection (the order key), the shard derived from
    the key's leading hex (not ``repartitionByRange``, whose sampled
    boundaries depend on the input's physical layout), then ONE
    shard-keyed exchange whose window sorts by key and ranks — no
    global single-task sort anywhere. Readers stream shards in
    ``(shard, epoch_pos)`` order for the full permutation; per-shard
    row counts concentrate around N/shards (hash-uniform).

    Output: input columns + ``(shard, epoch_pos)``.
    """
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    key = F.md5(F.concat_ws("\x1f", F.lit(int(seed)), F.col(id_col)))
    with_key = df.withColumn("_ek", key).withColumn(
        "shard",
        F.pmod(F.conv(F.substring("_ek", 1, 8), 16, 10).cast("long"), F.lit(shards))
        .cast("int"),
    )
    w = Window.partitionBy("shard").orderBy("_ek")
    return with_key.withColumn("epoch_pos", F.row_number().over(w)).drop("_ek")
