"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

North-star extension (BASELINE.json): the reference has no dedup at all;
these are the operators a 100 TB training-data pipeline runs before the
reference's clustering core. All hot paths are built-in expressions
(JVM/codegen); nothing here uses a Python UDF.

Determinism: every hash bottoms out in md5 (both Spark and DuckDB
expose md5 as lowercase hex), so the contract oracle can reproduce
signatures bit-for-bit. MinHash hashes each shingle once (md5 → int64)
and derives the H hash-family members with exact-int64 affine mixes
(a·x+b mod 2^31-1) — engine-portable where murmur/xxhash seeds are not.

Scale notes per operator are in the docstrings; the recurring theme:
shuffle keys are short hashes (16-64 B), never full documents, and every
self-join is banded/bucketed so the worst case is per-bucket quadratic,
not global quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F

from ..functions.text import fingerprint, normalized_text, shingles, shingles_of, tokens


def shingle_rows(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh) rows — one per shingle occurrence.

    Two-step shape on purpose: tokens are projected as a real column
    first, and the explode lives in a separate Generate operator, so
    the token split runs once per document. Inlining
    ``explode(shingles(text))`` re-evaluates the split per reference
    inside the when-chain (no CSE across higher-order functions) —
    measured ~8× slower at sf0.1.
    """
    from ..sources.loaders import fan_out

    # tokenization + shingle assembly is the dominant per-row CPU of
    # every consumer (minhash, jaccard, containment, overlap); spread
    # the (id, text) projection before it (guide §2.5 — single-row-
    # group scans otherwise tokenize on one core; no-op when wide)
    return fan_out(df.select(F.col(id_col).alias(id_col), F.col(content_col))).select(
        F.col(id_col).alias(id_col), tokens(content_col).alias("_toks")
    ).select(
        id_col, F.explode(shingles_of(F.col("_toks"), shingle_n)).alias("sh")
    )


def md5_int60(col) -> "F.Column":
    """First 15 hex chars of md5 as int64 (60 bits) — the engine-portable
    string→int hash (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: one surviving row per distinct content, keeping the
    lowest id; ``n_copies`` counts the group.

    groupBy on ``sha2(content)`` (32 B) rather than the content itself, so
    the shuffle carries hashes, not documents — at 100 TB the difference
    between shuffling 64 B/row and shuffling whole documents.
    """
    return (
        df.select(id_col, F.sha2(F.col(content_col), 256).alias("_h"))
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .drop("_h")
    )


def dedup_exact_normalized(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup after text normalization (case/punct/whitespace
    folding) — catches trivially-reformatted copies."""
    return (
        df.select(id_col, fingerprint(content_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "fp", "n_copies")
    )


def dedup_incremental(
    batch: DataFrame,
    corpus: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental ingestion dedup: from a new ``batch``, keep one row
    per normalized fingerprint that does NOT already exist in
    ``corpus`` (lowest id wins within the batch). Output:
    (id, fp, n_copies_in_batch).

    This is the per-batch shape of a continuously-ingesting pipeline:
    the corpus side reduces to DISTINCT 32-char fingerprints before the
    anti-join, so the join shuffles fingerprints only — at 100 TB the
    corpus fingerprint set is what you'd persist (bucketed on fp, see
    sources/sinks.py::write_bucketed_table) and the anti-join
    co-partitions with it instead of rescanning raw documents.
    """
    fresh = batch.select(
        id_col, fingerprint(content_col).alias("fp")
    ).join(
        corpus.select(fingerprint(content_col).alias("fp")).distinct(),
        "fp",
        "left_anti",
    )
    return fresh.groupBy("fp").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_copies_in_batch")
    ).select(id_col, "fp", "n_copies_in_batch")


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------

#: Mersenne prime 2^31-1 — the universal-hash modulus. a·x+b with
#: a, b, x < 2^31 stays under 2^62, so the arithmetic is exact int64 in
#: both Spark and DuckDB (no wraparound, no HUGEINT promotion).
MINHASH_P = 2147483647

#: Fixed affine constants (a_h, b_h), h = 0..15 — generated once with
#: random.Random(20260813) and frozen as literals so both engines and
#: every session agree.
MINHASH_AFFINE: list[tuple[int, int]] = [
    (2128164061, 398802782), (596987483, 1147225393),
    (1916785055, 1479347476), (972347433, 116450322),
    (291219901, 430979121), (234034475, 1406942087),
    (1761180996, 1267685540), (924035317, 1172698795),
    (2038977239, 402639405), (2143289124, 1357670270),
    (1355823819, 2113210625), (668925749, 252657889),
    (1177825180, 428031840), (1696544698, 230896653),
    (794664036, 1758809000), (1480032976, 858479239),
]


def minhash_signature(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    shingle_n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Per-document MinHash signature with a universal affine hash
    family: each shingle is hashed ONCE (md5 → first 15 hex chars →
    int64 → mod P), then ``sig[h] = min over shingles of
    (a_h·x + b_h) mod P`` for fixed constants :data:`MINHASH_AFFINE`
    and Mersenne prime :data:`MINHASH_P`.

    Output: (id, sig: array<bigint> length H).

    One md5 per shingle instead of H (the round-1 form salted md5 per
    hash — 12× the hashing for the same LSH quality), and the shuffle
    carries H×8 B ints per document instead of H×32 B hex strings.
    All arithmetic is exact int64 in Spark and DuckDB, so the oracle
    reproduces signatures bit-for-bit.

    Physical shape: explode shingles → 1 md5 + H affine columns →
    ``groupBy(id).agg(min...)`` with map-side partial aggregation.
    (A single-projection nested-``transform`` variant re-inlines the
    whole shingle expression tree once per salt — Catalyst does not CSE
    across higher-order functions — and was ~20× slower; the explode
    computes shingles once.)
    """
    if num_hashes > len(MINHASH_AFFINE):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the {len(MINHASH_AFFINE)} "
            "frozen MINHASH_AFFINE constants"
        )
    sh_rows = (
        shingles_df
        if shingles_df is not None
        else shingle_rows(df, content_col, id_col, shingle_n)
    )
    # NB: single-parameter lambdas only inside transform/filter —
    # PySpark passes the array index to a second parameter.
    x = (
        F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10).cast("bigint")
        % MINHASH_P
    )
    hashed = sh_rows.select(
        id_col,
        *[
            ((F.lit(a) * x + F.lit(b)) % MINHASH_P).alias(f"h{h}")
            for h, (a, b) in enumerate(MINHASH_AFFINE[:num_hashes])
        ],
    )
    agg = hashed.groupBy(id_col).agg(
        *[F.min(f"h{h}").alias(f"s{h}") for h in range(num_hashes)]
    )
    sig = F.array(*[F.col(f"s{h}") for h in range(num_hashes)])
    return agg.select(F.col(id_col).alias(id_col), sig.alias("sig"))


def minhash_bands(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; band key = md5 of the concatenated band
    slice. Output: (id, band_idx, band_key) — the shuffle key for the
    candidate join is a 32-char hash regardless of document size."""
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    rows_per_band = num_hashes // bands
    sig_df = minhash_signature(
        df, content_col, id_col, num_hashes, shingle_n, shingles_df
    )
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig_df.select(
        id_col, F.explode(band_entries).alias("band")
    ).select(id_col, F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key"))


def minhash_candidate_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    bands: int = 4,
    shingle_n: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Near-dup candidates: pairs sharing ≥1 LSH band. Equi-join on
    (band_idx, band_key) — per-bucket quadratic only. Distinct pairs,
    a < b."""
    b = minhash_bands(
        df, content_col, id_col, num_hashes, bands, shingle_n, shingles_df
    )
    left = b.select(F.col(id_col).alias("id_a"), "band_idx", "band_key")
    right = b.select(F.col(id_col).alias("id_b"), "band_idx", "band_key")
    return (
        left.join(right, ["band_idx", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", bits: int = SIMHASH_BITS
) -> DataFrame:
    """Charikar SimHash over tokens: token hash = first 15 hex chars of
    md5 (60 bits, engine-portable); bit b of the output is the sign of
    Σ_tokens (2·bit_b(hash) − 1). Output: (id, simhash: bigint).

    Pure integer arithmetic end-to-end — bit-identical in any engine.
    One explode + one groupBy; the aggregate is ``bits`` conditional
    sums, combined map-side.
    """
    from ..functions.text import tokens

    tok = df.select(
        F.col(id_col).alias(id_col), F.explode(tokens(content_col)).alias("tok")
    ).withColumn(
        "h", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    )
    bit_sums = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2 ** b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(id_col, sim.cast("bigint").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Scale path: band the simhash into ``bits/band_bits`` chunks — two
    docs within hamming h share at least one identical chunk when
    chunks > h (pigeonhole), so the join is equi on (chunk_idx, chunk),
    then the exact popcount filter runs per candidate."""
    s = simhash(df, content_col, id_col, bits)
    n_chunks = bits // band_bits
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col("simhash"), c * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("chunk"),
            )
            for c in range(n_chunks)
        ]
    )
    banded = s.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.chunk_idx").alias("chunk_idx"), F.col("c.chunk").alias("chunk")
    )
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sim_a"), "chunk_idx", "chunk"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sim_b"), "chunk_idx", "chunk"
    )
    xor = F.col("sim_a").bitwiseXOR(F.col("sim_b"))
    hamming = F.bit_count(xor)
    return (
        left.join(right, ["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# n-gram Jaccard
# --------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs ≥ threshold.

    explode distinct shingles → self equi-join on shingle → intersection
    counts → |A∪B| = |A|+|B|−|A∩B|. The join key is a shingle string;
    hot shingles fan out quadratically, so at scale this runs *after*
    LSH candidate generation (minhash_candidate_pairs) — here it is also
    exposed standalone as the exact verifier.

    ``max_doc_freq`` (scale knob): drop shingles appearing in more than
    that many documents *from the join only* (a boilerplate shingle in
    10^6 docs would alone produce 10^12 join rows). Document sizes
    still count every shingle, so the resulting jaccard is a lower
    bound — standard practice for web-scale dedup; leave None for the
    exact (oracle-checked) semantics.
    """
    # join/dedup on the 60-bit md5-derived int, not the shingle string:
    # the distinct + self-join shuffles then carry 8 B keys instead of
    # ~20-30 B strings with cheaper comparisons (~2× at sf0.1). The
    # oracle hashes identically, so even the ~2^-60 collision case is
    # bit-identical across engines.
    sh = (
        shingles_df
        if shingles_df is not None
        else shingle_rows(df, content_col, id_col, shingle_n)
    )
    sh = sh.select(id_col, md5_int60(F.col("sh")).alias("sh")).distinct()
    # three consumers (sizes + both self-join sides) would each re-run
    # the tokenize+md5+distinct pipeline — materialize the (id, 8 B
    # hash) set once (guide §5: reuse beats recompute; it is orders
    # smaller than the documents it came from)
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("sh")
        )
        sh = sh.join(rare, "sh", "left_semi")
    left = sh.select(F.col(id_col).alias("id_a"), "sh")
    right = sh.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        left.join(right, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Shingle-containment pairs: unordered (id_a < id_b) pairs where
    ``max(|A∩B|/|A|, |A∩B|/|B|)`` ≥ threshold, with both directed
    containments in the output.

    Catches the asymmetric near-dups symmetric Jaccard misses: a short
    document quoted whole inside a much longer one has Jaccard
    ≈ |A|/|B| (tiny) but containment(A→B) ≈ 1 — the quote-expansion /
    boilerplate-wrapper case every web-dedup pipeline special-cases
    (Broder 1997 §4 distinguishes resemblance from containment for
    exactly this reason).

    Same scale shape as :func:`jaccard_pairs` (shared intersection
    plan, 8 B md5-int60 join keys, ``max_doc_freq`` hot-shingle cap for
    the post-LSH regime); one extra projection, no extra shuffle.
    """
    sh = (
        shingles_df
        if shingles_df is not None
        else shingle_rows(df, content_col, id_col, shingle_n)
    )
    sh = sh.select(id_col, md5_int60(F.col("sh")).alias("sh")).distinct()
    # three consumers (sizes + both self-join sides) would each re-run
    # the tokenize+md5+distinct pipeline — materialize the (id, 8 B
    # hash) set once (guide §5: reuse beats recompute; it is orders
    # smaller than the documents it came from)
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    if max_doc_freq is not None:
        rare = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("sh")
        )
        sh = sh.join(rare, "sh", "left_semi")
    left = sh.select(F.col(id_col).alias("id_a"), "sh")
    right = sh.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        left.join(right, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("containment_a", F.col("n_inter") / F.col("n_a"))
        .withColumn("containment_b", F.col("n_inter") / F.col("n_b"))
        .filter(
            F.greatest(F.col("containment_a"), F.col("containment_b"))
            >= F.lit(threshold)
        )
        .select("id_a", "id_b", "containment_a", "containment_b")
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------


def embedding_near_dup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact cosine near-dup pairs ≥ threshold via self-join.

    O(N²) — correct baseline and the oracle-checkable form. The scale
    path is :func:`embedding_near_dup_bucketed`, which first coarse-
    quantizes with the K-Means core so candidates only meet within a
    centroid bucket.
    """
    from ..functions.vectors import dot_expr, l2_norm_expr

    # Precompute each row's norm once (N sqrt-folds instead of N²) and
    # drop zero-norm vectors up front — they can never clear a positive
    # threshold, and excluding them keeps the pair expression a single
    # guard-free dot/(na*nb), bit-identical to the oracle SQL. 4× faster
    # than folding norms per pair at sf0.1.
    feats = df.select(
        F.col(id_col).alias(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("n", l2_norm_expr(F.col("v"))).filter(F.col("n") > 0)
    a = feats.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = feats.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    cos = dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def bucketed_features(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, features, cid, n)`` — each vector with its nearest-
    centroid bucket and L2 norm (zero-norm rows kept; the pair stage
    excludes them since cosine is undefined there). The shared first
    stage of the bucketed near-dup family: callers that need the
    assignment MORE than once (semantic dedup reuses it for both pair
    sides and the survivor join) should materialize this frame once
    (``localCheckpoint``) instead of letting each branch re-evaluate
    the K-distance projection over the full scan."""
    from ..functions.vectors import l2_norm_expr
    from .kmeans import assign

    feats = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("features"),
    )
    return assign(feats, centroids, keep_dist=False).withColumn(
        "n", l2_norm_expr(F.col("features"))
    )


def pairs_from_bucketed(bucketed: DataFrame, threshold: float) -> DataFrame:
    """Within-bucket cosine pairs ``(id_a, id_b, cosine)`` over a
    :func:`bucketed_features` frame — the per-cluster quadratic join,
    never all-pairs."""
    from ..functions.vectors import dot_expr

    bucketed = bucketed.filter(F.col("n") > 0)
    a = bucketed.select(
        F.col("id").alias("id_a"), F.col("features").alias("va"), F.col("n").alias("na"), "cid"
    )
    b = bucketed.select(
        F.col("id").alias("id_b"), F.col("features").alias("vb"), F.col("n").alias("nb"), "cid"
    )
    cos = dot_expr(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def pairs_from_bucketed_gemm(
    bucketed: DataFrame, threshold: float, block_size: int = 4096
) -> DataFrame:
    """Within-bucket pair MEMBERSHIP ``(id_a, id_b)`` via per-cluster
    blocked GEMM — the fast kernel behind semantic dedup's pair stage.

    Same candidate space as :func:`pairs_from_bucketed` (per-cluster
    only, zero-norm rows excluded, ``id_a < id_b``), but the inner
    loop is one float64 matrix multiply per (cluster, block-pair)
    ``applyInPandas`` group instead of an interpreted fold per pair —
    ~3× faster at 2k×64 and the gap widens with cluster size. Clusters
    larger than ``block_size`` tile into block pairs exactly like
    :func:`embedding_near_dup_gemm`, bounding per-group memory.

    Emits ids ONLY: np.dot's pairwise summation deviates from the
    expression fold by ulps, so callers that publish cosine VALUES
    (the near-dup-pairs contracts) use the expression path; callers
    that only consume membership (semantic dedup's drop set) take this
    one. A threshold comparison can only flip for a pair within ~1e-14
    of the threshold — never observed on real corpora.

    Requires a numeric id (cast to long for the min/max pair ordering).
    Norms come from the bucketed frame's exact fold, so only the dot
    differs from the oracle arithmetic.
    """
    import math

    spark = bucketed.sparkSession
    feats = bucketed.filter(F.col("n") > 0).select(
        F.col("id").cast("long").alias("id"), "features", "n", "cid"
    )
    n_rows = feats.count()
    if n_rows == 0:
        return _k_row_df(spark, [], "id_a long, id_b long")
    n_blocks = max(1, math.ceil(n_rows / block_size))
    feats = feats.withColumn("blk", F.pmod(F.hash("id"), F.lit(n_blocks)))
    # diag marks self-block groups: an off-diagonal group whose 'b'
    # side is empty for some cluster must yield NO pairs (its 'a' rows'
    # self-pairs belong to the diagonal group), so the kernel cannot
    # infer the mode from emptiness alone.
    rep_rows = []
    pid = 0
    for i in range(n_blocks):
        for j in range(i, n_blocks):
            rep_rows.append((i, pid, "a", j == i))
            if j != i:
                rep_rows.append((j, pid, "b", False))
            pid += 1
    rep = _k_row_df(spark, 
        rep_rows, "blk int, pid int, role string, diag boolean"
    )

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
        )
        a = pdf[pdf["role"] == "a"]
        b = pdf[pdf["role"] == "b"]
        if not len(a):
            return empty
        ids_a = a["id"].to_numpy()
        A = np.asarray(list(a["features"]), dtype=np.float64)
        na = a["n"].to_numpy()
        if bool(pdf["diag"].iat[0]):
            C = (A @ A.T) / np.outer(na, na)
            ii, jj = np.nonzero(np.triu(C >= threshold, k=1))
            ia, ib = ids_a[ii], ids_a[jj]
        elif len(b):
            ids_b = b["id"].to_numpy()
            B = np.asarray(list(b["features"]), dtype=np.float64)
            nb = b["n"].to_numpy()
            C = (A @ B.T) / np.outer(na, nb)
            ii, jj = np.nonzero(C >= threshold)
            ia, ib = ids_a[ii], ids_b[jj]
        else:
            return empty
        return pd.DataFrame(
            {"id_a": np.minimum(ia, ib), "id_b": np.maximum(ia, ib)}
        )

    return (
        feats.join(F.broadcast(rep), "blk")
        .groupBy("cid", "pid")
        .applyInPandas(kernel, "id_a long, id_b long")
    )


def embedding_near_dup_bucketed(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Scale path: assign each vector to its nearest K-Means centroid
    (narrow projection), then compare only within buckets. Misses
    cross-bucket pairs near boundaries — the standard IVF recall
    trade-off; raise K or multi-probe for higher recall."""
    bucketed = bucketed_features(df, centroids, vec_col=vec_col, id_col=id_col)
    return pairs_from_bucketed(bucketed, threshold)


def embedding_near_dup_gemm(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    block_size: int = 1024,
) -> DataFrame:
    """Exact cosine near-dup pairs ≥ threshold via blocked matrix
    multiply — same result set as :func:`embedding_near_dup`, ~10-30×
    faster.

    The N² pair space is tiled into block pairs: rows are hashed into
    ``ceil(N/block_size)`` blocks, every unordered block pair becomes
    one ``applyInPandas`` group, and the group kernel computes all
    cross-block cosines with one float64 GEMM (numpy, Arrow-batched).
    Each row is replicated B times (B = #blocks), so shuffle volume is
    N·B vectors — the unavoidable quadratic-baseline cost, organized so
    the inner loop is BLAS instead of an interpreted expression per
    pair.

    fp note: np.dot's pairwise summation differs from the oracle's
    sequential fold by ≤ a few ulps on 64-term dots — far below the
    driver's value-rounding; norms are computed Spark-side with the
    exact fold the oracle uses.

    Like the cross-join form this is the O(N²) correctness baseline;
    the scale path remains :func:`embedding_near_dup_bucketed` (IVF).
    """
    import math

    from ..functions.vectors import l2_norm_expr

    spark = df.sparkSession
    feats = (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .withColumn("n", l2_norm_expr(F.col("v")))
        .filter(F.col("n") > 0)
    )
    n_rows = feats.count()
    if n_rows == 0:
        return _k_row_df(spark, [], "id_a long, id_b long, cosine double")
    n_blocks = max(1, math.ceil(n_rows / block_size))
    feats = feats.withColumn("blk", F.pmod(F.hash("id"), F.lit(n_blocks)))
    # replication map: block pair (i, j<=i ... i<=j) -> group pid; the
    # lower block joins as role 'a', the upper as 'b'; diagonal groups
    # carry only 'a' rows and the kernel takes the strict upper triangle
    # diag marks self-block groups explicitly: if hashing leaves some
    # block empty, an off-diagonal group may arrive with only 'a' rows,
    # and inferring self-pair mode from emptiness would re-emit the
    # diagonal group's pairs.
    rep_rows = []
    pid = 0
    for i in range(n_blocks):
        for j in range(i, n_blocks):
            rep_rows.append((i, pid, "a", j == i))
            if j != i:
                rep_rows.append((j, pid, "b", False))
            pid += 1
    rep = _k_row_df(spark, 
        rep_rows, "blk int, pid int, role string, diag boolean"
    )

    def kernel(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        a = pdf[pdf["role"] == "a"]
        b = pdf[pdf["role"] == "b"]
        if not len(a):
            return empty
        ids_a = a["id"].to_numpy()
        A = np.asarray(list(a["v"]), dtype=np.float64)
        na = a["n"].to_numpy()
        if bool(pdf["diag"].iat[0]):
            C = (A @ A.T) / np.outer(na, na)
            ii, jj = np.nonzero(np.triu(C >= threshold, k=1))
            ia, ib = ids_a[ii], ids_a[jj]
        elif len(b):
            ids_b = b["id"].to_numpy()
            B = np.asarray(list(b["v"]), dtype=np.float64)
            nb = b["n"].to_numpy()
            C = (A @ B.T) / np.outer(na, nb)
            ii, jj = np.nonzero(C >= threshold)
            ia, ib = ids_a[ii], ids_b[jj]
        else:
            return empty
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": C[ii, jj]})

    return (
        feats.join(F.broadcast(rep), "blk")
        .groupBy("pid")
        .applyInPandas(kernel, "id_a long, id_b long, cosine double")
    )
