"""Association-rule mining (market-basket co-visitation): support,
confidence and lift for item pairs that share a basket — "users who
touched X also touched Y", the recommendation / co-occurrence-bias
audit a behavioural dataset gets before training on it.

Single-pass relational shape (the A-priori k=2 case, which is what
pair-level lift needs — higher-order itemsets explode combinatorially
and are deliberately out of scope):

1. baskets: DISTINCT (basket, item) — presence, not multiplicity.
2. pair counts: per-basket equi self-join with ``item_a < item_b``
   (each unordered pair counted once per basket) → groupBy pair.
3. rules: both directions of each pair, with item supports and the
   basket total joined back (broadcast — |items| and 1 rows).

    support(a→b) = n_ab / n_baskets
    confidence(a→b) = n_ab / n_a
    lift = n_ab · n_baskets / (n_a · n_b)   (direction-symmetric)

Scale shape: the only corpus-sized shuffles are the DISTINCT and the
basket-keyed self-join; the join is EQUI on the basket id so the
quadratic cost is per-basket, and ``max_basket_size`` drops degenerate
hub baskets BEFORE pairing (the blocking-cap doctrine of
graph.cooccurrence_edges / entity.py / dedup.py). Everything after
operates on |item-pairs| rows with the supports broadcast.

Determinism doctrine: counts are exact integers; lift/confidence are
single divisions of exact integer products (< 2^53), bit-identical
across engines and partitionings.

Reference scope: extension surface; the reference engine
(master.py:27-150) has no relational mining operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baskets(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Distinct ``(basket, item)`` presence rows."""
    return df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()


def pair_counts(
    presence: DataFrame, *, max_basket_size: int | None = None
) -> DataFrame:
    """Unordered pair basket-counts ``(item_a, item_b, n_ab)`` with
    ``item_a < item_b`` from :func:`baskets` output."""
    base = presence
    if max_basket_size is not None:
        if max_basket_size < 2:
            raise ValueError(
                f"max_basket_size must be >= 2, got {max_basket_size}"
            )
        ok = (
            base.groupBy("basket")
            .agg(F.count("*").alias("_bn"))
            .where(F.col("_bn") <= max_basket_size)
            .drop("_bn")
        )
        base = base.join(ok, "basket", "left_semi")
    a = base.select("basket", F.col("item").alias("item_a"))
    b = base.select("basket", F.col("item").alias("item_b"))
    return (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_ab"))
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pair_count: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Directed rules for every co-occurring pair: ``(antecedent,
    consequent, n_ante, n_cons, n_ab, n_baskets, support, confidence,
    lift)`` — both directions of each unordered pair (same support and
    lift, different confidence). ``min_pair_count`` prunes noise pairs
    before the metric joins."""
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}"
        )
    presence = baskets(df, basket_col, item_col)
    pairs = pair_counts(presence, max_basket_size=max_basket_size).where(
        F.col("n_ab") >= min_pair_count
    )
    # direction expansion via explode, NOT a union of two selects: a
    # union would duplicate the whole pairs subtree (distinct +
    # basket self-join run TWICE — visible in .explain), while the
    # 2-element array explode is a narrow row doubling on the already
    # pair-sized table
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                ),
            )
        ).alias("_d"),
        "n_ab",
    ).select("_d.antecedent", "_d.consequent", "n_ab")
    supports = presence.groupBy("item").agg(F.count("*").alias("n_item"))
    totals = presence.select("basket").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    joined = (
        directed.join(
            F.broadcast(
                supports.select(
                    F.col("item").alias("antecedent"),
                    F.col("n_item").alias("n_ante"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                supports.select(
                    F.col("item").alias("consequent"),
                    F.col("n_item").alias("n_cons"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(totals))
    )
    ab_d = F.col("n_ab").cast("double")
    nb_d = F.col("n_baskets").cast("double")
    return joined.select(
        "antecedent",
        "consequent",
        "n_ante",
        "n_cons",
        "n_ab",
        "n_baskets",
        (ab_d / nb_d).alias("support"),
        (ab_d / F.col("n_ante")).alias("confidence"),
        (ab_d * nb_d / (F.col("n_ante").cast("double") * F.col("n_cons"))
         ).alias("lift"),
    )


def frequent_sequences(
    df: DataFrame,
    seq_col: str,
    ts_col: str,
    item_col: str,
    *,
    min_support: float,
    max_pattern_length: int = 3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Frequent SEQUENTIAL patterns (MLlib PrefixSpan) — the ordered
    counterpart of :func:`association_rules`: "users who do a, THEN
    b" instead of "users who touch both". The pattern mining step of
    behavioural funnel discovery.

    Each ``seq_col`` entity becomes one sequence of single-item
    events ordered by ``(ts_col, tiebreak_col)`` — the tiebreak (an
    event id) makes the sequence a deterministic total order even
    with timestamp ties, so results are retry/partitioning-stable
    and SQL-reproducible. ``min_support`` is the fraction of
    sequences containing the pattern (gaps allowed, the PrefixSpan
    semantics); supports are exact integer counts.

    Scale: PrefixSpan is MLlib's distributed projected-database
    algorithm — each round shuffles (prefix, suffix) projections, and
    ``max_pattern_length`` caps the lattice depth. The per-entity
    collect_list is bounded by the entity's own event count (cap hub
    entities upstream, the basket-size doctrine above).

    Returns ``(pattern string 'a>b>c', length, n_sequences, support)``
    ordered by nothing (hash-gate friendly).
    """
    if not 0 < min_support <= 1:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if max_pattern_length < 1:
        raise ValueError(
            f"max_pattern_length must be >= 1, got {max_pattern_length}"
        )
    from pyspark.ml.fpm import PrefixSpan

    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    ordered = F.array_sort(
        F.collect_list(
            F.struct(*order, F.col(item_col).cast("string").alias("_it"))
        )
    )
    seqs = df.groupBy(seq_col).agg(
        F.transform(ordered, lambda s: F.array(s["_it"])).alias("sequence")
    )
    n_seq = seqs.count()
    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    )
    pats = ps.findFrequentSequentialPatterns(seqs)
    return pats.select(
        F.array_join(
            F.transform(F.col("sequence"), lambda s: F.element_at(s, 1)),
            ">",
        ).alias("pattern"),
        F.size("sequence").cast("int").alias("length"),
        F.col("freq").cast("long").alias("n_sequences"),
        (F.col("freq") / F.lit(float(n_seq))).alias("support"),
    )


def frequent_itemsets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_support: float,
    max_len: int = 3,
) -> DataFrame:
    """Frequent itemsets of ANY size up to ``max_len`` via MLlib
    FPGrowth — lifts :func:`association_rules`' deliberate pairs-only
    scope when higher-order co-occurrence is the question ("which
    TRIPLES of behaviors cluster").

    Baskets are DISTINCT item sets per ``basket_col`` (presence
    semantics, like the pair path); supports are exact integer basket
    counts, so results are partitioning-stable and SQL-reproducible.
    FPGrowth mines the full lattice (its cost is bounded by the
    actual frequent-set structure, not an enumeration); ``max_len``
    filters the OUTPUT to the sizes the caller will read — mirror any
    cap upstream of a huge item vocabulary with a support floor.

    Returns ``(itemset 'a&b', length, n_baskets, support)`` with the
    itemset string in canonical sorted order.
    """
    if not 0 < min_support <= 1:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    from pyspark.ml.fpm import FPGrowth

    bas = df.groupBy(basket_col).agg(
        F.collect_set(F.col(item_col).cast("string")).alias("items")
    )
    n_baskets = bas.count()
    fp = FPGrowth(minSupport=min_support, itemsCol="items")
    model = fp.fit(bas)
    sets = model.freqItemsets.where(F.size("items") <= max_len)
    return sets.select(
        F.array_join(F.array_sort("items"), "&").alias("itemset"),
        F.size("items").cast("int").alias("length"),
        F.col("freq").cast("long").alias("n_baskets"),
        (F.col("freq") / F.lit(float(n_baskets))).alias("support"),
    )
