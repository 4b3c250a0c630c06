"""Link-graph operators: edge extraction and PageRank.

Crawl pipelines rank sources by link authority before mixing them
(quality-weighted sampling in operators/sampling.py takes any score;
PageRank is the classic one). There is no link table in the testdata,
so :func:`transition_edges` derives a weighted directed graph from
event streams — the "what follows what" navigation graph — and
:func:`pagerank` is the generic iterative rank over ANY (src, dst,
weight) edge relation.

Spark shape (pagerank): ranks are a |V|-row DataFrame, edges |E|
rows; one iteration = one edges⋈ranks join keyed by src + one dst
aggregate + a broadcast of the scalar dangling mass. The loop
localCheckpoints each iteration so lineage stays flat (the
kmeans_fit/connected_components discipline — Spark otherwise
re-plans a growing DAG every iteration). At cluster scale,
pre-partition edges by src once (``edges.repartition("src")``) and
every iteration's join reuses that layout; ranks (small side) hash
to the same partitioning.

The iteration follows the standard damped formulation (Page et al.
1999; Brin & Page 1998):

    r'(v) = (1-d)/N + d · ( Σ_{u→v} r(u)·w(u,v)/outw(u) + D/N )

with D = Σ r(u) over dangling nodes (no out-edges) — their mass
redistributes uniformly, keeping Σr = 1 every iteration (asserted in
tests).

The reference has no graph operators (SURVEY.md §2); the iterative
driver-loop shape mirrors operators/kmeans.py::kmeans_fit
(master.py:96-150's loop generalized).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window

from ..sources.loaders import k_row_df as _k_row_df
from pyspark.sql import functions as F

from ..sources.loaders import ns_to_us


def transition_edges(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Weighted transition graph from per-user event streams:
    ``(src, dst, n)`` where n counts ``src`` immediately followed by
    ``dst`` for the same user. Ordering is (ts at µs resolution,
    event id) — the engine's portable-timestamp convention
    (contracts/temporal_queries.py resolution note): events.ts
    arrives as epoch-ns bigint, and µs is what the DuckDB oracle can
    reproduce, so the nanos digit must not decide order.

    One shuffle keyed by user for the lag window, then the (src, dst)
    aggregate — map-side combinable, |types|² result rows."""
    w = Window.partitionBy(user_col).orderBy(
        ns_to_us(ts_col), F.col(id_col)
    )
    return (
        events.select(
            F.col(user_col),
            F.col(ts_col),
            F.col(id_col),
            F.col(type_col).alias("dst"),
            F.lag(F.col(type_col)).over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n"))
    )


def _pagerank_setup(edges, src_col, dst_col, weight_col):
    """Shared preprocessing: checkpointed node set and
    transition-probability-normalized edges."""
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("edge relation is empty")
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # normalized edges: transition probability src -> dst; checkpointed
    # once, reused every iteration
    norm = (
        e.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("outw")).alias("p"))
        .localCheckpoint(eager=True)
    )
    return nodes, n, norm, norm.select("src").distinct()


def _pagerank_step(nodes, n, norm, has_out, ranks, damping, pref=None):
    """One damped iteration: ranks -> new ranks (checkpointed).

    ``pref``: optional (node, pref) teleport distribution (summing to
    1) — the personalized/topic-sensitive variant (Haveliwala 2002):
    both the (1-d) teleport mass AND the dangling mass land on the
    preference nodes instead of uniformly. None → uniform 1/n."""
    # dangling mass stays IN-PLAN as a broadcast 1-row scalar — a
    # driver-side .first() would cost an extra job per iteration
    dangling = ranks.join(
        has_out, ranks.node == has_out.src, "left_anti"
    ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
    contrib = (
        norm.join(ranks, norm.src == ranks.node)
        .groupBy("dst")
        .agg(F.sum(F.col("p") * F.col("rank")).alias("c"))
    )
    out = nodes.join(contrib, nodes.node == contrib.dst, "left").crossJoin(
        F.broadcast(dangling)
    )
    if pref is None:
        teleport = F.lit(1.0 / n)
    else:
        out = out.join(pref, "node", "left")
        teleport = F.coalesce(F.col("pref"), F.lit(0.0))
    return (
        out.select(
            "node",
            (
                F.lit(1.0 - damping) * teleport
                + F.lit(damping)
                * (
                    F.coalesce(F.col("c"), F.lit(0.0))
                    + F.col("_dang") * teleport
                )
            ).alias("rank"),
        )
        .localCheckpoint(eager=True)
    )


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float = 0.0,
    personalization: dict | None = None,
) -> DataFrame:
    """Damped PageRank over a weighted directed edge relation →
    ``(node, rank)`` with Σrank = 1. ``tol`` > 0 stops early when no
    rank moves more than tol between iterations (L∞); ``tol=0`` runs
    exactly ``max_iter`` iterations — the contract-query mode, where
    the oracle unrolls the same fixed count.

    ``personalization``: optional {node: weight} teleport preference
    (normalized internally) — topic-sensitive PageRank (Haveliwala
    2002): random restarts land on the preference nodes, so rank
    concentrates on the neighborhood reachable FROM them. The
    preference set is model-sized (seeds), broadcast as a tiny
    DataFrame; nodes absent from the graph are rejected loudly rather
    than silently dropped mass."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    nodes, n, norm, has_out = _pagerank_setup(
        edges, src_col, dst_col, weight_col
    )
    pref = None
    if personalization is not None:
        if not personalization:
            raise ValueError("personalization must be non-empty when given")
        total = float(sum(personalization.values()))
        if total <= 0:
            raise ValueError("personalization weights must sum to > 0")
        spark = edges.sparkSession
        node_type = nodes.schema["node"].dataType.simpleString()
        pref = F.broadcast(
            _k_row_df(spark, 
                [(k, v / total) for k, v in personalization.items()],
                f"node {node_type}, pref double",
            )
        )
        # membership check stays distributed (anti-join), never a |V|
        # collect — the preference set is tiny, the graph is not
        missing = (
            pref.join(nodes, "node", "left_anti")
            .select("node")
            .collect()
        )
        if missing:
            raise ValueError(
                "personalization nodes not in the graph: "
                f"{sorted(r['node'] for r in missing)}"
            )
        ranks = nodes.join(pref, "node", "left").select(
            "node", F.coalesce(F.col("pref"), F.lit(0.0)).alias("rank")
        )
    else:
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(max_iter):
        new_ranks = _pagerank_step(
            nodes, n, norm, has_out, ranks, damping, pref=pref
        )
        if tol > 0.0:
            delta = (
                new_ranks.alias("a")
                .join(ranks.alias("b"), "node")
                .agg(F.max(F.abs(F.col("a.rank") - F.col("b.rank"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta <= tol:
                break
        else:
            ranks = new_ranks
    return ranks


def pagerank_resumable(
    edges: DataFrame,
    state_path: str,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_every: int = 1,
) -> DataFrame:
    """:func:`pagerank` with driver-loop fault tolerance, the
    kmeans_fit_resumable discipline applied to the graph loop: every
    ``checkpoint_every``-th iteration's rank table commits to
    ``state_path/v{i}`` (parquet — the _SUCCESS marker makes a
    version count only once fully written), and a re-invocation with
    the same path resumes from the newest committed iteration. Each
    iteration is a pure function of (edges, ranks), so the resumed
    run reproduces the uninterrupted one exactly (pinned in tests).
    Fixed-iteration mode only (tol-based early stop would need the
    convergence flag persisted too — out of scope until needed)."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    spark = edges.sparkSession
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    fs = path_cls(state_path).getFileSystem(hconf)
    done = []
    if fs.exists(path_cls(state_path)):
        for status in fs.listStatus(path_cls(state_path)):
            name = status.getPath().getName()
            if name.startswith("v") and name[1:].isdigit():
                if fs.exists(path_cls(f"{state_path}/{name}/_SUCCESS")):
                    done.append(int(name[1:]))
    done.sort()
    nodes, n, norm, has_out = _pagerank_setup(
        edges, src_col, dst_col, weight_col
    )
    start = 0
    if done:
        start = min(done[-1], max_iter)
        ranks = spark.read.parquet(f"{state_path}/v{start}")
    else:
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(start + 1, max_iter + 1):
        ranks = _pagerank_step(nodes, n, norm, has_out, ranks, damping)
        if i % checkpoint_every == 0 or i == max_iter:
            ranks.write.mode("overwrite").parquet(f"{state_path}/v{i}")
    return ranks


def event_paths(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    steps: int = 3,
    top: int = 20,
) -> DataFrame:
    """Frequent ``steps``-long event-type paths across user streams:
    ``(step_1..step_N, n)``, the ``top`` most common, count-desc with
    path-asc tie-break — lightweight sequential-pattern mining (the
    k-step generalization of :func:`transition_edges`). Same single
    user-keyed window shuffle; ``steps - 1`` lags share the one
    exchange; the path aggregate is map-side combinable over at most
    |types|^steps keys."""
    if steps < 2:
        raise ValueError(f"steps must be >= 2, got {steps}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    w = Window.partitionBy(user_col).orderBy(
        ns_to_us(ts_col), F.col(id_col)
    )
    cols = [
        F.lag(F.col(type_col), steps - 1 - i).over(w).alias(f"step_{i + 1}")
        for i in range(steps)
    ]
    path = events.select(*cols).where(F.col("step_1").isNotNull())
    names = [f"step_{i + 1}" for i in range(steps)]
    return (
        path.groupBy(*names)
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), *[F.asc(c) for c in names])
        .limit(top)
    )


def cooccurrence_edges(
    df: DataFrame,
    id_col: str,
    group_cols: Sequence[str],
    *,
    max_group_size: int | None = None,
) -> DataFrame:
    """Undirected co-occurrence edges: ``(src, dst)`` with src < dst,
    distinct, for every pair of ids sharing a group — the bipartite
    projection (user×context → user–user) that turns logs into a
    graph for community/triangle analysis.

    Scale: the self-join is EQUI on the group key, so the quadratic
    cost is per-group, and ``max_group_size`` drops degenerate hub
    groups BEFORE pairing (the blocking-cap doctrine shared with
    entity.py / dedup.py: a context half the population shares
    produces no informative edges, only |G|² shuffle). The DISTINCT
    dedups multi-context pairs down to simple edges.
    """
    group_cols = list(group_cols)
    if not group_cols:
        raise ValueError("cooccurrence_edges needs group_cols")
    base = df.select(F.col(id_col).alias("_id"), *group_cols).distinct()
    if max_group_size is not None:
        if max_group_size < 2:
            raise ValueError(
                f"max_group_size must be >= 2, got {max_group_size}"
            )
        ok = (
            base.groupBy(*group_cols)
            .agg(F.count("*").alias("_gn"))
            .where(F.col("_gn") <= max_group_size)
            .drop("_gn")
        )
        base = base.join(ok, group_cols, "left_semi")
    left = base.select(*group_cols, F.col("_id").alias("src"))
    right = base.select(*group_cols, F.col("_id").alias("dst"))
    return (
        left.join(right, group_cols)
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    canonical undirected edges (``src < dst``, simple).

    The order-canonical enumeration (Suri & Vassilvitskii 2011's
    MR triangle counting, natural in joins): with every edge stored
    low→high, a triangle a<b<c is found EXACTLY once as wedge
    (a,b)+(b,c) closed by (a,c) — two equi-joins, no post-dedup.
    Each triangle then credits its 3 corners via one explode.

    Output: ``(node, degree, triangles, clustering)`` for every node
    with degree ≥ 1, where clustering = 2T / (d·(d-1)) (0 when d < 2).

    Scale: both joins key on a node id — skew follows hub nodes, so
    feed edges from :func:`cooccurrence_edges` with its hub cap, or
    pre-filter high-degree nodes (the standard truncated variant).
    """
    e = edges.select("src", "dst")
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    per_node = (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    deg = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    d = F.col("degree").cast("double")
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    return deg.join(per_node, "node", "left").select(
        "node",
        "degree",
        t.alias("triangles"),
        F.when(
            F.col("degree") >= 2,
            2.0 * t.cast("double") / (d * (d - 1.0)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering"),
    )


def triangle_summary(edges: DataFrame) -> DataFrame:
    """One-row graph summary: node/edge/triangle counts and the global
    clustering coefficient ``3·triangles / wedges`` (wedges =
    Σ_v C(deg v, 2); 0 when the graph has no wedge)."""
    stats = triangle_stats(edges)
    d = F.col("degree").cast("double")
    return stats.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("degree") / 2).cast("long").alias("n_edges"),
        (F.sum("triangles") / 3).cast("long").alias("n_triangles"),
        F.sum(d * (d - 1.0) / 2.0).alias("_wedges"),
        F.sum("triangles").alias("_tri3"),
    ).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.when(
            F.col("_wedges") > 0, F.col("_tri3") / F.col("_wedges")
        )
        .otherwise(F.lit(0.0))
        .alias("global_clustering"),
    )


def markov_sequence_scores(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user surprisal under the corpus's own first-order Markov
    chain: score each user's event stream by ``Σ ln P(eₜ | eₜ₋₁)``
    with transition probabilities estimated from the whole log
    (:func:`transition_edges` counts / source marginals).

    The sequence-model twin of the document log-prob family
    (operators/lm.py): low average surprisal = script-like repetitive
    behavior, high = erratic streams — both ends are what bot/fraud
    triage and behavioral-cohort analysis look at.

    Output: ``(user, n_transitions, logprob_sum, avg_logprob,
    perplexity)`` for users with ≥ 1 transition, where perplexity =
    exp(−avg). Every observed transition has a nonzero probability by
    construction (it contributed to its own count), so no smoothing
    is needed and the score is total.

    Shape: the SAME user-keyed window pass as transition_edges, then a
    broadcast join against the |types|² probability table and one
    combinable aggregate — the model is data-derived yet never leaves
    the executors.
    """
    probs = transition_edges(
        events,
        user_col=user_col,
        type_col=type_col,
        ts_col=ts_col,
        id_col=id_col,
    )
    marg = probs.groupBy("src").agg(F.sum("n").alias("n_src"))
    ptab = probs.join(marg, "src").select(
        "src",
        "dst",
        (F.col("n").cast("double") / F.col("n_src").cast("double")).alias(
            "p"
        ),
    )
    w = Window.partitionBy(user_col).orderBy(
        ns_to_us(ts_col), F.col(id_col)
    )
    trans = (
        events.select(
            F.col(user_col).alias("user"),
            F.col(type_col).alias("dst"),
            F.lag(F.col(type_col)).over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
    )
    scored = trans.join(F.broadcast(ptab), ["src", "dst"])
    return scored.groupBy("user").agg(
        F.count("*").alias("n_transitions"),
        F.sum(F.log("p")).alias("logprob_sum"),
        F.avg(F.log("p")).alias("avg_logprob"),
        F.exp(-F.avg(F.log("p"))).alias("perplexity"),
    )


def link_prediction_scores(
    edges: DataFrame, *, max_degree: int | None = None
) -> DataFrame:
    """Common-neighbor link prediction over canonical undirected edges
    (``src < dst``, simple): for every NON-adjacent pair sharing at
    least one neighbor, ``(node_a, node_b, common, deg_a, deg_b,
    adamic_adar, jaccard_nbrs)`` —

        adamic_adar  = Σ_{z ∈ Γ(a)∩Γ(b)} 1 / ln(deg(z))
        jaccard_nbrs = |Γ(a)∩Γ(b)| / |Γ(a)∪Γ(b)|

    the classic "who should be connected" ranking (Liben-Nowell &
    Kleinberg 2003). ln(deg(z)) is never 0: a common neighbor has
    edges to both endpoints, so deg(z) ≥ 2.

    Scale shape: adjacency is the 2-element explode of the edge list
    (one pass — no unioned re-read of the subtree); wedges come from
    ONE neighbor-keyed equi self-join, so cost concentrates on hub
    neighbors — ``max_degree`` drops hubs as wedge CENTERS before the
    join (the truncated variant; a celebrity neighbor says nothing
    about whether two fans should link, and contributes ≤ 1/ln(huge)
    anyway). The existing-edge anti-join and the degree lookups are
    all keyed on node/pair ids — AQE broadcasts the degree table when
    small.
    """
    if max_degree is not None and max_degree < 2:
        raise ValueError(f"max_degree must be >= 2, got {max_degree}")
    e = edges.select("src", "dst")
    adj = e.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("node"), F.col("dst").alias("nbr")),
                F.struct(F.col("dst").alias("node"), F.col("src").alias("nbr")),
            )
        ).alias("_a")
    ).select("_a.node", "_a.nbr")
    deg = adj.groupBy("node").agg(F.count("*").alias("deg"))
    centers = deg.select(F.col("node").alias("nbr"), F.col("deg").alias("nbr_deg"))
    if max_degree is not None:
        centers = centers.where(F.col("nbr_deg") <= max_degree)
    adj2 = adj.join(centers, "nbr")
    wa = adj2.select("nbr", "nbr_deg", F.col("node").alias("node_a"))
    wb = adj2.select("nbr", F.col("node").alias("node_b"))
    wedges = wa.join(wb, "nbr").where(F.col("node_a") < F.col("node_b"))
    scored = wedges.groupBy("node_a", "node_b").agg(
        F.count("*").alias("common"),
        F.sum(F.lit(1.0) / F.log(F.col("nbr_deg").cast("double"))).alias(
            "adamic_adar"
        ),
    )
    non_adjacent = scored.join(
        e.select(F.col("src").alias("node_a"), F.col("dst").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    out = non_adjacent.join(
        deg.select(F.col("node").alias("node_a"), F.col("deg").alias("deg_a")),
        "node_a",
    ).join(
        deg.select(F.col("node").alias("node_b"), F.col("deg").alias("deg_b")),
        "node_b",
    )
    return out.select(
        "node_a",
        "node_b",
        "common",
        "deg_a",
        "deg_b",
        "adamic_adar",
        (
            F.col("common").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("common"))
        ).alias("jaccard_nbrs"),
    )


def k_core_edges(
    edges: DataFrame, k: int, *, max_rounds: int = 50
) -> DataFrame:
    """Edges of the ``k``-core: the maximal subgraph in which every
    node has degree ≥ k, computed by iterative peeling (drop nodes
    below k, re-check, repeat) over canonical undirected edges
    (``src < dst``, simple).

    The peel loop is the engine's standard iterative-driver shape
    (operators/kmeans.py doctrine): each round is ONE degree
    aggregation over the 2-element adjacency explode plus two
    semi-joins of the edge list against the surviving node set — all
    keyed on node ids, never node payloads — and the edge set is
    localCheckpointed per round so lineage stays flat for any depth.
    Rounds needed = the graph's peel depth (≤ degeneracy ordering
    passes, typically ≪ 10 on real graphs); the loop exits at the
    fixpoint (edge count unchanged) or ``max_rounds``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    e = edges.select("src", "dst").localCheckpoint()
    n_prev = e.count()
    for _ in range(max_rounds):
        if n_prev == 0:
            break
        adj = e.select(F.col("src").alias("node")).unionAll(
            e.select(F.col("dst").alias("node"))
        )
        keep = (
            adj.groupBy("node")
            .agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= k)
        )
        e2 = (
            e.join(
                keep.select(F.col("node").alias("src")), "src", "left_semi"
            )
            .join(
                keep.select(F.col("node").alias("dst")), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint()
        )
        n = e2.count()
        if n == n_prev:
            break
        e, n_prev = e2, n
    return e


def k_core_nodes(
    edges: DataFrame, k: int, *, max_rounds: int = 50
) -> DataFrame:
    """Nodes of the ``k``-core with their WITHIN-CORE degree:
    ``(node, deg)``, ``deg >= k`` for every returned row."""
    core = k_core_edges(edges, k, max_rounds=max_rounds)
    adj = core.select(F.col("src").alias("node")).unionAll(
        core.select(F.col("dst").alias("node"))
    )
    return adj.groupBy("node").agg(F.count("*").alias("deg"))


def hits(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    max_iter: int = 3,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999), weighted, with L1
    normalization, run a FIXED ``max_iter`` iterations: ``(node, hub,
    auth)`` — authorities are where heavy flow POINTS, hubs are what
    points AT authorities; on a navigation graph the two separate
    entry-screens from destination-screens, which a single PageRank
    score cannot.

    Each iteration is two edge-keyed aggregations (auth from hub,
    then hub from the fresh auth) plus two 1-row L1 totals — the same
    flat-lineage checkpointed driver loop as :func:`pagerank`. L1
    (not the textbook L2) normalization keeps every step a pure
    sum/divide, exactly mirrorable in the unrolled SQL oracle
    (contracts/graph_queries.py::HITS_SQL); the hub/auth RANKING is
    identical under any positive rescaling.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("edge relation is empty")
    scores = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    )
    for _ in range(max_iter):
        # L1 totals stay IN-PLAN as broadcast 1-row scalars: pulling
        # them to the driver (.first()) costs two extra jobs per
        # round — with the totals folded, each round is exactly ONE
        # job (the eager checkpoint at the bottom).
        a_un = (
            e.join(scores.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("w") * F.col("hub")).alias("un"))
        )
        ta = a_un.agg(F.sum("un").alias("_ta"))
        auth = (
            nodes.join(
                a_un.select(F.col("dst").alias("node"), "un"), "node", "left"
            )
            .crossJoin(F.broadcast(ta))
            .select(
                "node",
                (F.coalesce(F.col("un"), F.lit(0.0)) / F.col("_ta")).alias(
                    "auth"
                ),
            )
        )
        h_un = (
            e.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum(F.col("w") * F.col("auth")).alias("un"))
        )
        th = h_un.agg(F.sum("un").alias("_th"))
        hub = (
            nodes.join(
                h_un.select(F.col("src").alias("node"), "un"), "node", "left"
            )
            .crossJoin(F.broadcast(th))
            .select(
                "node",
                (F.coalesce(F.col("un"), F.lit(0.0)) / F.col("_th")).alias(
                    "hub"
                ),
            )
        )
        scores = (
            hub.join(auth, "node").localCheckpoint(eager=True)
        )
    return scores.select("node", "hub", "auth")


def label_propagation(
    edges: DataFrame, *, rounds: int = 4
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over canonical undirected edges: every node starts as
    its own label; each round it adopts its neighbors' most frequent
    label (ties → smallest label). Returns ``(node, label)`` after
    EXACTLY ``rounds`` rounds — fixed-round semantics, because
    synchronous LPA can oscillate on bipartite structures and a
    fixpoint test would never fire there; determinism comes from the
    (count DESC, label ASC) total order, not from luck.

    Each round: one adjacency⋈labels join keyed on node ids + one
    (node, label) count + one per-node window pick — all shuffles
    carry id/label longs; lineage is checkpointed flat per round.
    Labels concentrate on dense cores within O(diameter) rounds; for
    exact dedup-style components use
    operators/dedup_pipeline.py::connected_components instead (LPA
    is the modularity heuristic, CC the reachability ground truth).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    e = edges.select("src", "dst")
    adj = e.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).unionAll(e.select(F.col("dst").alias("node"), F.col("src").alias("nbr")))
    adj = adj.localCheckpoint(eager=True)
    labels = adj.select("node").distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(rounds):
        counts = (
            adj.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count("*").alias("c"))
        )
        # (count DESC, label ASC) argmin via a struct min — a plain
        # hash aggregate with map-side partials instead of the old
        # per-round row_number window's exchange + sort (guide §2.3
        # "aggregate before you shuffle"; same total order, so labels
        # are identical)
        labels = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("_nc"), F.col("label"))
                ).alias("_best")
            )
            .select("node", F.col("_best.label").alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


#: frontier/visited row cap for BFS map-side broadcast joins; above
#: this the per-round joins fall back to shuffled equi-joins
_BFS_BROADCAST_MAX = 500_000


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 6,
    directed: bool = False,
) -> DataFrame:
    """Hop distances from a source set: frontier BFS returning
    ``(node, hop)`` with the MINIMUM hop count per reachable node
    (sources at hop 0), out to ``max_hops``.

    ``sources`` is a one-column DataFrame of start nodes. Undirected
    graphs (default) symmetrize the edge list once up front. Each
    round expands the current frontier through one edge join, anti-
    joins everything already visited (so a node is settled at its
    FIRST discovery — the BFS invariant that makes ``hop`` minimal).

    Per-round cost discipline (the round-4 job-floor fix):

    - the symmetrized-distinct edge list is localCheckpointed ONCE —
      without it every round re-derives the edges from the raw input
      (for a co-occurrence graph that is the whole upstream groupBy,
      per round);
    - each round materializes only the NEW frontier; the visited set
      is the plain union of already-checkpointed per-hop frontiers
      (flat lineage for free, no second checkpoint job per round);
    - the frontier's exact count (a cheap job on the materialized
      RDD, doubling as the early-exit test) drives an adaptive
      broadcast: small frontiers/visited sets join map-side with no
      edge shuffle — the common case in bounded-hop BFS — while
      beyond ``_BFS_BROADCAST_MAX`` rows the plan falls back to the
      shuffled equi-join that scales arbitrarily.

    Scale: rounds are bounded (``max_hops``, early exit on an empty
    frontier); each round is one equi-join + one left-anti join on
    the node key, map-side whenever the frontier is broadcastable.
    Six rounds reach ~everything in small-world graphs; raise
    ``max_hops`` for meshes.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    )
    if not directed:
        e = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct().localCheckpoint()
    src = sources.toDF("node").distinct().localCheckpoint()
    levels = [src.select("node", F.lit(0).alias("hop"))]
    visited_nodes = src
    n_frontier = src.count()
    n_visited = n_frontier
    frontier = src
    for h in range(1, max_hops + 1):
        if n_frontier == 0:
            break
        f = (
            F.broadcast(frontier)
            if n_frontier <= _BFS_BROADCAST_MAX
            else frontier
        )
        vis = (
            F.broadcast(visited_nodes)
            if n_visited <= _BFS_BROADCAST_MAX
            else visited_nodes
        )
        nxt = (
            f.join(e, f["node"] == e["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(vis, "node", "left_anti")
            .localCheckpoint()
        )
        n_frontier = nxt.count()
        if n_frontier == 0:
            break
        levels.append(nxt.select("node", F.lit(h).alias("hop")))
        visited_nodes = visited_nodes.unionAll(nxt)
        n_visited += n_frontier
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    return out


def sssp_weighted(
    edges: DataFrame,
    sources: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    rounds: int = 4,
    directed: bool = True,
) -> DataFrame:
    """Weighted single-source shortest paths, Bellman-Ford style with
    a FIXED round budget: returns ``(node, dist)`` = the minimum path
    cost from the source set using AT MOST ``rounds`` edges — a
    well-defined result in itself (the k-hop cost horizon), and equal
    to the true shortest distance once ``rounds`` ≥ the weighted-path
    diameter. The weighted companion of :func:`bfs_hops`.

    Each round relaxes every edge once: ``dist' = min(dist,
    min_(u→v)(dist[u] + w))`` — one equi-join keyed by node + one
    grouped min, localCheckpointed so lineage stays flat (the
    pagerank/bfs doctrine). Unreachable-within-budget nodes are
    absent, sources sit at 0. Weights may be any doubles; with
    negative edges the k-edge-bounded semantics still hold (no
    negative-cycle divergence inside a fixed budget).

    Scale: per round, the frontier relation is |settled nodes| rows
    joined against |E| — both keyed shuffles; rounds are bounded by
    construction.
    """
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = edges.select(
        F.col(src_col).alias("u"),
        F.col(dst_col).alias("v"),
        F.col(weight_col).cast("double").alias("w"),
    )
    if not directed:
        e = e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
    # materialize the edge relation once: every round joins it, and an
    # unmaterialized lineage re-derives the whole upstream per round
    e = e.localCheckpoint(eager=True)
    dist = (
        sources.toDF("node")
        .distinct()
        .select("node", F.lit(0.0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        relaxed = dist.join(e, dist["node"] == e["u"]).select(
            F.col("v").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = (
            dist.union(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return dist


def degree_assortativity(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of endpoint degrees over all edges of the UNDIRECTED
    simple graph — positive means hubs attach to hubs (social
    networks), negative means hubs attach to leaves (the internet,
    star-ish retrieval graphs). The one-number answer to "what shape
    is this graph" that degree histograms alone don't give.

    Plan: symmetrize + distinct to simple edges, one node-keyed degree
    aggregate, join degrees onto both endpoints (each directed copy of
    an edge contributes one (deg_u, deg_v) pair — the standard
    symmetric-sum convention), then Pearson from explicit sums. Two
    node-keyed shuffles, nothing quadratic.

    Returns one row ``(n_nodes, n_edges, assortativity)`` —
    NULL coefficient for degree-regular graphs (zero variance).
    """
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).where(F.col("u").isNotNull() & F.col("v").isNotNull())
    e = e.where(F.col("u") != F.col("v"))
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    deg = sym.groupBy("u").agg(
        F.count(F.lit(1)).cast("double").alias("d")
    )
    paired = (
        sym.join(deg, "u")
        .withColumnRenamed("d", "du")
        .join(
            deg.select(F.col("u").alias("v"), F.col("d").alias("dv")),
            "v",
        )
    )
    n = F.count(F.lit(1)).cast("double")
    return paired.agg(
        F.countDistinct("u").alias("n_nodes"),
        (n / F.lit(2.0)).cast("long").alias("n_edges"),
        (
            (
                n * F.sum(F.col("du") * F.col("dv"))
                - F.sum("du") * F.sum("dv")
            )
            / F.nullif(
                F.sqrt(
                    (
                        n * F.sum(F.col("du") * F.col("du"))
                        - F.sum("du") * F.sum("du")
                    )
                    * (
                        n * F.sum(F.col("dv") * F.col("dv"))
                        - F.sum("dv") * F.sum("dv")
                    )
                ),
                F.lit(0.0),
            )
        ).alias("assortativity"),
    )


def reciprocity(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Directed-graph reciprocity: the fraction of (distinct,
    non-loop) edges whose reverse edge also exists — near 1 for
    mutual-interaction graphs (chats), near 0 for hierarchies (cites,
    follows-celebrities). One distinct + one self-equi-join on the
    edge key, both on (src, dst) hashes.

    Returns one row ``(n_edges, n_reciprocal, reciprocity)`` — NULL
    ratio on an empty graph.
    """
    e = (
        edges.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("v")
        )
        .where(
            F.col("u").isNotNull()
            & F.col("v").isNotNull()
            & (F.col("u") != F.col("v"))
        )
        .distinct()
    )
    rev = e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    mutual = e.join(rev, ["u", "v"], "left_semi")
    n = e.count()
    m = mutual.count()
    return _k_row_df(e.sparkSession, 
        [(n, m, (m / n) if n else None)],
        "n_edges long, n_reciprocal long, reciprocity double",
    )


def hmm_viterbi_scores(
    events: DataFrame,
    *,
    emissions: "dict[str, tuple[float, float]]",
    transitions: "tuple[tuple[float, float], tuple[float, float]]" = (
        (0.85, 0.15),
        (0.25, 0.75),
    ),
    initial: "tuple[float, float]" = (0.7, 0.3),
    floor: float = 1e-3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Viterbi decoding of a FIXED-PARAMETER 2-state HMM over each
    user's event sequence — the latent-state upgrade of
    :func:`markov_sequence_scores` (which scores sequences under a
    memoryless observed-state chain): per user, the max-probability
    hidden-state path score under

        v_s(1) = ln π_s + ln e_s(o_1)
        v_s(t) = ln e_s(o_t) + max_r [ v_r(t−1) + ln a_{rs} ]

    in the log domain. ``emissions`` maps each observation symbol to
    its per-state probabilities ``(p_state0, p_state1)``; unseen
    symbols fall back to ``floor`` in both states. Parameters are
    literals (no EM here — see kmeans/gmm for fitting), so the decode
    is fully deterministic and oracle-checkable.

    Reports per user the final state scores ``(v0, v1)``, the Viterbi
    log-probability ``max(v0, v1)``, and the decoded final state
    (ties break to state 0).

    Scale shape: emission log-probs are folded JVM-side as a literal
    CASE projection (one narrow scan, no UDF); only the inherently
    sequential max-recursion runs in a per-key Arrow kernel over the
    (ts, event_id)-ordered sequence — T rows in, one row out, users
    embarrassingly parallel (the holt_linear doctrine). The SQL
    oracle replays the recursion as a recursive CTE with GREATEST,
    sharing the exact same log-literal constants.

    Returns ``(user, n, v0, v1, logp, best_state)``.
    """
    if not emissions:
        raise ValueError("emissions table must be non-empty")
    for sym, (p0, p1) in emissions.items():
        if not (0.0 < p0 <= 1.0 and 0.0 < p1 <= 1.0):
            raise ValueError(
                f"emission probs must be in (0, 1], got {sym}: {(p0, p1)}"
            )
    (a00, a01), (a10, a11) = transitions
    pi0, pi1 = initial
    for p in (a00, a01, a10, a11, pi0, pi1, floor):
        if not 0.0 < p < 1.0:
            raise ValueError(
                "transition/initial/floor probabilities must be in (0, 1)"
            )
    ln = math.log
    l_a00, l_a01, l_a10, l_a11 = ln(a00), ln(a01), ln(a10), ln(a11)
    l_pi0, l_pi1, l_floor = ln(pi0), ln(pi1), ln(floor)

    def _emit(state: int) -> Column:
        expr = F.lit(l_floor)
        for sym, probs in sorted(emissions.items()):
            expr = F.when(
                F.col(type_col) == sym, F.lit(ln(probs[state]))
            ).otherwise(expr)
        return expr

    seq = events.where(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col).alias("user"),
        ns_to_us(ts_col).alias("_ts_us"),
        F.col(id_col).alias("_eid"),
        _emit(0).alias("e0"),
        _emit(1).alias("e1"),
    )
    user_type = seq.schema["user"].dataType.simpleString()
    out_schema = (
        f"user {user_type}, n long, v0 double, v1 double, "
        "logp double, best_state int"
    )

    def _viterbi_kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["_ts_us", "_eid"])
        e0s = pdf["e0"].tolist()
        e1s = pdf["e1"].tolist()
        v0 = l_pi0 + e0s[0]
        v1 = l_pi1 + e1s[0]
        for e0, e1 in zip(e0s[1:], e1s[1:]):
            n0 = e0 + max(v0 + l_a00, v1 + l_a10)
            n1 = e1 + max(v0 + l_a01, v1 + l_a11)
            v0, v1 = n0, n1
        return pd.DataFrame(
            {
                "user": [pdf["user"].iloc[0]],
                "n": [len(e0s)],
                "v0": [v0],
                "v1": [v1],
                "logp": [max(v0, v1)],
                "best_state": [1 if v1 > v0 else 0],
            }
        )

    return seq.groupBy("user").applyInPandas(_viterbi_kernel, out_schema)
