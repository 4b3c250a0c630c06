"""Attribution contracts (operators/attribution.py): five-model
multi-touch credit report over the events log — purchases are
conversions, views/clicks are touches, channels derive from the
``props`` JSON."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.attribution import DAY_NS
from ..sources.loaders import load_table

_LOOKBACK_NS = 7 * DAY_NS
_HALFLIFE_NS = DAY_NS


def attribution_report_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.attribution import (
        attribution_credits,
        attribution_report,
        touch_conversion_pairs,
    )

    ev = load_table(spark, sf_dir, "events")
    channel = F.concat(
        F.lit("ch"),
        (F.get_json_object("props", "$.k").cast("long") % 3).cast("string"),
    )
    pairs = touch_conversion_pairs(
        ev,
        "purchase",
        ["view", "click"],
        channel,
        lookback_ns=_LOOKBACK_NS,
    )
    return attribution_report(
        attribution_credits(pairs, halflife_ns=_HALFLIFE_NS)
    )


ATTRIBUTION_SQL = f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, epoch_ns(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase'
),
touch AS (
  SELECT user_id, event_id AS touch_id, epoch_ns(ts) AS touch_ts,
         'ch' || CAST(CAST(props->>'$.k' AS BIGINT) % 3 AS VARCHAR)
           AS channel
  FROM events WHERE event_type IN ('view', 'click')
),
paired AS (
  SELECT c.conv_id, c.conv_ts, t.touch_id, t.touch_ts, t.channel,
         row_number() OVER (PARTITION BY c.conv_id
                            ORDER BY t.touch_ts, t.touch_id) AS rn,
         count(*) OVER (PARTITION BY c.conv_id) AS k,
         pow(2.0, -CAST(c.conv_ts - t.touch_ts AS DOUBLE)
                    / {float(_HALFLIFE_NS)}) AS w
  FROM conv c JOIN touch t ON c.user_id = t.user_id
   AND t.touch_ts < c.conv_ts
   AND t.touch_ts >= c.conv_ts - {_LOOKBACK_NS}
),
scored AS (
  SELECT channel, conv_id,
    CASE WHEN rn = k THEN 1.0 ELSE 0.0 END AS last_touch,
    CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END AS first_touch,
    1.0 / CAST(k AS DOUBLE) AS linear,
    w / sum(w) OVER (PARTITION BY conv_id) AS time_decay,
    CASE WHEN k = 1 THEN 1.0
         WHEN k = 2 THEN 0.5
         WHEN rn = 1 OR rn = k THEN 0.4
         ELSE 0.2 / (CAST(k AS DOUBLE) - 2.0) END AS position
  FROM paired
)
SELECT channel,
  CAST(count(DISTINCT conv_id) AS BIGINT) AS conversions,
  CAST(count(*) AS BIGINT) AS touches,
  sum(last_touch) AS last_touch,
  sum(first_touch) AS first_touch,
  sum(linear) AS linear,
  sum(time_decay) AS time_decay,
  sum(position) AS position
FROM scored
GROUP BY channel
"""


QUERIES = {"attribution_report_events": attribution_report_events}
ORACLE_SQL = {"attribution_report_events": ATTRIBUTION_SQL}


_SHAP_CHANNELS = ("view", "click", "signup")


def shapley_attribution_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shapley-value attribution of purchase conversions across the
    view/click/signup exposure channels
    (operators/attribution.py::shapley_attribution): coalition values
    are exact-set conversion rates built from INTEGER (n, k) cell
    counts, so the Shapley arithmetic lands on identical doubles in
    both engines. On this synthetic corpus every user is exposed to
    every channel, so the credits degenerate to the symmetric 1/3
    split — the contract gates the machinery; the unit tests
    (test_attribution.py) carry the non-degenerate axiom checks."""
    from ..operators.attribution import shapley_attribution

    return shapley_attribution(
        load_table(spark, sf_dir, "events"), channels=_SHAP_CHANNELS
    )


def _shapley_sql() -> str:
    c1, c2, c3 = _SHAP_CHANNELS
    filters = []
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                key = f"{a}{b}{c}"
                cond = f"c1 = {a} AND c2 = {b} AND c3 = {c}"
                filters.append(
                    f"count(*) FILTER ({cond}) AS n{key},\n"
                    f"    sum(conv) FILTER ({cond}) AS k{key}"
                )
    cells = ",\n    ".join(filters)
    vdefs = ",\n    ".join(
        f"CASE WHEN n{k} > 0 THEN CAST(k{k} AS DOUBLE) "
        f"/ CAST(n{k} AS DOUBLE) ELSE 0.0 END AS v{k}"
        for k in [
            f"{a}{b}{c}"
            for a in (0, 1)
            for b in (0, 1)
            for c in (0, 1)
        ]
    )

    def exposed(pos: int) -> tuple[str, str]:
        keys = [
            f"{a}{b}{c}"
            for a in (0, 1)
            for b in (0, 1)
            for c in (0, 1)
            if f"{a}{b}{c}"[pos] == "1"
        ]
        return (
            " + ".join(f"n{k}" for k in keys),
            " + ".join(f"coalesce(k{k}, 0)" for k in keys),
        )

    def phi(pos: int) -> str:
        def k(me: int, o1: int, o2: int) -> str:
            bits = [0, 0, 0]
            bits[pos] = me
            others = [i for i in range(3) if i != pos]
            bits[others[0]], bits[others[1]] = o1, o2
            return "".join(map(str, bits))

        return (
            f"(v{k(1, 0, 0)} - v{k(0, 0, 0)}) / 3.0"
            f" + (v{k(1, 1, 0)} - v{k(0, 1, 0)}) / 6.0"
            f" + (v{k(1, 0, 1)} - v{k(0, 0, 1)}) / 6.0"
            f" + (v{k(1, 1, 1)} - v{k(0, 1, 1)}) / 3.0"
        )

    rows = []
    for i, ch in enumerate((c1, c2, c3)):
        n_expr, k_expr = exposed(i)
        rows.append(
            f"SELECT '{ch}' AS channel,"
            f" CAST({n_expr} AS BIGINT) AS n_exposed,"
            f" CAST({k_expr} AS BIGINT) AS n_converted,"
            f" {phi(i)} AS shapley FROM vals"
        )
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH per_user AS (
  SELECT user_id,
    max(CASE WHEN event_type = '{c1}' THEN 1 ELSE 0 END) AS c1,
    max(CASE WHEN event_type = '{c2}' THEN 1 ELSE 0 END) AS c2,
    max(CASE WHEN event_type = '{c3}' THEN 1 ELSE 0 END) AS c3,
    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
cells AS MATERIALIZED (
  SELECT
    {cells}
  FROM per_user
),
vals AS (
  SELECT cells.*,
    {vdefs}
  FROM cells
)
{union}
"""


QUERIES["shapley_attribution_events"] = shapley_attribution_events
ORACLE_SQL["shapley_attribution_events"] = _shapley_sql()


_MKV_CHANNELS = ("view", "click", "signup")
_MKV_ROUNDS = 40


def markov_attribution_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Markov removal-effect attribution of purchase conversions over
    view/click/signup touch paths
    (operators/attribution.py::markov_attribution): first-order chain
    from per-user paths truncated at the first conversion, absorption
    probability from 40 unrolled fixpoint rounds, and per-channel
    credit as the normalized removal effect. The oracle replays the
    transition counts AND the identical unrolled rounds (full chain +
    one per removed channel) term for term."""
    from ..operators.attribution import markov_attribution

    return markov_attribution(
        load_table(spark, sf_dir, "events"),
        channels=_MKV_CHANNELS,
        rounds=_MKV_ROUNDS,
    )


def _markov_sql() -> str:
    chans = list(_MKV_CHANNELS)
    transient = ["start", *chans]
    keep = ", ".join(f"'{c}'" for c in [*chans, "purchase"])

    def pcol(s: str, d: str) -> str:
        return f"p_{s}_{d}"

    prob_cols = []
    for s in transient:
        tot = f"sum(CASE WHEN src = '{s}' THEN n ELSE 0 END)"
        for d in ["conv", *chans]:
            num = (
                f"sum(CASE WHEN src = '{s}' AND dst = '{d}' "
                f"THEN n ELSE 0 END)"
            )
            prob_cols.append(
                f"CASE WHEN {tot} > 0 THEN CAST({num} AS DOUBLE) "
                f"/ CAST({tot} AS DOUBLE) ELSE 0.0 END AS {pcol(s, d)}"
            )
    prob_block = ",\n    ".join(prob_cols)
    parts = [
        f"""mseq AS MATERIALIZED (
  SELECT user_id AS u,
    row_number() OVER (PARTITION BY user_id
                       ORDER BY epoch_ns(ts), event_id) AS rn,
    CASE WHEN event_type = 'purchase' THEN 'conv'
         ELSE event_type END AS t
  FROM events
  WHERE event_type IN ({keep}) AND user_id IS NOT NULL
    AND ts IS NOT NULL
),
mcut AS MATERIALIZED (
  SELECT u, rn, t FROM (
    SELECT u, rn, t,
      min(CASE WHEN t = 'conv' THEN rn END)
        OVER (PARTITION BY u) AS conv_rn
    FROM mseq
  ) WHERE conv_rn IS NULL OR rn <= conv_rn
),
mtrans AS (
  SELECT coalesce(lag(t) OVER (PARTITION BY u ORDER BY rn), 'start')
           AS src,
         t AS dst
  FROM mcut
  UNION ALL
  SELECT t AS src, 'null' AS dst
  FROM (SELECT u, max_by(t, rn) AS t FROM mcut GROUP BY u)
  WHERE t <> 'conv'
),
mcounts AS MATERIALIZED (
  SELECT src, dst, count(*) AS n FROM mtrans GROUP BY 1, 2
),
tp AS MATERIALIZED (
  SELECT
    {prob_block}
  FROM mcounts
)"""
    ]

    def scenario(tag: str, removed: "str | None") -> None:
        zeros = ", ".join(f"0.0 AS p_{s}" for s in transient)
        parts.append(f"m{tag}0 AS (SELECT {zeros})")
        for k in range(1, _MKV_ROUNDS + 1):
            exprs = []
            for s in transient:
                acc = pcol(s, "conv")
                for d in chans:
                    if d == removed:
                        continue
                    acc = f"{acc} + {pcol(s, d)} * p_{d}"
                exprs.append(f"{acc} AS p_{s}")
            parts.append(
                f"m{tag}{k} AS (SELECT {', '.join(exprs)} "
                f"FROM m{tag}{k - 1} CROSS JOIN tp)"
            )

    scenario("f", None)
    for c in chans:
        scenario(c, c)
    last = _MKV_ROUNDS
    sel = ", ".join(
        [f"f.p_start AS p_full"]
        + [f"m{c}.p_start AS prem_{c}" for c in chans]
    )
    joins = " CROSS JOIN ".join(
        [f"mf{last} f"] + [f"m{c}{last} m{c}" for c in chans]
    )
    re_exprs = ", ".join(
        f"CASE WHEN p_full > 0.0 THEN 1.0 - prem_{c} / p_full "
        f"ELSE 0.0 END AS re_{c}"
        for c in chans
    )
    total = " + ".join(f"re_{c}" for c in chans)
    rows = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS channel, p_full AS p_conv_full, "
        f"prem_{c} AS p_conv_removed, re_{c} AS removal_effect, "
        f"CASE WHEN {total} > 0.0 THEN re_{c} / ({total}) "
        f"ELSE 0.0 END AS credit FROM mre"
        for c in chans
    )
    parts.append(f"mres AS (SELECT {sel} FROM {joins})")
    parts.append(f"mre AS (SELECT mres.*, {re_exprs} FROM mres)")
    return "WITH " + ",\n".join(parts) + "\n" + rows


QUERIES["markov_attribution_events"] = markov_attribution_events
ORACLE_SQL["markov_attribution_events"] = _markov_sql()
