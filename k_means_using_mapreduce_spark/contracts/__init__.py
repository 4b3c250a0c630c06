"""Merged driver-contract registry.

Each submodule declares a ``QUERIES`` dict (name → PySpark builder) and
an ``ORACLE_SQL`` dict (name → DuckDB SQL). This package merges them for
``__spark_entry__.py``. A query with no oracle entry gets the driver's
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    assoc_queries,
    attribution_queries,
    augment_queries,
    bloom_queries,
    budget_queries,
    calibration_queries,
    card_queries,
    causal_queries,
    cleaning_queries,
    clseval_queries,
    coreset_queries,
    dbscan_queries,
    dedup_queries,
    diff_queries,
    encode_queries,
    entity_queries,
    freq_queries,
    graph_queries,
    hypothesis_queries,
    index_queries,
    ivm_queries,
    kmeans_queries,
    line_queries,
    lm_queries,
    multimodal_queries,
    overlap_queries,
    packing_queries,
    pca_queries,
    pipeline_queries,
    pq_queries,
    privacy_queries,
    quality_queries,
    quantize_queries,
    ranking_queries,
    rankjoin_queries,
    recommend_queries,
    regression_queries,
    repetition_queries,
    reshape_queries,
    robust_queries,
    rollup_queries,
    rplsh_queries,
    sampling_queries,
    selection_queries,
    semdedup_queries,
    setop_queries,
    similarity_queries,
    simpairs_queries,
    skew_queries,
    span_queries,
    sql_queries,
    stats_queries,
    streaming_queries,
    survival_queries,
    temporal_queries,
    text_queries,
    timeseries_queries,
    tpch_advanced_queries,
    tpch_queries,
    tsmatch_queries,
    url_queries,
    window_queries,
    zorder_queries,
)

_MODULES = [
    kmeans_queries,
    augment_queries,
    ivm_queries,
    causal_queries,
    attribution_queries,
    regression_queries,
    assoc_queries,
    bloom_queries,
    budget_queries,
    survival_queries,
    card_queries,
    coreset_queries,
    dbscan_queries,
    clseval_queries,
    calibration_queries,
    url_queries,
    zorder_queries,
    dedup_queries,
    diff_queries,
    encode_queries,
    entity_queries,
    line_queries,
    index_queries,
    freq_queries,
    graph_queries,
    hypothesis_queries,
    lm_queries,
    text_queries,
    repetition_queries,
    cleaning_queries,
    pipeline_queries,
    packing_queries,
    quality_queries,
    quantize_queries,
    ranking_queries,
    rankjoin_queries,
    recommend_queries,
    pca_queries,
    pq_queries,
    privacy_queries,
    similarity_queries,
    skew_queries,
    simpairs_queries,
    tpch_queries,
    tpch_advanced_queries,
    sql_queries,
    span_queries,
    semdedup_queries,
    setop_queries,
    stats_queries,
    robust_queries,
    streaming_queries,
    temporal_queries,
    timeseries_queries,
    rollup_queries,
    tsmatch_queries,
    reshape_queries,
    rplsh_queries,
    multimodal_queries,
    overlap_queries,
    sampling_queries,
    selection_queries,
    window_queries,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
#: query name -> contract family (the submodule stem, e.g. "dedup",
#: "graph", "tpch") — bench.py groups per-family subtotals from this.
QUERY_FAMILY: dict[str, str] = {}

for _m in _MODULES:
    _fam = _m.__name__.rsplit(".", 1)[1].removesuffix("_queries")
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate contract query name: {_name}")
        QUERIES[_name] = _fn
        QUERY_FAMILY[_name] = _fam
    ORACLE_SQL.update(getattr(_m, "ORACLE_SQL", {}))
