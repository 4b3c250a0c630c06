"""Custom stateful streaming operator: running per-cluster centroid
maintenance via ``applyInPandasWithState``.

The batch engine recomputes centroids per iteration; this operator
maintains them *incrementally* over an unbounded assigned stream —
per cluster, the state is ``(count, per-dim sum)``, and each
micro-batch folds its rows in and emits the refreshed running centroid.
This is the `applyInPandasWithState` pattern for operators Spark's
built-in streaming aggregates can't express (here: emitting a derived
array column per group per batch with explicit state control and
GroupStateTimeout semantics).

State size: K rows × (8 B count + 8 B × dim) — independent of stream
length. The grouping key is ``cid``, so state shuffles only on K keys.

All kernel code is nested so cloudpickle ships it by value (workers
never import this package).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "cid INT, n BIGINT, centroid ARRAY<DOUBLE>"
)
STATE_SCHEMA = "n BIGINT, sums ARRAY<DOUBLE>"


def running_centroids(
    assigned_stream: DataFrame,
    features_col: str = "features",
) -> DataFrame:
    """Maintain running centroids over a streaming assigned relation
    (columns: ``cid`` + ``features_col``). Emits one row per cluster
    per micro-batch: (cid, n, centroid) where centroid is the running
    mean of every row seen so far."""

    fcol = features_col

    def update_fn(key, pdfs, state: GroupState):
        import pandas as pd

        (cid,) = key
        if state.exists:
            n, sums = state.get
            sums = list(sums)
        else:
            n, sums = 0, None
        for pdf in pdfs:
            for vec in pdf[fcol]:
                if vec is None:
                    continue
                if sums is None:
                    sums = [0.0] * len(vec)
                n += 1
                for i, v in enumerate(vec):
                    sums[i] += float(v)
        if sums is not None and n > 0:
            state.update((n, sums))
            yield pd.DataFrame(
                {
                    "cid": [cid],
                    "n": [n],
                    "centroid": [[s / n for s in sums]],
                }
            )

    return assigned_stream.groupBy("cid").applyInPandasWithState(
        update_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
