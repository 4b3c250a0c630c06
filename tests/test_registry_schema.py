"""Registry-level output-shape net (round-6 verdict item #1).

The round-6 red row `glm_poisson_lineitem` failed not on values but on
SHAPE: the driver's canonicalizer sorts result rows with pandas, which
throws `TypeError: unhashable type: 'list'` on any array-typed column
before a comparison even runs. The engine-side convention is to
flatten composite outputs into scalar columns in the contract wrapper
(kmeans centroids → c0..c{d}, GLR coefficients → b1..b3) while the
operator API keeps the richer type.

This test builds every registered contract's DataFrame at the small
SF and asserts no output column is array/map/struct-typed — closing
the whole class the way the canon-stability net closed partition
drift. Runs at sf0.001 so iterative contracts (whose *construction*
executes driver-loop jobs) stay cheap.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

QUERY_NAMES = sorted(entry_mod.queries().keys())

_COMPOSITE = (ArrayType, MapType, StructType)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_composite_output_columns(name, spark, sf_small):
    sdf = entry_mod.queries()[name](spark, sf_small)
    bad = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if isinstance(f.dataType, _COMPOSITE)
    ]
    assert not bad, (
        f"{name}: driver canon cannot sort composite columns {bad}; "
        "flatten them into scalar columns in the contract wrapper "
        "(kmeans centroid convention)"
    )
