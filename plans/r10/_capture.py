#!/usr/bin/env python
"""Capture `.explain('formatted')` for named contract queries into
plans/r10/<name>_<tag>.txt (tag = before|after). Usage:

    python plans/r10/_capture.py before q1 q2 ...

Runs on the sf dir from $SPARK_GRAFT_SF_DIR (default sf0.1), the same
session config as bench.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from k_means_using_mapreduce_spark import contracts
    from k_means_using_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="plan-capture")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = contracts.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(
                f"== {name} ({tag}) explain('formatted'), "
                f"{os.path.basename(SF_DIR)} ==\n"
            )
            f.write(plan)
        print(f"captured {name}_{tag}")


if __name__ == "__main__":
    main()
