"""SQL catalog surface: register the synthetic tables as temp views so
the engine's full capability is reachable through ``spark.sql``.

The reference has no SQL layer at all (SURVEY.md §3: "There is no
query language"); on Spark the SQL front end is free — every contract
query's oracle SQL is *also* valid Spark SQL modulo dialect, and users
get joins/windows/CTEs against the same tables.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .loaders import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Create (or replace) one temp view per synthetic table. Returns
    the view names."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load_table(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
