"""User-facing SQL API: run ANSI SQL over the catalog tables.

The reference has no SQL layer at all (SURVEY.md §4); on Spark the
SQL surface is free — same Catalyst plans as the DataFrame API — so
we expose it: every catalog table becomes a temp view and arbitrary
``spark.sql`` runs against them. DataFrame plans and SQL text are
interchangeable (tests assert a SQL query equals its DataFrame twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import catalog


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Register all catalog tables as temp views, run ``query``."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(query)


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """Expose registry queries as temp views: after this,
    ``spark.sql("SELECT * FROM q5_regional_revenue")`` works — every
    operator result is a SQL-composable relation (views are lazy;
    nothing executes until queried). ``names`` restricts the set;
    default registers every registry query."""
    from . import registry

    picked = list(registry.SPECS) if names is None else names
    for name in picked:
        registry.SPECS[name].fn(spark, sf_dir).createOrReplaceTempView(name)
    return picked
