"""SQL entry point: register the fixture tables as temp views and run
arbitrary SQL through Catalyst — the reference has no query language
(SURVEY.md §3); this is the surface a user of a general engine expects.

``register_views(spark, sf_dir)`` + ``spark.sql(...)`` gives the same
plans as the DataFrame API (one Catalyst), so every registry query could
equivalently be phrased here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.tables import TABLES, load_table

__all__ = ["register_views", "sql"]


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple[str, ...] = TABLES) -> None:
    """Temp views named exactly like the DuckDB oracle's (region, nation,
    ..., documents, embeddings)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)
