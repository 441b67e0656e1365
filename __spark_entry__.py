"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship pipeline (lineitem-derived link graph → full
distributed Leiden → community size distribution) at sf0.001. ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2 plus the
training-data pipeline ops; see leiden_communities_openmp_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from leiden_communities_openmp_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the deduplicated symmetric link graph from sf0.001
    lineitem, run distributed Leiden, return (community, size) sorted."""
    from leiden_communities_openmp_spark.operators.kernel import LeidenOptions
    from leiden_communities_openmp_spark.operators.leiden import leiden_scale
    from leiden_communities_openmp_spark.queries import _lineitem_sym

    edges = _lineitem_sym(spark, "/root/testdata/sf0.001")
    res = leiden_scale(spark, edges, LeidenOptions())
    return (
        res.membership.groupBy("community")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), F.asc("community"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
