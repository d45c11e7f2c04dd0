"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` exposes every implemented operator as (spark, sf_dir) →
DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent SQL per query
(omitted only for hash-dependent ops like MinHash-LSH where no
engine-portable SQL expression exists — those get rows-only checks).

The real catalog lives in sif_spark/queries.py; this module is a thin
adapter so the library, tests, bench.py and the driver all share one
query inventory.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sif_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
