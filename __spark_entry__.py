"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship near-dup clustering over sf0.001 documents
queries()     — implemented operators from SURVEY.md §2.6 + training-data
                pipeline extras (dedup, similarity search, text analysis)
oracle_sql()  — DuckDB twins computing identical values (portable
                md5/mod-P hashing, sequential double folds)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: text near-dup clustering
    (signatures → LSH bands → candidate pairs → connected components)."""
    from mfdedup_spark.contract import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mfdedup_spark.contract import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mfdedup_spark.contract import ORACLE_SQL

    return dict(ORACLE_SQL)
