"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship query (config-driven CSS field extraction — the
  reference's core operation) over /root/testdata/sf0.001.
- queries(): the full catalog from datascrapexter_spark.queries — one entry
  per operator family in SURVEY.md §2 plus the training-data-pipeline ops.
- oracle_sql(): the matching DuckDB SQL from datascrapexter_spark.oracles.
  q30_crawl_rounds (iterative crawl) intentionally has no oracle: the driver
  records a rows-only check; exact crawl-order/seen-set parity is asserted
  by tests/test_crawl_engine.py against a sequential oracle simulator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datascrapexter_spark.oracles import ORACLES
from datascrapexter_spark.queries import QUERIES, q12_field_extraction


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q12_field_extraction(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
