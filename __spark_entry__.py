"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``hyper_storage_spark``; this module re-exports its
query catalog (hyper_storage_spark/queries.py) in the driver's shape:

- ``entry(spark)`` — flagship query (TPC-H Q1 shape) on sf0.001.
- ``queries()`` — one entry per implemented operator (SURVEY.md §2
  parity ops + the relational/pipeline extension surface).
- ``oracle_sql()`` — DuckDB-equivalent SQL for EVERY driver-tier
  query (50/50 since round 5): operators whose internals are
  engine-specific (hash families, k-means cells) are gated through
  SQL-predictable CONTRACT rows — recall floors vs the exact result,
  verified-precision equalities, banding-completeness invariants —
  with their raw outputs kept in the extra tier
  (hyper_storage_spark/queries.py EXTRA_QUERIES).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hyper_storage_spark.queries import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hyper_storage_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from hyper_storage_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
