"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship parse->enrich->route->aggregate pipeline on
sf0.001; queries()/oracle_sql() map one entry per operator family from
SURVEY.md §2 to a DuckDB-checkable equivalent (see
redeye_spark/entry_queries.py for the construction strategy).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redeye_spark import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full log pipeline aggregate on sf0.001."""
    return EQ.q_agg_counts_hour(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
