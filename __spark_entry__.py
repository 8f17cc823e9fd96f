"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the vspace_spark query registry: every implemented
operator from SURVEY.md §2 is registered in ``vspace_spark/queries/``
with a ``(spark, sf_dir) -> DataFrame`` callable and (when
SQL-expressible) a DuckDB oracle. tests/test_oracle_parity.py runs the
same comparison locally at sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from vspace_spark.queries import ORACLES, QUERIES, load_all

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's global term-statistics query (A1) over
    1..3-grams of the sf0.001 documents corpus."""
    return QUERIES["term_stats_ngram"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
