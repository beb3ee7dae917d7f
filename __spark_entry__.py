"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query on sf0.001 (ML-Transformer-driven
  filtered nearest-neighbor spatial join).
- ``queries()`` — every implemented operator from SURVEY.md §2 plus the
  training-data-pipeline operators (see
  spark_ml_spatialjointransformer_spark/queries/).
- ``oracle_sql()`` — the DuckDB-equivalent SQL for each query (queries
  without an entry here are rows-only checked).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ml_spatialjointransformer_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return QUERIES["f1_filtered_nearest"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # oracle comparison requires UTC session time (DuckDB timestamps
            # are UTC-naive)
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(qd.fn) for name, qd in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle}
