"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from coinbase_data_pipeline_spark.plans import catalog
from coinbase_data_pipeline_spark.plans.registry import ALL_ORACLES, ALL_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: tick stream → typed parse → 5-min OHLCV candles
    at sf0.001 — the reference's core ingest+aggregate path. The full
    feature set, forecasts, and every other capability run through
    queries()/oracle_sql()."""
    return catalog.q_candle_resample(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ALL_ORACLES)
