"""Single merged view of every catalog module.

`ALL_QUERIES` / `ALL_ORACLES` are what __spark_entry__, the tests and
bench.py consume; add new catalog modules here and everywhere picks
them up. A name collision across modules is a bug — guarded at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (catalog, catalog_analytics, catalog_ext, catalog_stream,
               catalog_ts, tpch)

_QUERY_PARTS = (
    catalog.SPARK_QUERIES,
    catalog_ext.SPARK_QUERIES_EXT,
    catalog_ts.SPARK_QUERIES_TS,
    tpch.SPARK_QUERIES_TPCH,
    catalog_stream.SPARK_QUERIES_STREAM,
    catalog_analytics.SPARK_QUERIES_ANALYTICS,
)
_ORACLE_PARTS = (
    catalog.ORACLE_SQL,
    catalog_ext.ORACLE_SQL_EXT,
    catalog_ts.ORACLE_SQL_TS,
    tpch.ORACLE_SQL_TPCH,
    catalog_stream.ORACLE_SQL_STREAM,
    catalog_analytics.ORACLE_SQL_ANALYTICS,
)

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _part in _QUERY_PARTS:
    for _name in _part:
        if _name in ALL_QUERIES:
            raise RuntimeError(f"duplicate catalog query name {_name!r}")
    ALL_QUERIES.update(_part)

ALL_ORACLES: dict[str, str] = {}
for _part in _ORACLE_PARTS:
    ALL_ORACLES.update(_part)

_unknown = set(ALL_ORACLES) - set(ALL_QUERIES)
if _unknown:
    raise RuntimeError(f"oracle without query: {sorted(_unknown)}")
