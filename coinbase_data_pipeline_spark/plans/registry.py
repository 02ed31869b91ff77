"""Single merged view of every catalog module.

`ALL_QUERIES` / `ALL_ORACLES` are what __spark_entry__, the tests and
bench.py consume; add new catalog modules here and everywhere picks
them up. A name collision across modules is a bug — guarded at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (catalog, catalog_analytics, catalog_corpus, catalog_ext,
               catalog_multimodal, catalog_stream, catalog_ts, tpch)

_QUERY_PARTS = (
    catalog.SPARK_QUERIES,
    catalog_ext.SPARK_QUERIES_EXT,
    catalog_ts.SPARK_QUERIES_TS,
    tpch.SPARK_QUERIES_TPCH,
    catalog_stream.SPARK_QUERIES_STREAM,
    catalog_analytics.SPARK_QUERIES_ANALYTICS,
    catalog_corpus.SPARK_QUERIES_CORPUS,
    catalog_multimodal.SPARK_QUERIES_MULTIMODAL,
)
_ORACLE_PARTS = (
    catalog.ORACLE_SQL,
    catalog_ext.ORACLE_SQL_EXT,
    catalog_ts.ORACLE_SQL_TS,
    tpch.ORACLE_SQL_TPCH,
    catalog_stream.ORACLE_SQL_STREAM,
    catalog_analytics.ORACLE_SQL_ANALYTICS,
    catalog_corpus.ORACLE_SQL_CORPUS,
    catalog_multimodal.ORACLE_SQL_MULTIMODAL,
)

_MERGED: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _part in _QUERY_PARTS:
    for _name in _part:
        if _name in _MERGED:
            raise RuntimeError(f"duplicate catalog query name {_name!r}")
    _MERGED.update(_part)

# The external correctness driver hashes the FIRST 50 keys of `queries()`
# in insertion order.  Queries that never received a driver row in round
# 1 (plus any whose implementation changed since and therefore need a
# fresh row) are listed here so they land inside that window; round-1
# green rows for the rest stay on record in CORRECTNESS_r01.json.
_CHECK_FIRST = [
    # red in round 2 — oracle HUGEINT→BIGINT cast fixed, fresh rows
    "sessionize", "range_join",
    # oracle-paired but never driver-checked in rounds 1-2
    "kmeans_assign", "candle_upsert", "decontaminate", "pii_scrub",
    "multimodal_meta", "multimodal_frames", "max_drawdown",
    "rolling_correlation", "streaming_late_candles", "candle_grid_fill",
    "cross_sectional_rank", "mixture_resample", "value_histogram",
    "stratified_sample", "text_normalize", "corpus_stats",
    # implementation changed in round 3 — need fresh rows
    # (q3/q5: forced customer/supplier broadcasts dropped;
    #  dedup_embedding: distinct() → first-matching-band emission;
    #  token_packing: salted stratum window)
    "q3_shipping_priority", "q5_local_supplier",
    "dedup_embedding", "token_packing",
    # new in round 3 (each has an oracle) — appended as implemented
    # Rows-only queries (model_score, approx_distinct_users, the EWM
    # family) stay OUT of this window: they return `err: no_oracle`
    # and waste a slot. Green rows for everything else are already on
    # record in CORRECTNESS_r01/r02.
]

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _name in _CHECK_FIRST:
    if _name in _MERGED:
        ALL_QUERIES[_name] = _MERGED[_name]
for _name, _fn in _MERGED.items():
    if _name not in ALL_QUERIES:
        ALL_QUERIES[_name] = _fn

ALL_ORACLES: dict[str, str] = {}
for _part in _ORACLE_PARTS:
    ALL_ORACLES.update(_part)

_unknown = set(ALL_ORACLES) - set(ALL_QUERIES)
if _unknown:
    raise RuntimeError(f"oracle without query: {sorted(_unknown)}")
