"""Single merged view of every catalog module.

`ALL_QUERIES` / `ALL_ORACLES` are what __spark_entry__, the tests and
bench.py consume; add new catalog modules here and everywhere picks
them up. A name collision across modules is a bug — guarded at import.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (catalog, catalog_analytics, catalog_corpus, catalog_ext,
               catalog_multimodal, catalog_pred, catalog_stream,
               catalog_ts, tpch)

_QUERY_PARTS = (
    catalog.SPARK_QUERIES,
    catalog_ext.SPARK_QUERIES_EXT,
    catalog_ts.SPARK_QUERIES_TS,
    tpch.SPARK_QUERIES_TPCH,
    catalog_stream.SPARK_QUERIES_STREAM,
    catalog_analytics.SPARK_QUERIES_ANALYTICS,
    catalog_corpus.SPARK_QUERIES_CORPUS,
    catalog_multimodal.SPARK_QUERIES_MULTIMODAL,
    catalog_pred.SPARK_QUERIES_PRED,
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
    catalog_pred.ORACLE_SQL_PRED,
)

_MERGED: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
for _part in _QUERY_PARTS:
    for _name in _part:
        if _name in _MERGED:
            raise RuntimeError(f"duplicate catalog query name {_name!r}")
    _MERGED.update(_part)

# The external correctness driver hashes the FIRST 50 keys of `queries()`
# in insertion order.  STANDING ROTATION RULE (VERDICT r10 #8, also
# emitted into SURVEY §4 by tools/gen_index.py, which prints the
# due-for-rotation list on every regen): each round's window is
# (a) queries with NO driver row ever, (b) queries whose compute or
# oracle changed this round, (c) everything else OLDEST-EVIDENCE-
# FIRST — so no oracle-paired query's driver evidence ages past 5
# rounds (amended from 4 in r12 per ADVICE r11: 204 queries over 50
# slots is a 4.1-round cycle, and (a)/(b) preemption makes 5 the
# honest worst case the old text understated). Driver rounds
# r01..r04 map to the repo's work sessions 1..4 (one numbering
# scheme).
#
# ROUND-13 WINDOW: (a) none — every oracle-paired query has a driver
# row;
# (b) compute or plan changed in round 13 (optimization round 2):
# streaming_model_score (serve-gate cutoff: per-product unbounded
# collect_set → horizon=1 filter + row_number window with
# WindowGroupLimit pushdown — hash-identical at sf0.1, VERDICT r12
# #1), streaming_touch_join (stream-stream join state partitions
# derived from defaultParallelism instead of the constant 4 — same
# value at local[32], VERDICT r12 #4), q9_product_profit +
# q8_market_share (selective part join moved BEFORE the SF×SF orders
# join; q9 additionally demotes orders from static broadcast via a
# plan-metadata size guard that is a no-op at catalog scales —
# hash-identical at sf0.1 and 100×, VERDICT r12 #7),
# dedup_ngram_jaccard + dedup_containment (_corpus_join_hint budget
# now derived from session config and memoized per plan lineage —
# same decision at every catalog scale, VERDICT r12 #5);
# q21_suppliers_kept_waiting also changed (countDistinct Expand ×3
# removed via per-(order,supplier) pre-aggregation — all-integer,
# hash-identical at 100×; listed in the r08 block below);
# (c) the 11 remaining r08 rows (exactly 5 rounds old — the bound's
# worst case; q8/q9 of that block are already in (b)), then the
# first 33 of the 46 r09 rows alphabetically; the 13 r09 leftovers
# (q15_top_supplier … volume_rollup) rotate r14 at age 5.
_CHECK_FIRST = [
    # (b) round-13-changed compute/plans
    "streaming_model_score", "streaming_touch_join",
    "q9_product_profit", "q8_market_share",
    "dedup_ngram_jaccard", "dedup_containment",
    # (c) oldest evidence first: the 11 r08 leftovers
    "q20_part_promotion", "q21_suppliers_kept_waiting",
    "q22_global_sales_opportunity", "q2_min_cost_supplier",
    "q4_order_priority", "quality_score", "scale_fit_transform",
    "streaming_candles", "text_normalize", "token_count", "top_k",
    # r09 rows (first 33 alphabetically; the 13 leftovers rotate r14)
    "acf", "ann_lsh", "association_rules", "bm25_search", "bollinger",
    "candle_grid_fill", "candle_patterns", "candle_resample_salted",
    "corpus_stats", "csv_ingest", "curriculum_dropout",
    "daily_active_users", "dataset_manifest", "decontaminate",
    "doc_chunk", "donchian_channel", "drawdown_durations",
    "dsir_select", "dsir_weights", "embedding_quantize", "event_paths",
    "event_type_pivot", "fixed_k_sample", "funnel", "kmv_set_ops",
    "max_drawdown", "mixture_resample", "multimodal_frames",
    "multimodal_meta", "ngram_doc_frequency", "pii_scrub",
    "prediction_cadence", "price_quantiles",
]

ALL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ALL_ORACLES: dict[str, str] = {}
for _part in _ORACLE_PARTS:
    ALL_ORACLES.update(_part)

for _name in _CHECK_FIRST:
    # a typo here would silently burn a driver-check slot; rows-only
    # queries (no oracle) would burn one with `err: no_oracle`
    if _name not in _MERGED:
        raise RuntimeError(f"_CHECK_FIRST name not in catalog: {_name!r}")
    if _name not in ALL_ORACLES:
        raise RuntimeError(f"_CHECK_FIRST name is rows-only: {_name!r}")
    ALL_QUERIES[_name] = _MERGED[_name]
# oracle-paired queries fill the rest of the driver window...
for _name, _fn in _MERGED.items():
    if _name not in ALL_QUERIES and _name in ALL_ORACLES:
        ALL_QUERIES[_name] = _fn
# ...and rows-only queries (approx_distinct_users — the one with no
# oracle by declared design) sit STRUCTURALLY last — they can
# never occupy a slot in the driver's first-50 window regardless of
# catalog ordering.
for _name, _fn in _MERGED.items():
    if _name not in ALL_QUERIES:
        ALL_QUERIES[_name] = _fn

_unknown = set(ALL_ORACLES) - set(ALL_QUERIES)
if _unknown:
    raise RuntimeError(f"oracle without query: {sorted(_unknown)}")
