#!/usr/bin/env python3
"""Regenerate EXPLAIN.md — formatted physical plans of the headline
queries, with their non-empty PushedFilters lines as evidence that
predicates reach the parquet scans."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from coinbase_data_pipeline_spark.plans.registry import ALL_QUERIES
from coinbase_data_pipeline_spark.session import get_spark

SF = "/root/testdata/sf0.01"

PICKS = [
    ("candle_resample", "tick->candle: partial agg before one exchange"),
    ("volume_features", "feature family: one exchange + one sort + one Window"),
    ("time_range_fetch", "range predicate pushed to parquet row groups"),
    ("q5_local_supplier", "all dims broadcast, no sort-merge join"),
    ("q18_large_orders", "fact self-agg as semi-join filter"),
    ("latest_n_per_key", "WindowGroupLimit below the sort"),
    ("dedup_minhash_lsh", "banded candidates, no cartesian product"),
    ("ann_lsh", "band-bucket join then re-rank"),
    ("asof_join", "as-of via key-partitioned ordered window"),
    ("candle_upsert",
     "incremental merge: broadcast semi/anti split, batch-sized work"),
    ("dedup_ngram_jaccard",
     "prefix-prefix equi-join candidates (rarest-gram order), "
     "exact verify after"),
    ("decontaminate",
     "broadcast eval n-gram set, one shuffle on the corpus key"),
    ("token_packing",
     "salted prefix sum: range-shard windows + broadcast offset join"),
    ("kmeans_assign",
     "broadcast centroids per round, argmin row-local"),
    ("candle_grid_fill",
     "grid exploded from per-key span, completion shares key shuffle"),
    ("gopher_quality",
     "pure-expression rule filter: zero exchanges, 2-column scan"),
    ("price_anomalies",
     "one window family: lag + rolling stddev share a single shuffle"),
    ("pq_encode",
     "joint per-subspace Lloyd: broadcast codebooks, one mean shuffle"),
    ("ann_pq",
     "ADC: broadcast LUT equi-join, ordered subspace sum, top-k"),
    ("dedup_incremental",
     "cross-relation banded join: history only via its signatures"),
    ("knn_graph",
     "LSH self-join graph: band-bucket exchange, no cartesian"),
    ("dsir_weights",
     "bucket stats broadcast back over one doc-keyed shuffle"),
    ("rolling_beta",
     "bucket-keyed market mean joins back into the per-key windows"),
    ("quality_classifier_scores",
     "GD rounds: broadcast weights, doc-keyed folds, tiny grads"),
    ("dedup_spans",
     "scalar gram-hash equi-join; gram strings never shuffle"),
    ("graph_triangles",
     "degree-oriented wedge joins over the checkpointed edge list"),
    ("sales_rollup",
     "ROLLUP via one Expand + single aggregation, no re-scans"),
    ("hopping_volume",
     "overlapping windows via Expand, one partial-agg exchange"),
    ("approx_quantiles_hist",
     "one-pass binned sketch; broadcast bounds; tiny cum window"),
    ("fixed_k_sample",
     "hash-gate prefilter bounds the per-stratum ranking window"),
    ("purchase_attribution",
     "linear as-of: one user exchange, one ordered fill pass"),
    ("bm25_search",
     "broadcast query terms; df restricted to query vocabulary"),
    ("boilerplate_ngrams",
     "df + join keyed by 8-byte gram hash, never the gram string"),
    ("dedup_containment",
     "prefix-filter join on hashed rarest grams; verify on arrays"),
    ("dedup_tfidf_cosine",
     "inverted-index posting join; fixed-point BIGINT dot products"),
    ("kmv_distinct_users",
     "sharded k-min partials merged per day; no full-day sort"),
    ("zorder_layout",
     "distributed ntile: z-shard windows + broadcast offsets"),
    ("bloom_semi_join",
     "one-row bloom map broadcast; probe filtered pre-shuffle"),
    ("pmi_collocations",
     "tokenize once; vocab broadcast join-backs; top-N on survivors"),
    ("kmv_set_ops",
     "sharded k-min per audience; theta math on two 1-row sketches"),
    ("heavy_hitters_cms",
     "token counts once; fixed d-by-w grid broadcast for the min"),
    ("holt_winters",
     "one key exchange into the per-key Arrow recursion"),
    ("doc_pagerank",
     "per-round dst shuffle of fixed-point longs, partial-agg sums"),
    ("denormalize_predictions",
     "stats broadcast twice (forward + inverse); one key window"),
    ("prediction_stats",
     "mapInPandas score -> left join actuals -> fixed-point agg"),
    ("holt_param_sweep",
     "whole grid inside ONE per-key Arrow recursion; window argmin"),
    ("recent_predictions",
     "trailing-window LIMIT read: WindowGroupLimit below the sort"),
    ("walk_forward_splits",
     "CV fold manifest: rank+count share one key exchange"),
    ("holt_cv_sweep",
     "folds x grid inside ONE per-key Arrow recursion; window argmin"),
    ("service_health",
     "two partial-agg rollups + broadcast now; product-sized join"),
    ("predict_single_step",
     "single-horizon head over the window encoder; no h-explode"),
    ("prediction_cadence",
     "lag window + groupBy share ONE (product, model) exchange"),
    ("curriculum_dropout",
     "hash-gated masks: pure expressions, zero added exchanges"),
    ("curriculum_augment",
     "pinned draw stage parallelizes md5 draws; window stage arithmetic-only"),
    ("rfm_scores",
     "exact distributed ntile: quantile-cut shards + broadcast offsets"),
    ("forecast_losses",
     "two key+time equi-joins, tiny horizon-lag window, one "
     "map-combinable fixed-point agg"),
]


def main() -> None:
    spark = get_spark("explain", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = ["# EXPLAIN — physical plans of headline queries",
           "",
           "Generated from `.explain('formatted')` at sf0.01 (plans are",
           "scale-invariant in shape). Regenerate: "
           "`python tools/gen_explain.py`.",
           ""]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    for name, note in PICKS:
        df = ALL_QUERIES[name](spark, SF)
        s = df._jdf.queryExecution().explainString(mode)
        tree = s.split("\n\n")[0]
        pushed = [ln.strip() for ln in s.splitlines()
                  if "PushedFilters" in ln and "[]" not in ln]
        out.append(f"## {name}\n\n*{note}*\n\n```\n{tree}\n```")
        if pushed:
            out.append("```\n" + "\n".join(pushed[:3]) + "\n```")
        out.append("")
    with open("EXPLAIN.md", "w") as f:
        f.write("\n".join(out))
    print("wrote EXPLAIN.md")


if __name__ == "__main__":
    main()
