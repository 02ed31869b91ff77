"""Prediction-store lifecycle operators: denormalization, retention,
stats — the three read/write-path capabilities the reference's
prediction service wraps around its predictions table and that round-6
review flagged as the remaining parity gaps.

Reference parity:
- :func:`denormalize_predictions` — prediction_service/src/
  predictor.py:239 ``_denormalize_predictions``: invert the fitted
  RobustScaler (``X = X_scaled * scale_ + center_``) to map model
  outputs back to USD price space, with the reference's Method-2
  fallback (last price ± 20%·scaled/3) when no scaler stats exist for
  a key.
- :func:`retention_cleanup` — prediction_service/src/
  data_writer.py:290 ``cleanup_old_predictions``: age out predictions
  older than the cutoff. Cassandra needs TTLs for this; a partitioned
  parquet/lakehouse store does it as a PARTITION-PRUNED delete — drop
  whole ``pred_date=…`` directories, never rewrite surviving data —
  plus an audit relation of what was dropped vs kept.
- :func:`prediction_stats` — prediction_service/src/
  data_writer.py:315 ``get_prediction_stats``: per (product, model)
  count + earliest/latest prediction_time, extended with the
  horizon-error summary the reference computes separately in
  metrics.py.

Scale notes: denormalize/stats are one broadcast-joinable stats
relation plus linear passes — no new shuffle beyond the per-key agg.
Retention is metadata-scale by design: the only driver-side work is
over PARTITION directories (O(days), never O(rows)), which is exactly
how retention must work on a 100 TB store — drop manifests/dirs,
don't scan data.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F


def denormalize_predictions(preds: DataFrame, stats: DataFrame, *,
                            key: str = "product_id",
                            scaled_col: str = "pred_scaled",
                            center_col: str = "c_med",
                            q1_col: str = "c_q1", q3_col: str = "c_q3",
                            last_price_col: str = "last_close",
                            out_col: str = "predicted_price") -> DataFrame:
    """Map scaled model outputs back to price space using fitted
    RobustScaler stats (predictor.py:239).

    Inverse of the forward robust transform the engine fits
    (scale_fit_transform / grouped_scale): with iqr = q3 − q1,

        iqr != 0:  price = scaled · iqr + center
        iqr == 0:  price = scaled + center          (forward was x−c)
        no stats:  price = last · (1 + scaled/3·0.2)  (Method-2
                   fallback — scaled ∈ [−3, 3] read as ±20% move)

    `stats` is one row per key (center/q1/q3, optional last price for
    the fallback) — broadcast-sized by construction, so the join adds
    no shuffle to the predictions stream.
    """
    iqr = F.col(q3_col) - F.col(q1_col)
    s = F.col(scaled_col)
    inv = F.when(F.col(center_col).isNull(),
                 F.col(last_price_col)
                 * (F.lit(1.0) + s / F.lit(3.0) * F.lit(0.2))) \
           .when(iqr != 0, s * iqr + F.col(center_col)) \
           .otherwise(s + F.col(center_col))
    return (preds.join(F.broadcast(stats), key, "left")
            .withColumn(out_col, inv)
            .drop(center_col, q1_col, q3_col, last_price_col))


def retention_cleanup(spark: SparkSession, store_path: str, *,
                      cutoff: str,
                      partition_col: str = "pred_date") -> DataFrame:
    """Age out store partitions older than `cutoff` (data_writer.py:290
    ``cleanup_old_predictions``) and return the audit relation:
    one row per partition — (pred_date, action, row_count) with
    action ∈ {'dropped', 'kept'}.

    The delete is partition-pruned: whole ``pred_date=…`` directories
    are removed; surviving partitions are never read, rewritten or
    touched (byte-identical after cleanup — pytest-pinned). Row counts
    come from one grouped count over the store (parquet footer
    metadata, not data pages). The audit is materialized BEFORE any
    directory is removed — it is O(#partitions), the one place a
    driver-side collect is the correct tool (catalog/manifest-scale,
    same class as a metastore listing)."""
    audit_rows = (spark.read.parquet(store_path)
                  .groupBy(partition_col)
                  .agg(F.count(F.lit(1)).alias("row_count"))
                  .withColumn(
                      "action",
                      F.when(F.col(partition_col) < F.lit(cutoff).cast(
                          "date"), F.lit("dropped"))
                       .otherwise(F.lit("kept")))
                  .collect())
    for r in audit_rows:
        if r["action"] == "dropped":
            sub = os.path.join(store_path,
                               f"{partition_col}={r[partition_col]}")
            if os.path.isdir(sub):
                shutil.rmtree(sub)
    out = spark.createDataFrame(
        [(r[partition_col], r["action"], r["row_count"])
         for r in audit_rows],
        schema=f"{partition_col} date, action string, row_count long")
    return out


def prediction_stats(preds: DataFrame, actuals: DataFrame, *,
                     key: str = "product_id",
                     model_col: str = "model_version",
                     pred_time_col: str = "origin_time",
                     target_time_col: str = "target_time",
                     pred_col: str = "predicted_price",
                     actual_ts: str = "bucket_start",
                     actual_col: str = "close") -> DataFrame:
    """Per-(product, model) prediction-store stats
    (data_writer.py:315 ``get_prediction_stats``): total count,
    earliest/latest prediction_time, plus the MAE of predictions whose
    target time has realized — the error-summary read path.

    The MAE reduces through a fixed-point BIGINT sum
    (floor(|err|·1e6 + 0.5) per row) so the aggregate is order-free —
    map-side combinable at any partitioning, and bit-identical to the
    SQL oracle's integer sum. Left join on (key, target_time): a
    prediction without a realized actual still counts toward
    count/earliest/latest, exactly like the reference's COUNT(*) read.
    """
    a = actuals.select(F.col(key), F.col(actual_ts).alias("_att"),
                       F.col(actual_col).alias("_actual"))
    j = preds.join(a, (preds[key] == a[key])
                   & (preds[target_time_col] == a["_att"]),
                   "left").drop(a[key]).drop("_att")
    err_fp = F.when(
        F.col("_actual").isNotNull(),
        F.floor(F.abs(F.col(pred_col) - F.col("_actual"))
                * F.lit(1000000.0) + F.lit(0.5)).cast("long"))
    return (j.groupBy(key, model_col)
            .agg(F.count(F.lit(1)).alias("total_predictions"),
                 F.min(pred_time_col).alias("earliest_prediction"),
                 F.max(pred_time_col).alias("latest_prediction"),
                 F.sum(err_fp).alias("_sum_fp"),
                 F.count(err_fp).alias("_n_scored"))
            .withColumn(
                "mae",
                F.round(F.col("_sum_fp")
                        / (F.col("_n_scored") * F.lit(1000000.0)), 6)
                + F.lit(0.0))
            .withColumn("scored_predictions", F.col("_n_scored"))
            .drop("_sum_fp", "_n_scored"))
