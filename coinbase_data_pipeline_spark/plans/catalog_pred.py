"""Catalog part 9: the prediction-service lifecycle, oracle-paired.

Every remaining read/write-path capability of the reference's
prediction service, each mapped to its seam:

- denormalize_predictions — predictor.py:239 ``_denormalize_predictions``
  (invert the fitted RobustScaler back to USD price space);
- prediction_retention   — data_writer.py:290 ``cleanup_old_predictions``
  (age out store partitions older than the cutoff, audited);
- prediction_stats       — data_writer.py:315 ``get_prediction_stats``
  (per (product, model) count / earliest / latest + error summary);
- model_metrics          — data_writer.py:189 ``write_model_metrics``
  (the per-horizon MAE/RMSE/MAPE/dir-acc metrics-table rows);
- recent_predictions     — data_writer.py:242 ``get_recent_predictions``
  (trailing-window LIMIT read, WindowGroupLimit);
- validate_input         — predictor.py:346 ``validate_input_data``
  (per-product input gate report);
- train_test_split       — Crypto-TS-Model data_loader.py:284
  (ratio-based temporal split);
- walk_forward_splits    — expanding-window CV fold manifest (the
  evaluation harness over optimize_model.py's loop);
- holt_param_sweep       — optimize_model.py's hyperparameter search,
  re-expressed as a deterministic grid sweep.

ROUNDING DOCTRINE (learned from a real hash mismatch in this module):
an exact integer sum/count ratio can land on an exact 6dp midpoint,
where Spark's shortest-repr HALF_UP round and DuckDB's
round(x*1e6)/1e6 disagree — every exact ratio here rounds in INTEGER
arithmetic ((2a + b) div (2b), positive operands) and divides by 1e6
after; only sqrt-derived outputs (irrational, never terminating
midpoints) keep a double round.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Window, functions as F

from ..operators import forecast as FC
from ..operators import predictions as P
from ..operators import scoring as SC
from ..operators import windows as WD
from .catalog import RND, SQL_BASE, candles
from .catalog_ext import _sql_model_score
from .catalog_stream import _TMP_ROOT
from .catalog_ts import SCALE_SPLIT

# --------------------------------------------------- denormalization

PRED_HORIZONS = 6


def q_denormalize_predictions(spark, sf_dir):
    """Close the predict → write-prices loop: a 2-lag linear head run
    IN SCALED SPACE (the regime every trained model sees) over the
    serving slice, then inverted back to USD via the fitted robust
    stats — predictor.py's scale → model → _denormalize_predictions
    round trip as one plan.

    Scale shape: the per-product stats relation is one grouped agg on
    the history range, broadcast twice (forward scale + inverse); the
    serving slice takes one key-ordered window for the lag. No shuffle
    beyond the stats agg and the per-key window family."""
    c = candles(spark, sf_dir)
    hist = c.filter(F.col("bucket_start") < SCALE_SPLIT)
    stats = hist.groupBy("product_id").agg(
        F.percentile("close", F.lit(0.5)).alias("c_med"),
        F.percentile("close", F.lit(0.25)).alias("c_q1"),
        F.percentile("close", F.lit(0.75)).alias("c_q3"))
    iqr = F.col("c_q3") - F.col("c_q1")
    serve = (c.filter(F.col("bucket_start") >= SCALE_SPLIT)
             .join(F.broadcast(stats), "product_id")
             .withColumn("s", F.when(iqr != 0,
                                     (F.col("close") - F.col("c_med"))
                                     / iqr)
                         .otherwise(F.col("close") - F.col("c_med"))))
    w = Window.partitionBy("product_id").orderBy("bucket_start")
    lagged = (serve.withColumn("s_lag", F.lag("s").over(w))
              .filter(F.col("s_lag").isNotNull()))
    hh = F.col("horizon") / F.lit(7.0)
    preds = (lagged.select(
        "product_id", F.col("bucket_start").alias("origin_time"),
        F.col("close").alias("last_close"), "s", "s_lag",
        F.explode(F.sequence(F.lit(1), F.lit(PRED_HORIZONS)))
        .alias("horizon"))
        .withColumn("target_time",
                    F.expr("timestampadd(MINUTE, 5 * horizon, "
                           "origin_time)"))
        .withColumn("pred_scaled",
                    (F.lit(1.0) - hh) * F.col("s") + hh * F.col("s_lag"))
        .drop("s", "s_lag"))
    out = P.denormalize_predictions(preds, stats,
                                    scaled_col="pred_scaled")
    return out.select(
        "product_id", "origin_time", "horizon", "target_time",
        (F.round("pred_scaled", RND) + F.lit(0.0)).alias("pred_scaled"),
        (F.round("predicted_price", RND) + F.lit(0.0))
        .alias("predicted_price"))


SQL_DENORMALIZE_PREDICTIONS = SQL_BASE + f"""
, stats AS (
  SELECT product_id,
         quantile_cont(close, 0.5) AS c_med,
         quantile_cont(close, 0.25) AS c_q1,
         quantile_cont(close, 0.75) AS c_q3
  FROM candles
  WHERE bucket_start < TIMESTAMP '{SCALE_SPLIT}'
  GROUP BY product_id
), serve AS (
  SELECT c.product_id, bucket_start, close, c_med, c_q1, c_q3,
         CASE WHEN c_q3 - c_q1 != 0
              THEN (close - c_med) / (c_q3 - c_q1)
              ELSE close - c_med END AS s
  FROM candles c JOIN stats USING (product_id)
  WHERE bucket_start >= TIMESTAMP '{SCALE_SPLIT}'
), lagged AS (
  SELECT *, lag(s) OVER (PARTITION BY product_id
                         ORDER BY bucket_start) AS s_lag
  FROM serve
), pred AS (
  SELECT product_id, bucket_start AS origin_time,
         CAST(h AS INT) AS horizon,
         bucket_start + h * INTERVAL 5 MINUTE AS target_time,
         (1.0 - h / 7.0) * s + (h / 7.0) * s_lag AS pred_scaled,
         c_med, c_q1, c_q3
  FROM lagged, (SELECT unnest(generate_series(1, {PRED_HORIZONS})) AS h)
  WHERE s_lag IS NOT NULL
)
SELECT product_id, origin_time, horizon, target_time,
       ROUND(pred_scaled, 6) + 0 AS pred_scaled,
       ROUND(CASE WHEN c_q3 - c_q1 != 0
                  THEN pred_scaled * (c_q3 - c_q1) + c_med
                  ELSE pred_scaled + c_med END, 6) + 0 AS predicted_price
FROM pred
"""


# --------------------------------------------------------- retention

RETENTION_CUTOFF = "2024-01-22"
RET_HORIZONS = 12


def q_prediction_retention(spark, sf_dir):
    """Build the partitioned predictions store (naive 12-step
    forecasts, partitionBy pred_date — the layout the reference's
    predictions table needs for pruned reads), then age out partitions
    older than the cutoff and return the audit relation. The pytest
    additionally pins the physical contract: dropped directories gone,
    kept directories byte-identical (tests/test_operators.py)."""
    preds = (FC.naive_forecast(candles(spark, sf_dir),
                               horizons=RET_HORIZONS)
             .withColumn("pred_date", F.to_date("prediction_time")))
    store = os.path.join(_TMP_ROOT, f"pred_store_{uuid.uuid4().hex}")
    preds.write.partitionBy("pred_date").mode("overwrite").parquet(store)
    try:
        # the audit is materialized from driver-local rows, so the
        # per-run store can be torn down before we return
        return P.retention_cleanup(spark, store, cutoff=RETENTION_CUTOFF)
    finally:
        shutil.rmtree(store, ignore_errors=True)


SQL_PREDICTION_RETENTION = SQL_BASE + f"""
SELECT CAST(bucket_start AS DATE) AS pred_date,
       CASE WHEN CAST(bucket_start AS DATE) < DATE '{RETENTION_CUTOFF}'
            THEN 'dropped' ELSE 'kept' END AS action,
       count(*) * {RET_HORIZONS} AS row_count
FROM candles GROUP BY 1, 2
"""


# ------------------------------------------------------------- stats

def q_prediction_stats(spark, sf_dir):
    """get_prediction_stats read path over the model_score predictions:
    per (product, model) total count, earliest/latest prediction time,
    and the realized-target MAE (fixed-point BIGINT sum — order-free,
    map-side combinable)."""
    out = P.prediction_stats(_scored_preds(spark, sf_dir),
                             candles(spark, sf_dir))
    return out.select(
        "product_id", F.col("model_version").alias("model_name"),
        "total_predictions", "earliest_prediction", "latest_prediction",
        "scored_predictions", "mae")


def _sql_prediction_stats() -> str:
    return SQL_BASE + f"""
, preds AS ({_sql_model_score()}
), j AS (
  SELECT p.product_id, p.model_version AS model_name, p.origin_time,
         p.predicted_price, c.close AS actual
  FROM preds p LEFT JOIN candles c
    ON c.product_id = p.product_id
   AND c.bucket_start = p.origin_time + p.horizon * INTERVAL 5 MINUTE
)
SELECT product_id, model_name,
       count(*) AS total_predictions,
       min(origin_time) AS earliest_prediction,
       max(origin_time) AS latest_prediction,
       count(CASE WHEN actual IS NOT NULL THEN 1 END)
         AS scored_predictions,
       (2 * sum(CASE WHEN actual IS NOT NULL THEN
                CAST(floor(abs(predicted_price - actual) * 1000000.0
                           + 0.5) AS BIGINT) END)
        + count(CASE WHEN actual IS NOT NULL THEN 1 END))
       // (2 * count(CASE WHEN actual IS NOT NULL THEN 1 END))
       / 1000000.0 AS mae
FROM j GROUP BY 1, 2
"""


# ------------------------------------------------------- param sweep

def q_holt_param_sweep(spark, sf_dir):
    """Deterministic (α, β) grid sweep for the Holt forecaster, scored
    by one-step-ahead MAE per product, argmin flagged — the
    optimize_model.py hyperparameter loop as one distributed pass (the
    grid is vectorized inside the per-key recursion, so the sweep
    costs one shuffle regardless of grid size)."""
    return FC.holt_grid_sweep(candles(spark, sf_dir))


def _sql_holt_param_sweep() -> str:
    grid_vals = ", ".join(f"({a!r}, {b!r})"
                          for a, b in FC.HOLT_SWEEP_GRID)
    return SQL_BASE.replace("WITH ", "WITH RECURSIVE ", 1) + f"""
, grid AS (
  SELECT CAST(a AS DOUBLE) AS alpha, CAST(b AS DOUBLE) AS beta
  FROM (VALUES {grid_vals}) t(a, b)
), ordered AS (
  SELECT product_id, bucket_start, close,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY bucket_start) AS rn
  FROM candles
), rec AS (
  SELECT product_id, alpha, beta, rn, close AS y,
         close AS lvl, CAST(0.0 AS DOUBLE) AS tr,
         CAST(NULL AS BIGINT) AS err_fp
  FROM ordered, grid WHERE rn = 1
  UNION ALL
  SELECT s.product_id, s.alpha, s.beta, s.rn, s.y, s.lvl,
         s.beta * (s.lvl - s.prev_lvl) + (1.0 - s.beta) * s.prev_tr
           AS tr,
         s.err_fp
  FROM (
    SELECT r.product_id, r.alpha, r.beta, o.rn, o.close AS y,
           r.alpha * o.close + (1.0 - r.alpha) * (r.lvl + r.tr) AS lvl,
           r.lvl AS prev_lvl, r.tr AS prev_tr,
           CAST(floor(abs(o.close - (r.lvl + r.tr)) * 1000000.0 + 0.5)
                AS BIGINT) AS err_fp
    FROM rec r JOIN ordered o
      ON o.product_id = r.product_id AND o.rn = r.rn + 1
  ) s
), scored AS (
  SELECT product_id, alpha, beta,
         count(err_fp) AS n_eval, sum(err_fp) AS sum_fp
  FROM rec GROUP BY 1, 2, 3
), best AS (
  SELECT product_id,
         min(struct_pack(s := sum_fp, a := alpha, b := beta)) AS m
  FROM scored GROUP BY 1
)
SELECT s.product_id, s.alpha, s.beta,
       CAST(s.n_eval AS BIGINT) AS n_eval,
       (2 * s.sum_fp + s.n_eval) // (2 * s.n_eval)
         / 1000000.0 AS mae,
       (s.sum_fp = b.m.s AND s.alpha = b.m.a AND s.beta = b.m.b)
         AS is_best
FROM scored s JOIN best b USING (product_id)
"""


# ----------------------------------------------------- model metrics

def _scored_preds(spark, sf_dir):
    """model_score predictions with 6dp-rounded prices and realized
    target times — the shared input for every metrics/read-path query
    (one definition so all oracles see identical doubles)."""
    win = WD.sliding_windows(candles(spark, sf_dir))
    return (SC.score_windows(win)
            .withColumn("predicted_price",
                        F.round("predicted_price", RND) + F.lit(0.0))
            .withColumn("target_time",
                        F.expr("timestampadd(MINUTE, 5 * horizon, "
                               "origin_time)")))


def q_model_metrics(spark, sf_dir):
    """The model_metrics table rows (data_writer.py:189
    write_model_metrics, multi-horizon branch): per (product, model,
    horizon) MAE / RMSE / MAPE / directional accuracy / sample count
    over realized targets — every mean a fixed-point BIGINT sum."""
    out = P.model_metrics(_scored_preds(spark, sf_dir),
                          candles(spark, sf_dir))
    return out.select(
        "product_id", F.col("model_version").alias("model_name"),
        "horizon", "mae", "rmse", "mape", "directional_accuracy",
        "sample_count")


def _sql_model_metrics() -> str:
    return SQL_BASE + f"""
, preds AS ({_sql_model_score()}
), j AS (
  SELECT p.product_id, p.model_version AS model_name, p.horizon,
         p.predicted_price, c.close AS actual,
         o.close AS origin_close
  FROM preds p
  JOIN candles c
    ON c.product_id = p.product_id
   AND c.bucket_start = p.origin_time + p.horizon * INTERVAL 5 MINUTE
  JOIN candles o
    ON o.product_id = p.product_id AND o.bucket_start = p.origin_time
), g AS (
  SELECT product_id, model_name, horizon,
         sum(CAST(floor(abs(predicted_price - actual) * 1000000.0
                        + 0.5) AS BIGINT)) AS sa,
         sum(CAST(floor((predicted_price - actual)
                        * (predicted_price - actual) * 10000.0
                        + 0.5) AS BIGINT)) AS ss,
         sum(CASE WHEN actual != 0 THEN
             CAST(floor(abs(predicted_price - actual) / abs(actual)
                        * 1000000.0 + 0.5) AS BIGINT) END) AS sp,
         count(CASE WHEN actual != 0 THEN 1 END) AS np,
         sum(CASE WHEN sign(predicted_price - origin_close)
                     = sign(actual - origin_close)
                  THEN 1 ELSE 0 END) AS nd,
         count(*) AS sample_count
  FROM j GROUP BY 1, 2, 3
)
SELECT product_id, model_name, horizon,
       (2 * sa + sample_count) // (2 * sample_count)
         / 1000000.0 AS mae,
       ROUND(sqrt(ss / (sample_count * 10000.0)), 6) + 0 AS rmse,
       (2 * sp + np) // (2 * np) / 1000000.0 AS mape,
       (2 * nd * 1000000 + sample_count) // (2 * sample_count)
         / 1000000.0 AS directional_accuracy,
       CAST(sample_count AS BIGINT) AS sample_count
FROM g
"""


def q_forecast_losses(spark, sf_dir):
    """The training/eval loss family (utils.py:67 QuantileLoss,
    utils.py:119 DirectionLoss, train.py:48 AdaptiveHuberLoss) over
    the realized model_score predictions — per (product, model,
    horizon) pinball / adaptive-Huber / direction-blend losses, every
    mean a fixed-point BIGINT sum (the model_metrics doctrine)."""
    out = P.forecast_losses(_scored_preds(spark, sf_dir),
                            candles(spark, sf_dir))
    return out.select(
        "product_id", F.col("model_version").alias("model_name"),
        "horizon", "quantile_loss", "huber_loss", "direction_loss",
        "sample_count")


def _sql_forecast_losses() -> str:
    from ..operators.predictions import (_SOFTPLUS_0, _SOFTPLUS_1,
                                         DIRECTION_ALPHA, HUBER_DELTA,
                                         LOSS_QUANTILES)
    pinball = " + ".join(
        f"greatest({q - 1.0!r} * err, {q!r} * err)"
        for q in LOSS_QUANTILES)
    d = float(HUBER_DELTA)
    al = float(DIRECTION_ALPHA)
    return SQL_BASE + f"""
, preds AS ({_sql_model_score()}
), j AS (
  SELECT p.product_id, p.model_version AS model_name, p.horizon,
         p.origin_time, p.predicted_price, c.close AS actual,
         o.close AS origin_close
  FROM preds p
  JOIN candles c
    ON c.product_id = p.product_id
   AND c.bucket_start = p.origin_time + p.horizon * INTERVAL 5 MINUTE
  JOIN candles o
    ON o.product_id = p.product_id AND o.bucket_start = p.origin_time
), seq AS (
  SELECT *,
         COALESCE(lag(predicted_price) OVER w, origin_close)
           AS pred_prev,
         COALESCE(lag(actual) OVER w, origin_close) AS act_prev
  FROM j
  WINDOW w AS (PARTITION BY product_id, model_name, origin_time
               ORDER BY horizon)
), rowl AS (
  SELECT product_id, model_name, horizon,
         0.0 + ({pinball}) AS pinball,
         CASE WHEN abs(err) < {d!r}
              THEN 0.5 * abs(err) * abs(err)
              ELSE {d!r} * (abs(err) - {0.5 * d!r}) END AS huber,
         {1.0 - al!r} * err * err + {al!r} * (
           greatest(pdir, 0.0) - pdir * y
           + CASE WHEN pdir = 0 THEN {_SOFTPLUS_0!r}
                  ELSE {_SOFTPLUS_1!r} END) AS dir_row
  FROM (
    SELECT product_id, model_name, horizon,
           actual - predicted_price AS err,
           sign(predicted_price - pred_prev) AS pdir,
           CASE WHEN actual > act_prev THEN 1.0 ELSE 0.0 END AS y
    FROM seq)
), g AS (
  SELECT product_id, model_name, horizon,
         sum(CAST(floor(pinball * 1000000.0 + 0.5) AS BIGINT)) AS sq,
         sum(CAST(floor(huber * 1000000.0 + 0.5) AS BIGINT)) AS sh,
         sum(CAST(floor(dir_row * 10000.0 + 0.5) AS BIGINT)) AS sd,
         count(*) AS sample_count
  FROM rowl GROUP BY 1, 2, 3
)
SELECT product_id, model_name, horizon,
       (2 * sq + sample_count) // (2 * sample_count)
         / 1000000.0 AS quantile_loss,
       (2 * sh + sample_count) // (2 * sample_count)
         / 1000000.0 AS huber_loss,
       (2 * sd + sample_count) // (2 * sample_count)
         / 10000.0 AS direction_loss,
       CAST(sample_count AS BIGINT) AS sample_count
FROM g
"""


# ----------------------------------------------------- temporal split

TRAIN_RATIO = 0.8


def q_train_test_split(spark, sf_dir):
    """The reference's temporal train/test split
    (Crypto-TS-Model-master/src/data_loader.py:284:
    split_idx = int(len * train_ratio), first chunk trains) per
    product: one key exchange carries both the ordered row_number and
    the whole-partition count — no second shuffle, no driver-side
    len()."""
    from pyspark.sql import Window

    c = candles(spark, sf_dir)
    w = Window.partitionBy("product_id").orderBy("bucket_start")
    wc = Window.partitionBy("product_id")
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wc)
    split = F.when(rn <= F.floor(n * F.lit(TRAIN_RATIO)),
                   F.lit("train")).otherwise(F.lit("test"))
    return c.select("product_id", "bucket_start",
                    (F.round("close", RND) + F.lit(0.0)).alias("close"),
                    split.alias("split"))


SQL_TRAIN_TEST_SPLIT = SQL_BASE + f"""
SELECT product_id, bucket_start, ROUND(close, 6) + 0 AS close,
       CASE WHEN row_number() OVER w
                 <= floor(count(*) OVER (PARTITION BY product_id)
                          * {TRAIN_RATIO})
            THEN 'train' ELSE 'test' END AS split
FROM candles
WINDOW w AS (PARTITION BY product_id ORDER BY bucket_start)
"""


# -------------------------------------------- walk-forward CV folds

WF_FOLDS = [(1, 0.5), (2, 0.6), (3, 0.7), (4, 0.8)]
WF_TEST_FRAC = 0.1


def q_walk_forward_splits(spark, sf_dir):
    """Expanding-window walk-forward cross-validation folds — the
    evaluation harness the reference's hyperparameter loop
    (optimize_model.py) needs on top of the single ratio split: fold i
    trains on the first fₖ of each product's series and tests on the
    next 10%. Emitted as a FOLD MANIFEST (K rows per product:
    train_end / test_end timestamps + sizes) rather than duplicating
    the data K times — at 100 TB downstream folds join the candle
    table on the manifest's time ranges, so the CV harness itself is
    O(K · keys). One key exchange carries rank + count; the per-fold
    boundary timestamps reduce through partial-agg max(CASE...)."""
    from pyspark.sql import Window

    c = candles(spark, sf_dir)
    w = Window.partitionBy("product_id").orderBy("bucket_start")
    wc = Window.partitionBy("product_id")
    e = (c.select("product_id", "bucket_start")
         .withColumn("rn", F.row_number().over(w))
         .withColumn("n", F.count(F.lit(1)).over(wc))
         .select("product_id", "bucket_start", "rn", "n",
                 F.explode(F.array(*[
                     F.struct(F.lit(i).alias("fold"),
                              F.lit(f).alias("frac"))
                     for i, f in WF_FOLDS])).alias("f")))
    train_rank = F.floor(F.col("n") * F.col("f.frac"))
    test_rank = F.least(
        F.floor(F.col("n") * (F.col("f.frac") + F.lit(WF_TEST_FRAC))),
        F.col("n"))
    return (e.groupBy("product_id", F.col("f.fold").alias("fold"))
            .agg(F.max(F.when(F.col("rn") <= train_rank,
                              F.col("bucket_start"))).alias("train_end"),
                 F.max(F.when(F.col("rn") <= test_rank,
                              F.col("bucket_start"))).alias("test_end"),
                 F.max(train_rank).alias("n_train"),
                 (F.max(test_rank) - F.max(train_rank))
                 .alias("n_test")))


def _sql_walk_forward_splits() -> str:
    vals = ", ".join(f"({i}, {f!r})" for i, f in WF_FOLDS)
    return SQL_BASE + f"""
, folds AS (
  SELECT CAST(i AS INT) AS fold, CAST(f AS DOUBLE) AS frac
  FROM (VALUES {vals}) t(i, f)
), ranked AS (
  SELECT product_id, bucket_start,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY bucket_start) AS rn,
         count(*) OVER (PARTITION BY product_id) AS n
  FROM candles
)
SELECT product_id, fold,
       max(CASE WHEN rn <= floor(n * frac)
                THEN bucket_start END) AS train_end,
       max(CASE WHEN rn <= least(floor(n * (frac + {WF_TEST_FRAC!r})),
                                 n)
                THEN bucket_start END) AS test_end,
       CAST(max(floor(n * frac)) AS BIGINT) AS n_train,
       CAST(max(least(floor(n * (frac + {WF_TEST_FRAC!r})), n))
            - max(floor(n * frac)) AS BIGINT) AS n_test
FROM ranked, folds
GROUP BY 1, 2
"""


# -------------------------------------------------- input validation

SEQ_LEN_MIN = 24


def q_validate_input(spark, sf_dir):
    """The predictor's input gate (predictor.py:346
    validate_input_data) as a distributed per-product report — see
    operators/predictions.py:validate_input_report. Round 9 adds the
    numeric-domain audit: n_out_of_domain / in_value_hash_domain flag
    prices outside the engine's documented value-hash envelope
    (|price| >= 1e6, the r08 fuzzer finding), so the contract is
    enforced where data enters, not just documented."""
    return P.validate_input_report(candles(spark, sf_dir),
                                   seq_len_min=SEQ_LEN_MIN)


SQL_VALIDATE_INPUT = SQL_BASE + f"""
SELECT product_id, count(*) AS n_rows,
       CAST(sum(CASE WHEN open IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_open,
       CAST(sum(CASE WHEN high IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_high,
       CAST(sum(CASE WHEN low IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_low,
       CAST(sum(CASE WHEN close IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_close,
       CAST(sum(CASE WHEN volume IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_volume,
       CAST(sum(CASE WHEN abs(open)  >= 1000000 THEN 1 ELSE 0 END)
          + sum(CASE WHEN abs(high)  >= 1000000 THEN 1 ELSE 0 END)
          + sum(CASE WHEN abs(low)   >= 1000000 THEN 1 ELSE 0 END)
          + sum(CASE WHEN abs(close) >= 1000000 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_out_of_domain,
       (sum(CASE WHEN open IS NULL THEN 1 ELSE 0 END) = 0
        AND sum(CASE WHEN high IS NULL THEN 1 ELSE 0 END) = 0
        AND sum(CASE WHEN low IS NULL THEN 1 ELSE 0 END) = 0
        AND sum(CASE WHEN close IS NULL THEN 1 ELSE 0 END) = 0
        AND sum(CASE WHEN volume IS NULL THEN 1 ELSE 0 END) = 0
        AND count(*) >= {SEQ_LEN_MIN}) AS is_valid,
       (sum(CASE WHEN abs(open)  >= 1000000 THEN 1 ELSE 0 END)
        + sum(CASE WHEN abs(high)  >= 1000000 THEN 1 ELSE 0 END)
        + sum(CASE WHEN abs(low)   >= 1000000 THEN 1 ELSE 0 END)
        + sum(CASE WHEN abs(close) >= 1000000 THEN 1 ELSE 0 END)
          = 0) AS in_value_hash_domain
FROM candles GROUP BY product_id
"""


# ------------------------------------------------- recent predictions

def q_recent_predictions(spark, sf_dir):
    """get_recent_predictions (data_writer.py:242): per (product,
    model), the trailing-24h predictions capped at 1000 rows — the
    Cassandra partition-ordered LIMIT as a rank window that compiles
    to WindowGroupLimit (each group stops ranking after the cap)."""
    out = P.recent_predictions(_scored_preds(spark, sf_dir))
    return out.select(
        "product_id", F.col("model_version").alias("model_name"),
        F.col("origin_time").alias("prediction_time"),
        "target_time", "horizon", "predicted_price")


def _sql_recent_predictions(hours_back: int = 24,
                            limit: int = 1000) -> str:
    return f"""
WITH preds AS ({_sql_model_score()}
), wm AS (
  SELECT *, max(origin_time) OVER (PARTITION BY product_id,
                                   model_version) AS mx
  FROM preds
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY product_id, model_version
                               ORDER BY origin_time DESC, horizon)
              AS rn
  FROM wm WHERE origin_time >= mx - INTERVAL {hours_back} HOURS
)
SELECT product_id, model_version AS model_name,
       origin_time AS prediction_time,
       origin_time + horizon * INTERVAL 5 MINUTE AS target_time,
       horizon, predicted_price
FROM ranked WHERE rn <= {limit}
"""


# ------------------------------------------------- CV-scored sweep

def q_holt_cv_sweep(spark, sf_dir):
    """Validation-fold-scored (α, β) sweep (VERDICT r07 #1 missing
    item): the walk_forward_splits fold manifest composed with the
    Holt grid — the recursion fits on each fold's train span and the
    one-step MAE accumulates ONLY over the held-out test span, argmin
    per product on the fold-summed integer error. This is how the
    reference selects hyperparameters (optimize_model.py scores each
    Optuna trial on a validation split; train.py evaluates val loss
    per epoch) — holt_param_sweep's whole-series MAE is the in-sample
    variant it overfits against (pytest pins their divergence on a
    planted regime change)."""
    return FC.holt_cv_sweep(candles(spark, sf_dir))


def _sql_holt_cv_sweep() -> str:
    grid_vals = ", ".join(f"({a!r}, {b!r})"
                          for a, b in FC.HOLT_SWEEP_GRID)
    fold_vals = ", ".join(f"({f!r})" for _, f in FC.HOLT_CV_FOLDS)
    tf = 0.1
    return SQL_BASE.replace("WITH ", "WITH RECURSIVE ", 1) + f"""
, grid AS (
  SELECT CAST(a AS DOUBLE) AS alpha, CAST(b AS DOUBLE) AS beta
  FROM (VALUES {grid_vals}) t(a, b)
), folds AS (
  SELECT CAST(f AS DOUBLE) AS frac FROM (VALUES {fold_vals}) t(f)
), ordered AS (
  SELECT product_id, bucket_start, close,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY bucket_start) AS rn,
         count(*) OVER (PARTITION BY product_id) AS n
  FROM candles
), bounds AS (
  SELECT DISTINCT product_id, frac,
         CAST(floor(n * frac) AS BIGINT) AS n_train,
         CAST(least(floor(n * (frac + {tf!r})), n) AS BIGINT) AS n_end
  FROM ordered, folds
), rec AS (
  SELECT o.product_id, b.frac, g.alpha, g.beta, b.n_train, b.n_end,
         o.rn, o.close AS y, o.close AS lvl, CAST(0.0 AS DOUBLE) AS tr,
         CAST(NULL AS BIGINT) AS err_fp
  FROM ordered o JOIN bounds b ON b.product_id = o.product_id, grid g
  WHERE o.rn = 1 AND b.n_end > greatest(b.n_train, 1)
  UNION ALL
  SELECT s.product_id, s.frac, s.alpha, s.beta, s.n_train, s.n_end,
         s.rn, s.y, s.lvl,
         s.beta * (s.lvl - s.prev_lvl) + (1.0 - s.beta) * s.prev_tr
           AS tr,
         s.err_fp
  FROM (
    SELECT r.product_id, r.frac, r.alpha, r.beta, r.n_train, r.n_end,
           o.rn, o.close AS y,
           r.alpha * o.close + (1.0 - r.alpha) * (r.lvl + r.tr) AS lvl,
           r.lvl AS prev_lvl, r.tr AS prev_tr,
           CASE WHEN o.rn > r.n_train
                THEN CAST(floor(abs(o.close - (r.lvl + r.tr))
                                * 1000000.0 + 0.5) AS BIGINT) END
             AS err_fp
    FROM rec r JOIN ordered o
      ON o.product_id = r.product_id AND o.rn = r.rn + 1
    WHERE r.rn + 1 <= r.n_end
  ) s
), scored AS (
  SELECT product_id, alpha, beta,
         count(err_fp) AS n_eval, sum(err_fp) AS sum_fp
  FROM rec GROUP BY 1, 2, 3
), best AS (
  SELECT product_id,
         min(struct_pack(s := sum_fp, a := alpha, b := beta)) AS m
  FROM scored GROUP BY 1
)
SELECT s.product_id, s.alpha, s.beta,
       CAST(s.n_eval AS BIGINT) AS n_eval,
       (2 * s.sum_fp + s.n_eval) // (2 * s.n_eval)
         / 1000000.0 AS mae,
       (s.sum_fp = b.m.s AND s.alpha = b.m.a AND s.beta = b.m.b)
         AS is_best
FROM scored s JOIN best b USING (product_id)
WHERE s.n_eval > 0
"""


# ----------------------------------------------------- service health

HEALTH_PRED_MAX_MIN = 60
HEALTH_CANDLE_MAX_MIN = 30


def q_service_health(spark, sf_dir):
    """Operational status report (VERDICT r07 #2 missing item;
    reference prediction_service.py:324 _health_check + :353
    get_status): per (product, model), last-prediction age vs candle
    freshness against the data-anchored now (global max candle time),
    scored/pending counts, is_healthy verdict. One partial-agg
    shuffle per store + a broadcast-sized health join."""
    out = P.service_health(
        _scored_preds(spark, sf_dir), candles(spark, sf_dir),
        pred_max_age_minutes=HEALTH_PRED_MAX_MIN,
        candle_max_age_minutes=HEALTH_CANDLE_MAX_MIN)
    return out


def _sql_service_health() -> str:
    return SQL_BASE + f"""
, preds AS ({_sql_model_score()}
), nowt AS (
  SELECT max(bucket_start) AS _now FROM candles
), pg AS (
  SELECT product_id, model_version AS model_name,
         max(origin_time) AS last_prediction,
         count(*) AS total_predictions,
         CAST(sum(CASE WHEN origin_time + horizon * INTERVAL 5 MINUTE
                            <= _now THEN 1 ELSE 0 END) AS BIGINT)
           AS scored_predictions,
         CAST(sum(CASE WHEN origin_time + horizon * INTERVAL 5 MINUTE
                            > _now THEN 1 ELSE 0 END) AS BIGINT)
           AS pending_predictions
  FROM preds, nowt GROUP BY 1, 2
), cg AS (
  SELECT product_id, max(bucket_start) AS last_candle
  FROM candles GROUP BY 1
)
SELECT cg.product_id, model_name, last_candle, last_prediction,
       datediff('minute', date_trunc('minute', last_candle),
                date_trunc('minute', _now)) AS candle_age_minutes,
       datediff('minute', date_trunc('minute', last_prediction),
                date_trunc('minute', _now))
         AS prediction_age_minutes,
       COALESCE(total_predictions, 0) AS total_predictions,
       COALESCE(scored_predictions, 0) AS scored_predictions,
       COALESCE(pending_predictions, 0) AS pending_predictions,
       COALESCE(datediff('minute', date_trunc('minute', last_prediction),
                         date_trunc('minute', _now))
                  <= {HEALTH_PRED_MAX_MIN}, FALSE)
         AND datediff('minute', date_trunc('minute', last_candle),
                      date_trunc('minute', _now))
               <= {HEALTH_CANDLE_MAX_MIN} AS is_healthy
FROM cg LEFT JOIN pg USING (product_id), nowt
"""


# ------------------------------------------------- single-step read

def q_predict_single_step(spark, sf_dir):
    """predictor.py:280 ``predict_single_step``: the horizon-1 read
    path — one (prediction_time, target_time, predicted_price) row
    per origin whose window is complete, numerically identical to
    model_score's horizon-1 rows (the reference delegates to the full
    predict() and takes step 0) while the plan computes ONE horizon
    instead of six-then-filter (single-row weight head, same strict
    left fold)."""
    win = WD.sliding_windows(candles(spark, sf_dir))
    out = SC.score_windows(win, pred_len=1,
                           model=SC.single_step_model())
    return out.select(
        "product_id",
        F.col("origin_time").alias("prediction_time"),
        F.expr("timestampadd(MINUTE, 5, origin_time)")
        .alias("target_time"),
        (F.round("predicted_price", RND) + F.lit(0.0))
        .alias("predicted_price"),
        "model_version")


def _sql_predict_single_step(seq_len: int = 24, pred_len: int = 6,
                             decay: float = 0.9,
                             model_version: str = "stub-linear-1"
                             ) -> str:
    """SQL twin of the single-step head: the h=1 left-associative
    chain of _sql_model_score, verbatim weights."""
    from ..operators.scoring import PRICE_SCALE, stub_weights
    from .catalog_ext import SQL_SLIDING_WINDOWS

    w = stub_weights(seq_len, pred_len, decay)
    chain = " + ".join(f"{float(w[0, i])!r} * x[{i + 1}]"
                       for i in range(seq_len))
    return f"""
WITH xs AS (
  SELECT product_id, bucket_start AS origin_time,
         list_transform(string_split(x_sig, ','),
                        s -> CAST(s AS DOUBLE) / {PRICE_SCALE!r}) AS x
  FROM ({SQL_SLIDING_WINDOWS}) sw
)
SELECT product_id, origin_time AS prediction_time,
       origin_time + INTERVAL 5 MINUTE AS target_time,
       ROUND({chain}, 6) + 0 AS predicted_price,
       '{model_version}' AS model_version
FROM xs
"""


# ---------------------------------------------------------- registry

# ------------------------------------------- curriculum feature dropout

CURRICULUM_EPOCH = 3
CURRICULUM_FEATURES = ("open", "high", "low", "close", "volume")


def q_curriculum_dropout(spark, sf_dir):
    """Deterministic train-time feature dropout over the candle
    feature matrix (data_loader.py:215-231 step 6 + set_epoch; see
    operators/windows.py:curriculum_feature_dropout for the
    hash-gate reformulation): with p=0.5 per row (hash-gated), zero
    each feature independently with p=0.1, masks re-rolled per epoch.
    Pure column expressions — no shuffle beyond the candle build."""
    c = candles(spark, sf_dir).select(
        "product_id", "bucket_start", *CURRICULUM_FEATURES)
    return WD.curriculum_feature_dropout(c, epoch=CURRICULUM_EPOCH)


def _sql_curriculum_dropout() -> str:
    from ..functions.text import sql_hash60

    kstr = ("product_id || ':' || CAST(epoch_us(bucket_start) "
            f"AS VARCHAR) || ':e{CURRICULUM_EPOCH}'")
    applied = f"({sql_hash60(kstr, 'curr-row')} % 100) < 50"
    masked, nd = [], []
    for f in CURRICULUM_FEATURES:
        drop = (f"({applied} AND "
                f"({sql_hash60(kstr, f'curr-f-{f}')} % 100) < 10)")
        masked.append(f"CASE WHEN {drop} THEN 0.0 "
                      f"ELSE round({f}, 6) + 0 END AS {f}")
        nd.append(f"CASE WHEN {drop} THEN 1 ELSE 0 END")
    cols = ",\n       ".join(masked)
    return SQL_BASE + f"""
SELECT product_id, bucket_start,
       {cols},
       {applied} AS dropout_applied,
       CAST({" + ".join(nd)} AS INTEGER) AS n_dropped
FROM candles
"""


# ------------------------------------------- curriculum augmentation

def q_curriculum_augment(spark, sf_dir):
    """Curriculum steps 1-5 of the reference's data loader
    (data_loader.py:176-214) as ONE deterministic relation over the
    candle feature matrix: epoch-ramped constants, hash-gated local-
    mean masking, Box-Muller gaussian noise scaled by the trailing
    window std (clipped to ±3σ), smart scaling of non-close features,
    and the time-warp SELECTION (out_pos → src_lo/src_hi/src_frac
    under align_corners=False linear interpolation). See
    operators/windows.py:curriculum_augment for the full per-step
    reformulation contract. Pure column expressions over one per-key
    window partitioning — a single exchange beyond the candle build;
    set_epoch's re-roll is the `epoch` constant (pytest pins
    determinism and the epoch re-roll)."""
    c = candles(spark, sf_dir).select(
        "product_id", "bucket_start", *CURRICULUM_FEATURES)
    # test-SF entry point: pin the draw stage's parallelism (AQE
    # coalesces the tiny per-key window shuffle to one task, which
    # would serialize the md5 draw work — see the operator docstring)
    return WD.curriculum_augment(
        c, epoch=CURRICULUM_EPOCH,
        draw_partitions=spark.sparkContext.defaultParallelism)


def _sql_curriculum_augment() -> str:
    from ..functions.text import sql_hash60
    from ..operators.windows import (AUG_STD_FLOOR, FULL60, TWO_PI,
                                     curriculum_progress)

    ep = CURRICULUM_EPOCH
    progress = curriculum_progress(ep)
    nl = 0.02 * progress
    mask_bp = int(round(0.15 * progress * 10000))
    kstr = ("product_id || ':' || CAST(epoch_us(bucket_start) "
            f"AS VARCHAR) || ':e{ep}'")
    kkey = f"product_id || ':e{ep}'"

    def u01(seed: str, key: str = kstr, shift: int = 0) -> str:
        return (f"(CAST(({sql_hash60(key, seed)}) + {shift} AS DOUBLE)"
                f" / {FULL60!r})")

    mask_gate = (f"(({sql_hash60(kstr, 'aug-mask-gate')} % 100) < 50 "
                 f"AND ({sql_hash60(kstr, 'aug-mask-row')} % 10000) "
                 f"< {mask_bp})")
    scale_gate = f"(({sql_hash60(kstr, 'aug-scale-gate')} % 100) < 50)"
    warp_gate = f"(({sql_hash60(kkey, 'aug-warp-gate')} % 100) < 30)"
    warp = f"(0.8 + 0.4 * {u01('aug-warp-f', kkey)})"

    fs = CURRICULUM_FEATURES
    snap = ",\n         ".join(
        f"round({f}, 6) + 0 AS r_{f}" for f in fs)
    masked = ",\n         ".join(
        f"CASE WHEN mask_applied THEN round(avg(r_{f}) OVER wloc, 6) + 0 "
        f"ELSE r_{f} END AS m_{f}" for f in fs)
    stats = ",\n         ".join(
        f"avg(m_{f}) OVER wstat AS mu_{f},\n         "
        f"greatest(stddev_pop(m_{f}) OVER wstat, {AUG_STD_FLOOR!r}) "
        f"AS sd_{f}" for f in fs)
    noise1 = ",\n         ".join(
        f"round(m_{f} + {nl!r} * sd_{f} * "
        f"(sqrt(-2.0 * ln({u01(f'aug-n1-{f}', shift=1)})) "
        f"* cos({TWO_PI!r} * {u01(f'aug-n2-{f}')})), 6) + 0 AS x1_{f},"
        f"\n         round(mu_{f} - 3.0 * sd_{f}, 6) + 0 AS lo_{f},"
        f"\n         round(mu_{f} + 3.0 * sd_{f}, 6) + 0 AS hi_{f}"
        for f in fs)
    clipped = ",\n         ".join(
        f"CASE WHEN x1_{f} > hi_{f} THEN hi_{f} "
        f"WHEN x1_{f} < lo_{f} THEN lo_{f} ELSE x1_{f} END AS n_{f}"
        for f in fs)
    scaled = ",\n       ".join(
        f"n_{f} AS {f}" if f == "close" else
        f"CASE WHEN scale_applied THEN round(n_{f} * "
        f"(0.9 + 0.2 * {u01(f'aug-scale-{f}')}), 6) + 0 "
        f"ELSE n_{f} END AS {f}" for f in fs)
    return SQL_BASE + f"""
, snapped AS (
  SELECT product_id, bucket_start,
         {snap}
  FROM candles
), masked AS (
  SELECT product_id, bucket_start,
         {mask_gate} AS mask_applied,
         {masked}
  FROM snapped
  WINDOW wloc AS (PARTITION BY product_id ORDER BY bucket_start
                  ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING)
), stats AS (
  SELECT *,
         {stats},
         CAST(count(*) OVER (PARTITION BY product_id) AS BIGINT) AS t_n,
         CAST(row_number() OVER (PARTITION BY product_id
                                 ORDER BY bucket_start) - 1
              AS BIGINT) AS pos
  FROM masked
  WINDOW wstat AS (PARTITION BY product_id ORDER BY bucket_start
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
), noise1 AS (
  SELECT *,
         {noise1}
  FROM stats
), noised AS (
  SELECT *,
         {clipped},
         {scale_gate} AS scale_applied,
         {warp_gate} AS warp_applied,
         {warp} AS warp_raw
  FROM noise1
), warped AS (
  SELECT *,
         CASE WHEN warp_applied THEN
           (least(pos, greatest(1, CAST(floor(t_n * warp_raw)
                                        AS BIGINT)) - 1) + 0.5)
             / warp_raw - 0.5
         ELSE CAST(pos AS DOUBLE) END AS s_raw
  FROM noised
), sel AS (
  SELECT *,
         greatest(0.0, least(s_raw, CAST(t_n - 1 AS DOUBLE))) AS s_c
  FROM warped
)
SELECT product_id, bucket_start,
       {scaled},
       mask_applied, scale_applied, warp_applied,
       round(CASE WHEN warp_applied THEN warp_raw ELSE 1.0 END, 6) + 0
         AS warp_factor,
       CAST(pos AS INT) AS out_pos,
       CAST(floor(s_c) AS INT) AS src_lo,
       least(CAST(floor(s_c) AS INT) + 1, CAST(t_n - 1 AS INT))
         AS src_hi,
       round(s_c - floor(s_c), 6) + 0 AS src_frac
FROM sel
"""


# --------------------------------------------------- cadence audit

CADENCE_INTERVAL_MIN = 5


def q_prediction_cadence(spark, sf_dir):
    """Cadence audit of the prediction loop (prediction_service.py:244
    prediction_worker's every-`prediction_interval` cycle + :373
    force_prediction's out-of-cycle runs): per (product, model), the
    inter-prediction-gap distribution vs the 5-minute loop contract —
    on-schedule / forced (< interval) / delayed (> interval) interval
    counts, min/max gap, cadence_ok. service_health says whether the
    LATEST prediction is fresh; this says whether the loop ever
    skipped a beat over the whole store.

    Input is the prediction ORIGIN set — one row per (product, origin)
    by construction (window_origins emits each complete window once),
    identical to model_score's distinct origins but paying neither the
    scoring pass nor the window ARRAY build cadence never reads
    (sliding_windows' collect_list payloads survive column pruning
    because the completeness filter references them — window_origins
    counts instead; pytest pins origin-set equality). unique=True
    skips the distinct, so cadence adds ONE shuffle (its lag window,
    reused by the groupBy) over the origin relation's key exchange."""
    origins = (WD.window_origins(candles(spark, sf_dir))
               .select("product_id",
                       F.lit(SC.MODEL_VERSION).alias("model_version"),
                       F.col("bucket_start").alias("origin_time")))
    return P.prediction_cadence(
        origins, interval_minutes=CADENCE_INTERVAL_MIN, unique=True)


def _sql_prediction_cadence() -> str:
    from ..operators.scoring import MODEL_VERSION
    from .catalog_ext import SQL_SLIDING_WINDOWS

    iv = CADENCE_INTERVAL_MIN
    return f"""
WITH origins AS (
  SELECT product_id, '{MODEL_VERSION}' AS model_name,
         bucket_start AS origin_time
  FROM ({SQL_SLIDING_WINDOWS}) sw
), g AS (
  SELECT product_id, model_name,
         datediff('minute',
                  date_trunc('minute',
                             lag(origin_time) OVER (
                               PARTITION BY product_id, model_name
                               ORDER BY origin_time)),
                  date_trunc('minute', origin_time)) AS gap
  FROM origins
)
SELECT product_id, model_name,
       count(*) AS n_predictions,
       count(gap) AS n_intervals,
       CAST(COALESCE(sum(CASE WHEN gap = {iv} THEN 1 END), 0)
            AS BIGINT) AS on_schedule_intervals,
       CAST(COALESCE(sum(CASE WHEN gap < {iv} THEN 1 END), 0)
            AS BIGINT) AS forced_predictions,
       CAST(COALESCE(sum(CASE WHEN gap > {iv} THEN 1 END), 0)
            AS BIGINT) AS delayed_intervals,
       min(gap) AS min_gap_minutes,
       max(gap) AS max_gap_minutes,
       COALESCE(max(gap) <= {iv}, TRUE) AS cadence_ok
FROM g GROUP BY 1, 2
"""


SPARK_QUERIES_PRED = {
    "denormalize_predictions": q_denormalize_predictions,
    "prediction_retention": q_prediction_retention,
    "prediction_stats": q_prediction_stats,
    "holt_param_sweep": q_holt_param_sweep,
    "model_metrics": q_model_metrics,
    "forecast_losses": q_forecast_losses,
    "recent_predictions": q_recent_predictions,
    "train_test_split": q_train_test_split,
    "validate_input": q_validate_input,
    "walk_forward_splits": q_walk_forward_splits,
    "holt_cv_sweep": q_holt_cv_sweep,
    "service_health": q_service_health,
    "predict_single_step": q_predict_single_step,
    "prediction_cadence": q_prediction_cadence,
    "curriculum_dropout": q_curriculum_dropout,
    "curriculum_augment": q_curriculum_augment,
}

ORACLE_SQL_PRED = {
    "denormalize_predictions": SQL_DENORMALIZE_PREDICTIONS,
    "prediction_retention": SQL_PREDICTION_RETENTION,
    "prediction_stats": _sql_prediction_stats(),
    "holt_param_sweep": _sql_holt_param_sweep(),
    "model_metrics": _sql_model_metrics(),
    "forecast_losses": _sql_forecast_losses(),
    "recent_predictions": _sql_recent_predictions(),
    "train_test_split": SQL_TRAIN_TEST_SPLIT,
    "validate_input": SQL_VALIDATE_INPUT,
    "walk_forward_splits": _sql_walk_forward_splits(),
    "holt_cv_sweep": _sql_holt_cv_sweep(),
    "service_health": _sql_service_health(),
    "predict_single_step": _sql_predict_single_step(),
    "prediction_cadence": _sql_prediction_cadence(),
    "curriculum_dropout": _sql_curriculum_dropout(),
    "curriculum_augment": _sql_curriculum_augment(),
}
