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

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


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
            # integer half-up rounding — an exact sum/count ratio can
            # land on a 6dp midpoint where double rounds diverge
            # across engines (see model_metrics)
            .withColumn(
                "mae",
                F.expr("(2 * _sum_fp + _n_scored) div (2 * _n_scored)")
                / F.lit(1000000.0))
            .withColumn("scored_predictions", F.col("_n_scored"))
            .drop("_sum_fp", "_n_scored"))


def model_metrics(preds: DataFrame, actuals: DataFrame, *,
                  key: str = "product_id",
                  model_col: str = "model_version",
                  pred_time_col: str = "origin_time",
                  target_time_col: str = "target_time",
                  horizon_col: str = "horizon",
                  pred_col: str = "predicted_price",
                  actual_ts: str = "bucket_start",
                  actual_col: str = "close") -> DataFrame:
    """The model_metrics TABLE rows (data_writer.py:189
    ``write_model_metrics``): per (product, model, horizon) — MAE,
    RMSE, MAPE, directional accuracy, sample count — computed from
    realized targets, one row per horizon exactly as the reference's
    multi-horizon branch inserts them.

    Every mean reduces through fixed-point BIGINT sums so the
    aggregates are order-free (map-side combinable at any
    partitioning) and bit-identical to the SQL oracle:
    |err| and |err|/|actual| at 1e6 granularity, err² at 1e4 (the
    coarser scale keeps the squared sum far from BIGINT overflow —
    |err| ≤ 1e4 over 2e5 rows stays < 2.4e17); RMSE/MAE/MAPE are
    6dp-rounds of exact-integer ratios (and a sqrt of one).
    Direction is sign(predicted − close@origin) vs
    sign(actual − close@origin) — the reference's "did the model call
    the move from the forecast origin correctly".
    """
    a = actuals.select(F.col(key).alias("_ak"),
                       F.col(actual_ts).alias("_att"),
                       F.col(actual_col).alias("_actual"))
    o = actuals.select(F.col(key).alias("_ok"),
                       F.col(actual_ts).alias("_ott"),
                       F.col(actual_col).alias("_origin_close"))
    j = (preds
         .join(a, (F.col(key) == F.col("_ak"))
               & (F.col(target_time_col) == F.col("_att")))
         .drop("_ak", "_att"))
    j = (j.join(o, (F.col(key) == F.col("_ok"))
                & (F.col(pred_time_col) == F.col("_ott")))
         .drop("_ok", "_ott"))
    err = F.col(pred_col) - F.col("_actual")
    fp6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
    abs_fp = fp6(F.abs(err)).cast("long")
    sq_fp = F.floor(err * err * F.lit(10000.0)
                    + F.lit(0.5)).cast("long")
    ape_fp = F.when(F.col("_actual") != 0,
                    fp6(F.abs(err) / F.abs(F.col("_actual")))
                    .cast("long"))
    dir_ok = (F.signum(F.col(pred_col) - F.col("_origin_close"))
              == F.signum(F.col("_actual") - F.col("_origin_close"))
              ).cast("long")
    g = j.groupBy(key, model_col, horizon_col).agg(
        F.sum(abs_fp).alias("_sa"),
        F.sum(sq_fp).alias("_ss"),
        F.sum(ape_fp).alias("_sp"),
        F.count(ape_fp).alias("_np"),
        F.sum(dir_ok).alias("_nd"),
        F.count(F.lit(1)).alias("sample_count"))
    # exact ratios of integers CAN land on exact 6dp midpoints, where
    # Spark's shortest-repr HALF_UP round and DuckDB's round(x*1e6)/1e6
    # disagree — so round them in INTEGER arithmetic (half-up via
    # (2a + b) div (2b), positive operands) and only then divide by
    # 1e6; the sqrt-based RMSE keeps a double round (irrational
    # outputs don't hit terminating-decimal midpoints)
    return g.select(
        key, model_col, horizon_col,
        (F.expr("(2 * _sa + sample_count) div (2 * sample_count)")
         / F.lit(1000000.0)).alias("mae"),
        (F.round(F.sqrt(F.col("_ss")
                        / (F.col("sample_count") * F.lit(10000.0))), 6)
         + F.lit(0.0)).alias("rmse"),
        (F.expr("(2 * _sp + _np) div (2 * _np)")
         / F.lit(1000000.0)).alias("mape"),
        (F.expr("(2 * _nd * 1000000 + sample_count) "
                "div (2 * sample_count)")
         / F.lit(1000000.0)).alias("directional_accuracy"),
        "sample_count")


# softplus(-|x|) for the only two |sign-logit| values that occur:
# ln 2 (= softplus(0)) and ln(1 + e^-1) (= softplus(-1)), as literal
# doubles so neither engine ever calls libm (Java Math.exp/log and C
# libm may differ in the last ulp; literals cannot).
_SOFTPLUS_0 = 0.6931471805599453
_SOFTPLUS_1 = 0.31326168751822286

#: Loss constants below are the reference modules' SIGNATURE DEFAULTS
#: — the only concrete instantiations in its source — not a claim
#: about a tuned live run: the reference's active wiring is
#: AdaptiveHuberLoss(initial_delta=config.huber_delta) with config
#: default 0.5, immediately auto-adjusted to the 0.8 error quantile;
#: QuantileLoss([0.1, 0.5, 0.9]) appears only in a commented-out
#: block (train.py:484); DirectionLoss is wired at weight 0.0.
#: Callers needing a tuned delta pass ``huber_delta`` explicitly.
#: pinball-loss quantiles — utils.py QuantileLoss's default heads.
LOSS_QUANTILES = (0.1, 0.5, 0.9)
#: AdaptiveHuberLoss class default delta — train.py:48.
HUBER_DELTA = 1.0
#: DirectionLoss class default alpha — utils.py:119.
DIRECTION_ALPHA = 0.3


def forecast_losses(preds: DataFrame, actuals: DataFrame, *,
                    key: str = "product_id",
                    model_col: str = "model_version",
                    pred_time_col: str = "origin_time",
                    target_time_col: str = "target_time",
                    horizon_col: str = "horizon",
                    pred_col: str = "predicted_price",
                    actual_ts: str = "bucket_start",
                    actual_col: str = "close",
                    huber_delta: float = HUBER_DELTA) -> DataFrame:
    """The reference's evaluation-loss family over realized forecasts,
    per (product, model, horizon):

    - ``quantile_loss`` — utils.py:67 ``QuantileLoss``: mean over
      samples of sum_q max((q-1)*err, q*err), err = actual - pred,
      q in :data:`LOSS_QUANTILES` (the pinball loss summed over the
      quantile heads as the module's forward does — note the heads
      are the class defaults; see the constants block);
    - ``huber_loss`` — train.py:48 ``AdaptiveHuberLoss`` at its CLASS
      DEFAULT delta (``huber_delta`` parameter, default 1.0 — the
      live wiring auto-tunes delta per epoch, which a fixed-point
      oracle can't chase): mean of 0.5*r^2 if r < delta else
      delta*(r - 0.5*delta), r = |err|;
    - ``direction_loss`` — adapted from utils.py:119
      ``DirectionLoss`` (alpha 0.3): (1-alpha)*MSE +
      alpha*BCEWithLogits(sign(pred_t - pred_{t-1}),
      1[actual_t > actual_{t-1}]), t stepping along the horizon
      sequence. TWO DELIBERATE DEPARTURES from DirectionLoss.forward,
      not a reproduction of it: (1) the torch module diffs within the
      prediction sequence only (pred_len-1 BCE terms); here the first
      step diffs against the close at the forecast origin, adding an
      h=1 direction term the serving store can actually grade.
      (2) torch averages MSE and BCE separately over different
      counts; here both terms share n, so the blend distributes over
      one mean and fuses per row (map-side combinable).
      BCEWithLogits(x, y) = max(x,0) - x*y + softplus(-|x|), and
      since x = sign(...) takes only {-1, 0, 1} the softplus term
      is one of two literal constants — no libm in either engine.

    Every mean reduces through per-row fixed-point BIGINT sums
    (order-free, map-side combinable at any partitioning, bit-identical
    to the SQL oracle): pinball and huber at 1e6 (magnitudes ~|err|),
    the direction blend at 1e4 (the err^2 term dominates; the coarser
    scale keeps the sum far from BIGINT overflow — err^2 <= 1e8 over
    2e5 rows stays < 2e17). Outputs are 6dp (4dp for the 1e4-scaled
    blend) rounds of exact-integer ratios.

    Scale shape: two key+time equi-joins against the actuals relation
    (shuffle on (key, time) — at 100 TB both sides partition-prune on
    the serving date range), one per-(key, model, origin) window for
    the horizon-sequence lag (tiny partitions, pred_len rows each),
    then one grouped agg with map-side combine. No Python in the row
    path.
    """
    a = actuals.select(F.col(key).alias("_ak"),
                       F.col(actual_ts).alias("_att"),
                       F.col(actual_col).alias("_actual"))
    o = actuals.select(F.col(key).alias("_ok"),
                       F.col(actual_ts).alias("_ott"),
                       F.col(actual_col).alias("_origin_close"))
    j = (preds
         .join(a, (F.col(key) == F.col("_ak"))
               & (F.col(target_time_col) == F.col("_att")))
         .drop("_ak", "_att"))
    j = (j.join(o, (F.col(key) == F.col("_ok"))
                & (F.col(pred_time_col) == F.col("_ott")))
         .drop("_ok", "_ott"))
    w = (Window.partitionBy(key, model_col, pred_time_col)
         .orderBy(horizon_col))
    j = j.withColumn("_pred_prev",
                     F.coalesce(F.lag(pred_col).over(w),
                                F.col("_origin_close")))
    j = j.withColumn("_act_prev",
                     F.coalesce(F.lag("_actual").over(w),
                                F.col("_origin_close")))
    err = F.col("_actual") - F.col(pred_col)
    pinball = sum(
        (F.greatest(F.lit(q - 1.0) * err, F.lit(q) * err)
         for q in LOSS_QUANTILES), start=F.lit(0.0))
    r = F.abs(err)
    d = float(huber_delta)
    huber = F.when(r < F.lit(d), F.lit(0.5) * r * r).otherwise(
        F.lit(d) * (r - F.lit(0.5 * d)))
    x = F.signum(F.col(pred_col) - F.col("_pred_prev"))
    y = F.when(F.col("_actual") > F.col("_act_prev"),
               F.lit(1.0)).otherwise(F.lit(0.0))
    bce = (F.greatest(x, F.lit(0.0)) - x * y
           + F.when(x == 0, F.lit(_SOFTPLUS_0))
           .otherwise(F.lit(_SOFTPLUS_1)))
    alpha = float(DIRECTION_ALPHA)
    dir_row = F.lit(1.0 - alpha) * err * err + F.lit(alpha) * bce
    fp6 = lambda c: F.floor(c * F.lit(1000000.0) + F.lit(0.5))  # noqa: E731
    fp4 = lambda c: F.floor(c * F.lit(10000.0) + F.lit(0.5))  # noqa: E731
    g = j.groupBy(key, model_col, horizon_col).agg(
        F.sum(fp6(pinball).cast("long")).alias("_sq"),
        F.sum(fp6(huber).cast("long")).alias("_sh"),
        F.sum(fp4(dir_row).cast("long")).alias("_sd"),
        F.count(F.lit(1)).alias("sample_count"))
    # integer half-up ratios, same doctrine as model_metrics above
    return g.select(
        key, model_col, horizon_col,
        (F.expr("(2 * _sq + sample_count) div (2 * sample_count)")
         / F.lit(1000000.0)).alias("quantile_loss"),
        (F.expr("(2 * _sh + sample_count) div (2 * sample_count)")
         / F.lit(1000000.0)).alias("huber_loss"),
        (F.expr("(2 * _sd + sample_count) div (2 * sample_count)")
         / F.lit(10000.0)).alias("direction_loss"),
        "sample_count")


def recent_predictions(preds: DataFrame, *,
                       key: str = "product_id",
                       model_col: str = "model_version",
                       pred_time_col: str = "origin_time",
                       horizon_col: str = "horizon",
                       hours_back: int = 24,
                       limit: int = 1000,
                       cutoff: str | None = None) -> DataFrame:
    """The get_recent_predictions read path (data_writer.py:242):
    per (product, model), predictions from the trailing `hours_back`
    window, capped at `limit` rows, newest first — Cassandra's
    partition-ordered LIMIT re-expressed as a rank window.

    `cutoff` is the production path: an explicit timestamp literal
    ('YYYY-MM-DD HH:MM:SS') filters BEFORE any window runs, so on a
    date-partitioned store the predicate prunes partitions and
    reaches the parquet scan (plan-asserted in
    tests/test_plans.py::test_recent_predictions_cutoff_pushdown).
    The default (cutoff=None) anchors on each group's OWN latest
    prediction_time — deterministic from the data, no wall clock,
    which is what the SQL oracle needs — but that windowed max must
    scan each group's FULL history before the rank can stop, so at
    production scale pass the cutoff. The rank filter compiles to
    WindowGroupLimit either way, so each group stops ranking after
    `limit` rows."""
    from pyspark.sql import Window

    w = Window.partitionBy(key, model_col)
    wo = w.orderBy(F.col(pred_time_col).desc(), F.col(horizon_col))
    if cutoff is not None:
        flt = preds.filter(
            F.col(pred_time_col)
            >= F.lit(cutoff).cast("timestamp")
            - F.expr(f"INTERVAL {hours_back} HOURS"))
        return (flt.withColumn("_rn", F.row_number().over(wo))
                .filter(F.col("_rn") <= limit).drop("_rn"))
    cut = F.max(pred_time_col).over(w) \
        - F.expr(f"INTERVAL {hours_back} HOURS")
    return (preds
            .withColumn("_cut", cut)
            .filter(F.col(pred_time_col) >= F.col("_cut"))
            .withColumn("_rn", F.row_number().over(wo))
            .filter(F.col("_rn") <= limit)
            .drop("_cut", "_rn"))


def service_health(preds: DataFrame, candles: DataFrame, *,
                   key: str = "product_id",
                   model_col: str = "model_version",
                   pred_time_col: str = "origin_time",
                   target_time_col: str = "target_time",
                   actual_ts: str = "bucket_start",
                   pred_max_age_minutes: int = 60,
                   candle_max_age_minutes: int = 30) -> DataFrame:
    """The prediction service's operational status report — reference
    prediction_service.py:324 ``_health_check`` + :353 ``get_status``
    (per-product last_prediction_times, data-availability check) as
    one relation over the stores the service writes: per (product,
    model), the last prediction's age and the last candle's age
    against the data-anchored "now" (global max candle time — the
    oracle-deterministic stand-in for the wall clock), scored vs
    pending prediction counts, and the is_healthy verdict (both ages
    within their thresholds).

    Products present in the candle store but never predicted for
    still report (NULL model/ages → is_healthy false) — the
    reference's missing-products warning as a row, not a log line.

    Plan: one partial-agg shuffle per input (both collapse to one
    row per (product[, model]) before any join), the global "now" is
    a broadcast one-row aggregate, and the health join is
    broadcast-sized by construction — O(products × models) rows
    total, regardless of store size."""
    now = candles.agg(F.max(actual_ts).alias("_now"))
    pg = (preds.crossJoin(F.broadcast(now))
          .groupBy(key, model_col)
          .agg(F.max(pred_time_col).alias("last_prediction"),
               F.count(F.lit(1)).alias("total_predictions"),
               F.sum((F.col(target_time_col) <= F.col("_now"))
                     .cast("long")).alias("scored_predictions"),
               F.sum((F.col(target_time_col) > F.col("_now"))
                     .cast("long")).alias("pending_predictions")))
    cg = candles.groupBy(key).agg(
        F.max(actual_ts).alias("last_candle"))
    j = (cg.join(pg, key, "left")
         .crossJoin(F.broadcast(now)))
    # Ages count MINUTE-BOUNDARY crossings, not floor(elapsed/60s):
    # both ends are date_trunc'd to the minute first, so Spark's
    # timestampdiff (floor of elapsed seconds) and DuckDB's datediff
    # (boundary crossings) agree even for sub-minute-aligned inputs
    # (ADVICE r08 — in-domain 5-min candles never exposed the gap).
    pred_age = F.expr("timestampdiff(MINUTE,"
                      " date_trunc('minute', last_prediction),"
                      " date_trunc('minute', _now))")
    candle_age = F.expr("timestampdiff(MINUTE,"
                        " date_trunc('minute', last_candle),"
                        " date_trunc('minute', _now))")
    healthy = (F.coalesce(pred_age <= pred_max_age_minutes,
                          F.lit(False))
               & (candle_age <= candle_max_age_minutes))
    return j.select(
        key, F.col(model_col).alias("model_name"),
        "last_candle", "last_prediction",
        candle_age.alias("candle_age_minutes"),
        pred_age.alias("prediction_age_minutes"),
        F.coalesce("total_predictions", F.lit(0))
        .alias("total_predictions"),
        F.coalesce("scored_predictions", F.lit(0))
        .alias("scored_predictions"),
        F.coalesce("pending_predictions", F.lit(0))
        .alias("pending_predictions"),
        healthy.alias("is_healthy"))


def prediction_cadence(preds: DataFrame, *,
                       key: str = "product_id",
                       model_col: str = "model_version",
                       pred_time_col: str = "origin_time",
                       interval_minutes: int = 5,
                       unique: bool = False) -> DataFrame:
    """Cadence audit of the prediction loop — reference
    prediction_service.py:244 ``prediction_worker`` (one prediction
    per product every ``prediction_interval`` seconds, exponential
    backoff on failure) and :373 ``force_prediction`` (out-of-cycle
    immediate runs). service_health answers "is the latest prediction
    fresh?"; this answers the operational question it cannot: did the
    loop ACTUALLY fire every interval, and how often was it forced or
    late?

    Per (product, model): distinct prediction origins, the
    inter-prediction-gap distribution split against the loop contract
    (== interval → on-schedule, < interval → forced/out-of-cycle,
    > interval → delayed: a backoff retry, an outage, or missing
    input data), min/max observed gap, and ``cadence_ok`` (no gap
    ever exceeded the contract; vacuously true with < 2 predictions —
    no violation is observable).

    Gaps count minute-boundary crossings (both ends minute-truncated,
    the service_health discipline) so the audit is engine-independent
    for sub-minute timestamps.

    Scale shape: one distinct per (key, model, origin) — skipped when
    the caller guarantees one row per origin via ``unique=True``, e.g.
    by pre-filtering to a single horizon. ``unique=True`` TRUSTS that
    guarantee: duplicate (key, model, origin) rows are not detected —
    each duplicate inflates n_predictions by one and surfaces as a
    forced_predictions count with gap 0 (ADVICE r09; pytest-pinned in
    test_operators). Then ONE lag window and its
    groupBy on the same (key, model) partitioning: the aggregation
    reuses the window's exchange, so the whole audit is a single
    shuffle in the unique path regardless of store size."""
    origins = preds.select(key, model_col, pred_time_col)
    if not unique:
        origins = origins.distinct()
    w = Window.partitionBy(key, model_col).orderBy(pred_time_col)
    gap = F.expr(
        f"timestampdiff(MINUTE, date_trunc('minute', _prev),"
        f" date_trunc('minute', {pred_time_col}))").cast("long")
    gapped = (origins
              .withColumn("_prev", F.lag(pred_time_col).over(w))
              .withColumn("_gap", gap))
    return (gapped.groupBy(key, model_col)
            .agg(F.count(F.lit(1)).alias("n_predictions"),
                 F.count("_gap").alias("n_intervals"),
                 F.sum((F.col("_gap") == interval_minutes)
                       .cast("long")).alias("on_schedule_intervals"),
                 F.sum((F.col("_gap") < interval_minutes)
                       .cast("long")).alias("forced_predictions"),
                 F.sum((F.col("_gap") > interval_minutes)
                       .cast("long")).alias("delayed_intervals"),
                 F.min("_gap").alias("min_gap_minutes"),
                 F.max("_gap").alias("max_gap_minutes"),
                 F.coalesce(F.max("_gap") <= interval_minutes,
                            F.lit(True)).alias("cadence_ok"))
            .select(key, F.col(model_col).alias("model_name"),
                    "n_predictions", "n_intervals",
                    F.coalesce("on_schedule_intervals", F.lit(0))
                    .alias("on_schedule_intervals"),
                    F.coalesce("forced_predictions", F.lit(0))
                    .alias("forced_predictions"),
                    F.coalesce("delayed_intervals", F.lit(0))
                    .alias("delayed_intervals"),
                    "min_gap_minutes", "max_gap_minutes",
                    "cadence_ok"))


# The engine's documented numeric-parity envelope (SURVEY §5, found by
# the r08 fuzzer): beyond |price| ~1e6 the 6dp value-hash on EMA
# recursion chains drifts one ULP and the fixed-point err²·1e4 BIGINT
# bound in model_metrics can overflow. Real USD prices sit orders of
# magnitude inside it; the input gate FLAGS breaches instead of
# leaving the contract as documentation.
VALUE_HASH_DOMAIN_MAX = 1_000_000.0


def validate_input_report(candles: DataFrame, *,
                          key: str = "product_id",
                          price_cols: tuple[str, ...] = (
                              "open", "high", "low", "close"),
                          extra_cols: tuple[str, ...] = ("volume",),
                          seq_len_min: int = 24) -> DataFrame:
    """The predictor's input gate (predictor.py:346
    validate_input_data) as a distributed per-product report: OHLCV
    null counts, row count, the is_valid verdict (no nulls in the
    required columns AND at least seq_len rows), and the
    numeric-domain audit — n_out_of_domain counts price values with
    |price| >= VALUE_HASH_DOMAIN_MAX, in_value_hash_domain is their
    absence. One partial-agg shuffle; the reference's per-frame
    pandas checks become a single grouped pass over every product."""
    cols = [*price_cols, *extra_cols]
    nulls = [F.sum(F.col(x).isNull().cast("long"))
             .alias(f"n_null_{x}") for x in cols]
    # per-column coalesce: an all-NULL price column must contribute 0,
    # not NULL out the whole domain count
    ood = [F.coalesce(F.sum((F.abs(F.col(x)) >= VALUE_HASH_DOMAIN_MAX)
                            .cast("long")), F.lit(0))
           for x in price_cols]
    ood_sum = ood[0]
    for o in ood[1:]:
        ood_sum = ood_sum + o
    g = candles.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_rows"), *nulls,
        ood_sum.alias("n_out_of_domain"))
    ok = F.lit(True)
    for x in cols:
        ok = ok & (F.col(f"n_null_{x}") == 0)
    ok = ok & (F.col("n_rows") >= seq_len_min)
    return (g.withColumn("is_valid", ok)
            .withColumn("in_value_hash_domain",
                        F.col("n_out_of_domain") == 0))
