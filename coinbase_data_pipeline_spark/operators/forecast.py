"""Forecast-shaped outputs and forecast-quality metrics.

Reference parity:
- predictions table shape: cassandra/scripts (predictions:
  product_id, model_name, prediction_time, target_time,
  predicted_price) and prediction_service/src/data_writer.py:27-54.
- horizon fan-out: predictor.predict returns pred_len=12 future
  5-minute steps (prediction_service/src/predictor.py:172-238).
- metrics: Crypto-TS-Model-master/src/metrics.py (SMAPE, MAE, RMSE,
  directional accuracy).

The model itself is torch (not in this environment and not a query
capability); the engine provides the *data plumbing*: a deterministic
naive-persistence forecaster producing the exact predictions-table
shape, and distributed metric evaluation over (actual, predicted)
series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def naive_forecast(candles: DataFrame, *, key: str = "product_id",
                   ts: str = "bucket_start", price: str = "close",
                   horizons: int = 12, step_minutes: int = 5,
                   model_name: str = "naive_persistence_v1") -> DataFrame:
    """Persistence forecast: from each candle, predict `price` for the
    next `horizons` buckets. One explode — no shuffle at all (the fan-
    out is map-side), which is the right plan for writing a
    predictions table at scale."""
    h = F.explode(F.sequence(F.lit(1), F.lit(horizons))).alias("horizon")
    out = candles.select(F.col(key), F.col(ts).alias("prediction_time"),
                         F.col(price).alias("predicted_price"), h)
    return out.select(
        key,
        F.lit(model_name).alias("model_name"),
        "prediction_time",
        F.expr(f"timestampadd(MINUTE, {step_minutes} * horizon, "
               "prediction_time)").alias("target_time"),
        "horizon",
        "predicted_price",
    )


def volatility_rmse(candles: DataFrame, *, key: str = "product_id",
                    ts: str = "bucket_start", price: str = "close",
                    vol_window: int = 10) -> DataFrame:
    """Volatility-RMSE of the 1-step naive forecast per key
    (metrics.py:35-50): rolling volatility = sqrt(mean of squared
    1-step diffs over `vol_window`, full windows only), then RMSE
    between the truth's and the forecast's volatility series.

    Same key-ordered window family as every other feature — no
    additional shuffle beyond the one exchange on `key`.
    """
    w = Window.partitionBy(key).orderBy(ts)
    wn = w.rowsBetween(-(vol_window - 1), 0)
    y = F.col(price)
    yhat = F.lag(price, 1).over(w)
    d = candles.select(
        F.col(key), F.col(ts),
        (y - F.lag(price, 1).over(w)).alias("dy"),
        (yhat - F.lag(price, 2).over(w)).alias("dyhat"))
    vol = d.select(
        F.col(key), F.col(ts),
        F.when(F.count("dy").over(wn) >= vol_window,
               F.sqrt(F.avg(F.pow("dy", 2)).over(wn))).alias("true_vol"),
        F.when(F.count("dyhat").over(wn) >= vol_window,
               F.sqrt(F.avg(F.pow("dyhat", 2)).over(wn))).alias("pred_vol"))
    both = vol.filter(F.col("true_vol").isNotNull()
                      & F.col("pred_vol").isNotNull())
    err = F.col("true_vol") - F.col("pred_vol")
    return both.groupBy(key).agg(
        (F.round(F.sqrt(F.avg(err * err)), 6) + F.lit(0.0))
        .alias("vol_rmse"),
        F.count(F.lit(1)).alias("sample_count"))


def forecast_metrics(candles: DataFrame, *, key: str = "product_id",
                     ts: str = "bucket_start",
                     price: str = "close") -> DataFrame:
    """SMAPE / MAE / RMSE / directional accuracy of the 1-step naive
    forecast (pred_t = actual_{t-1}) per key — metrics.py semantics:

    - smape = mean(2|y-ŷ| / (|y|+|ŷ|)) * 100        (metrics.py:15-23)
    - dir_acc = mean(sign(Δy) == sign(Δŷ))           (metrics.py:25-33)

    One window pass + one grouped agg (partial-agg friendly).
    """
    w = Window.partitionBy(key).orderBy(ts)
    y = F.col(price)
    yhat = F.lag(price, 1).over(w)
    d = candles.select(
        F.col(key), y.alias("y"), yhat.alias("yhat"),
        (y - F.lag(price, 1).over(w)).alias("dy"),
        (F.lag(price, 1).over(w) - F.lag(price, 2).over(w)).alias("dyhat"),
    ).filter(F.col("yhat").isNotNull())
    return d.groupBy(key).agg(
        F.round(F.avg(2.0 * F.abs(F.col("y") - F.col("yhat"))
                      / (F.abs("y") + F.abs("yhat"))) * 100.0, 6)
         .alias("smape"),
        F.round(F.avg(F.abs(F.col("y") - F.col("yhat"))), 6).alias("mae"),
        F.round(F.sqrt(F.avg(F.pow(F.col("y") - F.col("yhat"), 2))), 6)
         .alias("rmse"),
        F.round(F.avg(F.when(F.col("dyhat").isNotNull(),
                             (F.signum("dy") == F.signum("dyhat"))
                             .cast("double"))), 6)
         .alias("dir_acc"),
        F.count(F.lit(1)).alias("sample_count"),
    )
