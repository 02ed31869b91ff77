"""Catalog part 3: JSON candle parse, series cleaning, truncated-EMA
MACD, grouped top-k, generic exact dedup. Same contract as catalog.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.timeutil import epoch_seconds
from ..operators import candles as C
from ..operators import indicators as I
from ..sources.json_ingest import parse_candles
from ..sources.tables import load_table
from .catalog import RND, SQL_BASE, _round, candles, ticks


# ------------------------------------------------------------- candle parse

def q_candle_parse(spark, sf_dir):
    """Round-trip the candle wire format: serialize each candle to the
    reference's JSON payload — `start` as unix-seconds for even-tick
    candles, ISO text otherwise — then run the typed parse with
    timestamp coercion (spark_processor.py:197-215). The oracle states
    the expected identity: parsing recovers the original candle.
    """
    c = candles(spark, sf_dir)
    start_str = (
        F.when(F.col("n_ticks") % 2 == 0,
               epoch_seconds(F.col("bucket_start"))
               .cast("long").cast("string"))
         .otherwise(F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")))
    raw = c.select(F.to_json(F.struct(
        start_str.alias("start"),
        F.col("high").cast("string").alias("high"),
        F.col("low").cast("string").alias("low"),
        F.col("open").cast("string").alias("open"),
        F.col("close").cast("string").alias("close"),
        F.col("volume").cast("string").alias("volume"),
        F.col("product_id"))).alias("value"))
    out = parse_candles(raw)
    return _round(out, ["open", "high", "low", "close", "volume"])


SQL_CANDLE_PARSE = SQL_BASE + """
SELECT product_id, bucket_start AS start_time,
       ROUND(open, 6) + 0 AS open, ROUND(high, 6) + 0 AS high,
       ROUND(low, 6) + 0 AS low, ROUND(close, 6) + 0 AS close,
       ROUND(volume, 6) + 0 AS volume
FROM candles
"""


# ------------------------------------------------------------- clean series

def q_clean_series(spark, sf_dir):
    df = I.clean_series(candles(spark, sf_dir), key="product_id",
                        ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "close", "volume"),
                  ["close", "volume"])


SQL_CLEAN_SERIES = SQL_BASE + """
, v0 AS (
  SELECT product_id, bucket_start, close,
         CASE WHEN volume != 0 THEN volume END AS v
  FROM candles
), v1 AS (
  SELECT product_id, bucket_start, close,
         COALESCE(v, quantile_cont(v, 0.5) OVER
           (PARTITION BY product_id ORDER BY bucket_start
            ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)) AS vf
  FROM v0
), stats AS (
  SELECT product_id,
         quantile_cont(close, 0.01) AS c_lo,
         quantile_cont(close, 0.99) AS c_hi,
         quantile_cont(vf, 0.01) AS v_lo,
         quantile_cont(vf, 0.99) AS v_hi
  FROM v1 GROUP BY product_id
), clipped AS (
  -- NULL-preserving clip (DuckDB least/greatest also skip NULLs)
  SELECT v1.product_id, bucket_start,
         CASE WHEN close IS NOT NULL
              THEN least(greatest(close, c_lo), c_hi) END AS close_c,
         CASE WHEN vf IS NOT NULL
              THEN least(greatest(vf, v_lo), v_hi) END AS vol_c
  FROM v1 JOIN stats USING (product_id)
)
SELECT product_id, bucket_start,
       ROUND(COALESCE(last_value(close_c IGNORE NULLS) OVER wf,
                      first_value(close_c IGNORE NULLS) OVER wb), 6) + 0
         AS close,
       ROUND(COALESCE(last_value(vol_c IGNORE NULLS) OVER wf,
                      first_value(vol_c IGNORE NULLS) OVER wb), 6) + 0
         AS volume
FROM clipped
WINDOW wf AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wb AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""


# -------------------------------------------------------------- macd approx

def q_macd_approx(spark, sf_dir):
    df = I.with_macd_approx(candles(spark, sf_dir), key="product_id",
                            ts="bucket_start")
    return _round(df.select("product_id", "bucket_start",
                            "ema_fast_approx", "ema_slow_approx",
                            "macd_approx"),
                  ["ema_fast_approx", "ema_slow_approx", "macd_approx"])


def _sql_macd_approx(fast: int = 12, slow: int = 26,
                     trunc: int = 60) -> str:
    def ema(span: int) -> str:
        a = 2.0 / (span + 1.0)
        return (
            f"list_sum(list_transform(generate_series(1, len(arr)), "
            f"i -> arr[i] * pow({1.0 - a!r}, len(arr) - i))) "
            f"/ ((1.0 - pow({1.0 - a!r}, len(arr))) / {a!r})")
    return SQL_BASE + f"""
, framed AS (
  SELECT product_id, bucket_start,
         list(close) OVER (PARTITION BY product_id ORDER BY bucket_start
                           ROWS BETWEEN {trunc - 1} PRECEDING AND CURRENT ROW)
           AS arr
  FROM candles
), emas AS (
  SELECT product_id, bucket_start,
         {ema(fast)} AS ef,
         {ema(slow)} AS es
  FROM framed
)
SELECT product_id, bucket_start,
       ROUND(ef, 6) + 0 AS ema_fast_approx,
       ROUND(es, 6) + 0 AS ema_slow_approx,
       ROUND(ef - es, 6) + 0 AS macd_approx
FROM emas
"""


# ------------------------------------------------------------------- top-k

def q_top_k(spark, sf_dir):
    """Top 10 highest-priced ticks per product (grouped top-k)."""
    t = ticks(spark, sf_dir)
    out = C.top_k_per_key(t, 10, key="product_id", order_col="price",
                          tiebreak="event_id")
    return out.select("product_id", "time", "price", "event_id", "rank")


SQL_TOP_K = SQL_BASE + """
SELECT product_id, time, price, event_id, rank FROM (
  SELECT product_id, time, price, event_id,
         CAST(row_number() OVER (PARTITION BY product_id
                                 ORDER BY price DESC, event_id) AS INT)
           AS rank
  FROM ticks
) WHERE rank <= 10
"""


# -------------------------------------------------------------- exact dedup

def q_dedup_exact(spark, sf_dir):
    """Generic exact dedup on events by content key
    (user_id, event_type, value): keeper = min event_id, plus group
    size — the relational-core counterpart of dedup_exact_docs."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id", "event_type", "value")
              .agg(F.min("event_id").alias("keep_id"),
                   F.count(F.lit(1)).alias("group_size")))


SQL_DEDUP_EXACT_EVENTS = """
SELECT user_id, event_type, value,
       min(event_id) AS keep_id, count(*) AS group_size
FROM events GROUP BY user_id, event_type, value
"""


# ------------------------------------------------------------ candle rollup

def q_candle_rollup(spark, sf_dir):
    """5-minute candles rolled up to hourly (hierarchical OHLCV
    re-aggregation — reads candles, not ticks)."""
    out = C.candle_rollup(candles(spark, sf_dir), freq="1 hour")
    return _round(out, ["open", "high", "low", "close", "volume"])


SQL_CANDLE_ROLLUP = SQL_BASE + """
SELECT product_id,
       time_bucket(INTERVAL '1 hour', bucket_start) AS hour_start,
       ROUND(arg_min(open, bucket_start), 6) + 0 AS open,
       ROUND(max(high), 6) + 0 AS high,
       ROUND(min(low), 6) + 0 AS low,
       ROUND(arg_max(close, bucket_start), 6) + 0 AS close,
       CAST(sum(n_ticks) AS BIGINT) AS n_ticks,
       ROUND(sum(volume), 6) + 0 AS volume
FROM candles GROUP BY 1, 2
""".replace("AS hour_start", "AS bucket_start")


# ----------------------------------------------------- incremental upsert

LATE_MOD = 23  # every 23rd tick arrives "late", scattered across history


def q_candle_upsert(spark, sf_dir):
    """Continuous-aggregate maintenance: build candle STATE from the
    on-time ticks (event_id % 23 != 0), then merge the late batch in
    via :func:`operators.candles.candle_upsert` — only affected
    buckets re-aggregate. The ORACLE is the full batch recompute over
    ALL ticks: incremental maintenance must be bit-identical to
    recomputation, which is the defining correctness property of a
    continuous aggregate."""
    t = ticks(spark, sf_dir).drop("ts_nanos")
    on_time = t.filter(F.col("event_id") % LATE_MOD != 0)
    late = t.filter(F.col("event_id") % LATE_MOD == 0)
    state = C.candle_state(on_time, volume="volume")
    out = C.candle_upsert(state, late, volume="volume")
    return _round(out, ["open", "high", "low", "close", "volume"])


SQL_CANDLE_UPSERT = """
WITH ticks AS (
  SELECT event_type AS product_id,
         ts AS time,
         value AS price,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume,
         event_id
  FROM events
)
SELECT product_id,
       time_bucket(INTERVAL '5 minutes', time) AS bucket_start,
       ROUND(arg_min(price, time), 6) + 0 AS open,
       ROUND(max(price), 6) + 0 AS high,
       ROUND(min(price), 6) + 0 AS low,
       ROUND(arg_max(price, time), 6) + 0 AS close,
       count(*) AS n_ticks,
       min(time) AS first_ts,
       max(time) AS last_ts,
       ROUND(sum(volume), 6) + 0 AS volume
FROM ticks GROUP BY 1, 2
"""


# ------------------------------------------------------- horizon evaluation

def q_prediction_horizon_eval(spark, sf_dir):
    """Forecast quality per (product, horizon): the naive 12-step
    forecast joined back to realized candles at target_time, scored
    with the reference's metric set — the predictions_by_horizon read
    path (cassandra predictions_by_horizon + metrics.py)."""
    from ..operators import forecast as FC

    c = candles(spark, sf_dir)
    preds = FC.naive_forecast(c)
    actual = c.select("product_id",
                      F.col("bucket_start").alias("target_time"),
                      F.col("close").alias("actual_price"))
    j = preds.join(actual, ["product_id", "target_time"])
    err = F.col("actual_price") - F.col("predicted_price")
    smape = (F.lit(2.0) * F.abs(err)
             / (F.abs("actual_price") + F.abs("predicted_price")))
    out = (j.groupBy("product_id", "horizon")
           .agg((F.round(F.avg(smape) * 100.0, RND) + F.lit(0.0))
                .alias("smape"),
                (F.round(F.avg(F.abs(err)), RND) + F.lit(0.0)).alias("mae"),
                (F.round(F.sqrt(F.avg(err * err)), RND) + F.lit(0.0))
                .alias("rmse"),
                F.count(F.lit(1)).alias("sample_count")))
    return out


SQL_PREDICTION_HORIZON_EVAL = SQL_BASE + """
, preds AS (
  SELECT product_id,
         bucket_start + h * INTERVAL 5 MINUTE AS target_time,
         CAST(h AS INT) AS horizon,
         close AS predicted_price
  FROM candles, (SELECT unnest(generate_series(1, 12)) AS h)
), j AS (
  SELECT p.product_id, p.horizon, p.predicted_price,
         c.close AS actual_price
  FROM preds p JOIN candles c
    ON p.product_id = c.product_id AND p.target_time = c.bucket_start
)
SELECT product_id, horizon,
       ROUND(avg(2.0 * abs(actual_price - predicted_price)
                 / (abs(actual_price) + abs(predicted_price))) * 100.0, 6)
         + 0 AS smape,
       ROUND(avg(abs(actual_price - predicted_price)), 6) + 0 AS mae,
       ROUND(sqrt(avg((actual_price - predicted_price)
                      * (actual_price - predicted_price))), 6) + 0 AS rmse,
       count(*) AS sample_count
FROM j GROUP BY product_id, horizon
"""


# ------------------------------------------------------- fit/transform scale

SCALE_SPLIT = "2024-01-22 00:00:00"


def q_scale_fit_transform(spark, sf_dir):
    """Leakage-free serving-time scaling: RobustScaler parameters are
    FIT on history (bucket_start < split) and APPLIED to the serving
    window (>= split) — the predictor's fit-on-30d-history /
    transform-latest-window pattern (prediction_service predictor.py
    + data_loader.py:128-161), which per-key whole-table scaling
    (robust_scale) cannot express without leaking future data.

    Plan: per-key stats are one grouped agg over the history range
    (partial-agg, pushdown on the time filter) broadcast-joined onto
    the serving slice."""
    c = candles(spark, sf_dir)
    hist = c.filter(F.col("bucket_start") < SCALE_SPLIT)
    stats = hist.groupBy("product_id").agg(
        F.percentile("close", F.lit(0.5)).alias("c_med"),
        F.percentile("close", F.lit(0.25)).alias("c_q1"),
        F.percentile("close", F.lit(0.75)).alias("c_q3"))
    serve = c.filter(F.col("bucket_start") >= SCALE_SPLIT)
    iqr = F.col("c_q3") - F.col("c_q1")
    scaled = F.when(iqr != 0,
                    (F.col("close") - F.col("c_med")) / iqr) \
              .otherwise(F.col("close") - F.col("c_med"))
    out = (serve.join(F.broadcast(stats), "product_id")
           .select("product_id", "bucket_start",
                   (F.round(scaled, RND) + F.lit(0.0))
                   .alias("close_scaled")))
    return out


SQL_SCALE_FIT_TRANSFORM = SQL_BASE + f"""
, stats AS (
  SELECT product_id,
         quantile_cont(close, 0.5) AS c_med,
         quantile_cont(close, 0.25) AS c_q1,
         quantile_cont(close, 0.75) AS c_q3
  FROM candles
  WHERE bucket_start < TIMESTAMP '{SCALE_SPLIT}'
  GROUP BY product_id
)
SELECT c.product_id, bucket_start,
       ROUND(CASE WHEN c_q3 - c_q1 != 0
             THEN (close - c_med) / (c_q3 - c_q1)
             ELSE close - c_med END, 6) + 0 AS close_scaled
FROM candles c JOIN stats s ON c.product_id = s.product_id
WHERE bucket_start >= TIMESTAMP '{SCALE_SPLIT}'
"""


# ------------------------------------------------- grouped scaler matrix

GS_ROBUST = ["open", "high", "low", "close", "volume"]
GS_MINMAX = ["hour_sin", "hour_cos", "dow_sin", "dow_cos",
             "is_weekend", "is_market_open"]


def q_grouped_scale(spark, sf_dir):
    """The reference's grouped scaler-matrix contract
    (data_loader.py:127-161): RobustScaler over the price+volume
    column group, MinMaxScaler(-1,1) over the time column group, all
    statistics fit on the train split only, transform applied to the
    full matrix. One stats shuffle for the whole matrix. The full
    26-feature variant over enhance_features is exercised in
    tests/test_operators.py (its indicator columns need the rolling
    pipeline, which the oracle already checks piecewise)."""
    feat = I.with_time_features(candles(spark, sf_dir), ts="bucket_start")
    out = I.grouped_scale(feat, key="product_id", ts="bucket_start",
                          split=SCALE_SPLIT, robust_cols=GS_ROBUST,
                          minmax_cols=GS_MINMAX)
    return out.select(
        "product_id", "bucket_start",
        *[(F.round(F.col(f"{c}_scaled"), RND) + F.lit(0.0))
          .alias(f"{c}_scaled") for c in GS_ROBUST + GS_MINMAX])


def _sql_grouped_scale() -> str:
    feat_exprs = """
         sin(2 * pi() * hour(bucket_start) / 24.0) AS hour_sin,
         cos(2 * pi() * hour(bucket_start) / 24.0) AS hour_cos,
         sin(2 * pi() * (isodow(bucket_start) - 1) / 7.0) AS dow_sin,
         cos(2 * pi() * (isodow(bucket_start) - 1) / 7.0) AS dow_cos,
         CAST(isodow(bucket_start) - 1 IN (5, 6) AS INT) AS is_weekend,
         CAST(hour(bucket_start) >= 8 AND hour(bucket_start) < 20 AS INT)
           AS is_market_open"""
    stat_parts = []
    sel_parts = []
    for c in GS_ROBUST:
        stat_parts.append(
            f"quantile_cont({c}, 0.5) AS {c}_med, "
            f"quantile_cont({c}, 0.25) AS {c}_q1, "
            f"quantile_cont({c}, 0.75) AS {c}_q3")
        sel_parts.append(
            f"ROUND(CASE WHEN {c}_q3 - {c}_q1 != 0 "
            f"THEN ({c} - {c}_med) / ({c}_q3 - {c}_q1) "
            f"ELSE {c} - {c}_med END, 6) + 0 AS {c}_scaled")
    for c in GS_MINMAX:
        stat_parts.append(f"min({c}) AS {c}_min, max({c}) AS {c}_max")
        sel_parts.append(
            f"ROUND((CASE WHEN {c}_max - {c}_min != 0 "
            f"THEN ({c} - {c}_min) / ({c}_max - {c}_min) "
            f"ELSE 0.0 END) * 2.0 - 1.0, 6) + 0 AS {c}_scaled")
    stats = ",\n         ".join(stat_parts)
    sels = ",\n       ".join(sel_parts)
    return SQL_BASE + f"""
, feat AS (
  SELECT product_id, bucket_start, open, high, low, close, volume,{feat_exprs}
  FROM candles
), stats AS (
  SELECT product_id,
         {stats}
  FROM feat WHERE bucket_start < TIMESTAMP '{SCALE_SPLIT}'
  GROUP BY product_id
)
SELECT f.product_id, bucket_start,
       {sels}
FROM feat f LEFT JOIN stats s ON f.product_id = s.product_id
"""


SQL_GROUPED_SCALE = _sql_grouped_scale()


# ------------------------------------------- grouped scaler, full matrix

GSF_ROBUST = ["open", "high", "low", "close", "price_ma_ratio",
              "price_spread", "volume", "volume_zscore",
              "volume_ma_ratio", "liquidity"]
GSF_MINMAX = ["rsi", "atr", "obv", "log_returns", "volatility_6",
              "volatility_12", "volatility_24", "momentum_3_6",
              "momentum_6_12", "hour_sin", "hour_cos", "dow_sin",
              "dow_cos", "is_weekend", "is_market_open"]
GSF_GATE = ["volatility_24", "volume_zscore", "volume_ma_ratio"]


def q_grouped_scale_full(spark, sf_dir):
    """The reference's ACTUAL scaler feature matrix
    (data_loader.py:127-161 over the :77-126 enhance output): all 25
    _enhance_crypto_features columns, RobustScaler on the price/volume
    group, MinMaxScaler(-1,1) on the indicator/time group, statistics
    fit on the train split only, warm-up rows (any NULL indicator)
    dropped first — the end-to-end matrix the model trains on.

    Determinism contract: every feature is 6dp-snapped on BOTH engines
    before the fit (the volume_ma_ratio recipe — one ROUND over the
    raw compute absorbs windowed-aggregation summation-order ulps), so
    percentile/min/max fit identical multisets and the transform
    divides identical doubles; only the final scaled value re-rounds.

    Plan: enhance_features' window family shares ONE
    hashpartitioning(product_id) Exchange; the 55-stat fit is one
    grouped aggregate over the train filter, broadcast back; the
    transform is pure projection. Width never adds shuffles.
    """
    feat = I.enhance_features(candles(spark, sf_dir))
    cols = GSF_ROBUST + GSF_MINMAX
    feat = feat.select(
        "product_id", "bucket_start",
        *[(F.round(F.col(c).cast("double"), RND) + F.lit(0.0)).alias(c)
          for c in cols])
    # warm-up gate on the 3 strictest columns only (volatility_24 ⟹
    # 24 consecutive positive-close returns ⟹ every other rolling
    # feature is warm; the zscore/ma_ratio pair covers degenerate
    # zero-variance / all-zero-volume windows). The SQL oracle applies
    # the IDENTICAL 3-column gate, so parity is by construction. A
    # 25-conjunct na.drop here fed the optimizer 25 window-expression
    # IsNotNull constraints × both join sides — constraint propagation
    # OOM'd the driver.
    feat = feat.na.drop(subset=GSF_GATE)
    # the scaler consumes feat TWICE (train-split stats fit + the
    # transform join); materialize the ~key-count×buckets matrix once
    # instead of re-running the parse→candle→25-window pipeline per
    # consumer. Size is rows×27 doubles — MB-scale even at 100 TB of
    # raw ticks, since candles aggregate 5-minute buckets per product.
    feat = feat.localCheckpoint(eager=True)
    out = I.grouped_scale(feat, key="product_id", ts="bucket_start",
                          split=SCALE_SPLIT, robust_cols=GSF_ROBUST,
                          minmax_cols=GSF_MINMAX)
    return out.select(
        "product_id", "bucket_start",
        *[(F.round(F.col(f"{c}_scaled"), RND) + F.lit(0.0))
          .alias(f"{c}_scaled") for c in cols])


def _sql_grouped_scale_full() -> str:
    feats = {
        "open": "ROUND(open, 6) + 0",
        "high": "ROUND(high, 6) + 0",
        "low": "ROUND(low, 6) + 0",
        "close": "ROUND(close, 6) + 0",
        "price_ma_ratio": "ROUND(close / avg(close) OVER w24, 6) + 0",
        "price_spread": "ROUND((high - low) / close, 6) + 0",
        "volume": "ROUND(volume, 6) + 0",
        "volume_zscore": (
            "ROUND(CASE WHEN count(volume) OVER w24 >= 24 THEN"
            " (volume - avg(volume) OVER w24)"
            " / stddev_samp(volume) OVER w24 END, 6) + 0"),
        "volume_ma_ratio":
            "ROUND(volume / avg(volume) OVER w24, 6) + 0",
        "liquidity": "ROUND(ln(1 + volume * close), 6) + 0",
        "rsi": (
            "ROUND(CASE WHEN count(gain) OVER w14 >= 14 THEN"
            " CASE WHEN avg(loss) OVER w14 = 0 THEN 100.0"
            " ELSE 100.0 - 100.0 / (1.0 + (avg(gain) OVER w14)"
            " / (avg(loss) OVER w14)) END END, 6) + 0"),
        "atr": ("ROUND(CASE WHEN count(tr) OVER w14 >= 14"
                " THEN avg(tr) OVER w14 END, 6) + 0"),
        "obv": "ROUND(sum(signed_volume) OVER wcum, 6) + 0",
        "log_returns": "ROUND(log_returns, 6) + 0",
        "volatility_6": (
            "ROUND(CASE WHEN count(log_returns) OVER w6 >= 6 THEN"
            " stddev_samp(log_returns) OVER w6 END, 6) + 0"),
        "volatility_12": (
            "ROUND(CASE WHEN count(log_returns) OVER w12 >= 12 THEN"
            " stddev_samp(log_returns) OVER w12 END, 6) + 0"),
        "volatility_24": (
            "ROUND(CASE WHEN count(log_returns) OVER w24 >= 24 THEN"
            " stddev_samp(log_returns) OVER w24 END, 6) + 0"),
        "momentum_3_6": (
            "ROUND((CASE WHEN count(close) OVER w3 >= 3"
            " THEN avg(close) OVER w3 END)"
            " - (CASE WHEN count(close) OVER w6 >= 6"
            " THEN avg(close) OVER w6 END), 6) + 0"),
        "momentum_6_12": (
            "ROUND((CASE WHEN count(close) OVER w6 >= 6"
            " THEN avg(close) OVER w6 END)"
            " - (CASE WHEN count(close) OVER w12 >= 12"
            " THEN avg(close) OVER w12 END), 6) + 0"),
        "hour_sin":
            "ROUND(sin(2 * pi() * hour(bucket_start) / 24.0), 6) + 0",
        "hour_cos":
            "ROUND(cos(2 * pi() * hour(bucket_start) / 24.0), 6) + 0",
        "dow_sin": ("ROUND(sin(2 * pi() * (isodow(bucket_start) - 1)"
                    " / 7.0), 6) + 0"),
        "dow_cos": ("ROUND(cos(2 * pi() * (isodow(bucket_start) - 1)"
                    " / 7.0), 6) + 0"),
        "is_weekend": ("ROUND(CAST(isodow(bucket_start) - 1 IN (5, 6)"
                       " AS DOUBLE), 6) + 0"),
        "is_market_open": (
            "ROUND(CAST(hour(bucket_start) >= 8"
            " AND hour(bucket_start) < 20 AS DOUBLE), 6) + 0"),
    }
    feat_sel = ",\n         ".join(f"{e} AS {c}" for c, e in feats.items())
    notnull = " AND ".join(f"{c} IS NOT NULL" for c in GSF_GATE)
    stat_parts, sel_parts = [], []
    for c in GSF_ROBUST:
        stat_parts.append(
            f"quantile_cont({c}, 0.5) AS {c}_med, "
            f"quantile_cont({c}, 0.25) AS {c}_q1, "
            f"quantile_cont({c}, 0.75) AS {c}_q3")
        sel_parts.append(
            f"ROUND(CASE WHEN {c}_q3 - {c}_q1 != 0 "
            f"THEN ({c} - {c}_med) / ({c}_q3 - {c}_q1) "
            f"ELSE {c} - {c}_med END, 6) + 0 AS {c}_scaled")
    for c in GSF_MINMAX:
        stat_parts.append(f"min({c}) AS {c}_min, max({c}) AS {c}_max")
        sel_parts.append(
            f"ROUND((CASE WHEN {c}_max - {c}_min != 0 "
            f"THEN ({c} - {c}_min) / ({c}_max - {c}_min) "
            f"ELSE 0.0 END) * 2.0 - 1.0, 6) + 0 AS {c}_scaled")
    stats = ",\n         ".join(stat_parts)
    sels = ",\n       ".join(sel_parts)
    return SQL_BASE + f"""
, d1 AS (
  SELECT product_id, bucket_start, open, high, low, close, volume,
         CASE WHEN close > 0 AND lag(close) OVER w1 > 0
              THEN ln(close / lag(close) OVER w1) END AS log_returns,
         close - lag(close) OVER w1 AS delta,
         greatest(high - low, abs(high - lag(close) OVER w1),
                  abs(low - lag(close) OVER w1)) AS tr,
         CASE WHEN close - lag(close) OVER w1 > 0 THEN volume
              WHEN close - lag(close) OVER w1 < 0 THEN -volume
              ELSE 0.0 END AS signed_volume
  FROM candles
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
), gl AS (
  SELECT *,
         CASE WHEN delta > 0 THEN delta
              WHEN delta IS NOT NULL THEN 0.0 END AS gain,
         CASE WHEN delta < 0 THEN -delta
              WHEN delta IS NOT NULL THEN 0.0 END AS loss
  FROM d1
), fraw AS (
  SELECT product_id, bucket_start,
         {feat_sel}
  FROM gl
  WINDOW w3 AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w6 AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
         w12 AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN 11 PRECEDING AND CURRENT ROW),
         w14 AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
         w24 AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW),
         wcum AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), feat AS (
  SELECT * FROM fraw WHERE {notnull}
), stats AS (
  SELECT product_id,
         {stats}
  FROM feat WHERE bucket_start < TIMESTAMP '{SCALE_SPLIT}'
  GROUP BY product_id
)
SELECT f.product_id, bucket_start,
       {sels}
FROM feat f LEFT JOIN stats s ON f.product_id = s.product_id
"""


SQL_GROUPED_SCALE_FULL = _sql_grouped_scale_full()


# ------------------------------------------------------- returns correlation

def q_returns_correlation(spark, sf_dir):
    """Pairwise Pearson correlation of per-product log returns over
    time-aligned candles (the cross-asset similarity scan).

    Plan: the self-join aligns on bucket_start (equi-join), pairs are
    keyed (product_a < product_b), and corr() partial-aggregates — at
    k products the pair space is k²/2 but each pair streams through
    one co-grouped aggregation, no driver-side matrix."""
    df = I.with_log_returns(candles(spark, sf_dir), key="product_id",
                            ts="bucket_start")
    lr = (df.select("product_id", "bucket_start", "log_returns")
          .filter(F.col("log_returns").isNotNull()))
    a = lr.select(F.col("product_id").alias("product_a"),
                  "bucket_start", F.col("log_returns").alias("r_a"))
    b = lr.select(F.col("product_id").alias("product_b"),
                  "bucket_start", F.col("log_returns").alias("r_b"))
    return (a.join(b, "bucket_start")
            .filter(F.col("product_a") < F.col("product_b"))
            .groupBy("product_a", "product_b")
            .agg((F.round(F.corr("r_a", "r_b"), RND) + F.lit(0.0))
                 .alias("corr"),
                 F.count(F.lit(1)).alias("n_obs")))


SQL_RETURNS_CORRELATION = SQL_BASE + """
, lr AS (
  SELECT product_id, bucket_start,
         CASE WHEN close > 0
              AND lag(close) OVER (PARTITION BY product_id
                                   ORDER BY bucket_start) > 0
         THEN ln(close / lag(close) OVER (PARTITION BY product_id
                                          ORDER BY bucket_start)) END
           AS r
  FROM candles
)
SELECT a.product_id AS product_a, b.product_id AS product_b,
       ROUND(corr(a.r, b.r), 6) + 0 AS corr,
       count(*) AS n_obs
FROM lr a JOIN lr b
  ON a.bucket_start = b.bucket_start AND a.product_id < b.product_id
WHERE a.r IS NOT NULL AND b.r IS NOT NULL
GROUP BY 1, 2
"""


# ------------------------------------------------------------ more indicators

def q_vwap(spark, sf_dir):
    """Per-bucket VWAP (volume-weighted average price) straight from
    ticks — one partial-agg groupBy, the canonical market-data
    aggregate the candle table doesn't carry."""
    t = ticks(spark, sf_dir)
    # snap-then-divide, UNROUNDED quotient: both sums are 6dp-rounded
    # BEFORE the division — the raw sums sit on a decimal grid (2dp
    # prices × volumes), so snapping collapses cross-engine
    # summation-order noise to identical doubles, and dividing
    # identical doubles is bit-deterministic. The quotient itself is
    # NOT rounded: these quotients terminate on exact 6dp midpoints
    # (volumes are 2^k·5 multiples), where Spark's and DuckDB's
    # midpoint rules disagree — any rounding reintroduces divergence.
    out = (t.groupBy(F.col("product_id"),
                     F.window("time", "5 minutes").alias("w"))
           .agg((F.round(F.sum(F.col("price") * F.col("volume")), RND)
                 / F.round(F.sum("volume"), RND))
                .alias("vwap"),
                (F.round(F.sum("volume"), RND) + F.lit(0.0))
                .alias("volume"))
           .withColumn("bucket_start", F.col("w.start"))
           .drop("w")
           .select("product_id", "bucket_start", "vwap", "volume"))
    return out


SQL_VWAP = SQL_BASE + """
SELECT product_id,
       time_bucket(INTERVAL '5 minutes', time) AS bucket_start,
       ROUND(sum(price * volume), 6) / ROUND(sum(volume), 6) AS vwap,
       ROUND(sum(volume), 6) + 0 AS volume
FROM ticks GROUP BY 1, 2
"""


def q_bollinger(spark, sf_dir):
    df = I.with_bollinger(candles(spark, sf_dir), key="product_id",
                          ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "bb_mid",
                            "bb_upper", "bb_lower"),
                  ["bb_mid", "bb_upper", "bb_lower"])


SQL_BOLLINGER = SQL_BASE + """
SELECT product_id, bucket_start,
       ROUND(CASE WHEN count(close) OVER w20 >= 20
             THEN avg(close) OVER w20 END, 6) + 0 AS bb_mid,
       ROUND(CASE WHEN count(close) OVER w20 >= 20
             THEN avg(close) OVER w20
                  + 2.0 * stddev_samp(close) OVER w20 END, 6) + 0
         AS bb_upper,
       ROUND(CASE WHEN count(close) OVER w20 >= 20
             THEN avg(close) OVER w20
                  - 2.0 * stddev_samp(close) OVER w20 END, 6) + 0
         AS bb_lower
FROM candles
WINDOW w20 AS (PARTITION BY product_id ORDER BY bucket_start
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
"""


def q_stochastic(spark, sf_dir):
    df = I.with_stochastic(candles(spark, sf_dir), key="product_id",
                           ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "stoch_k",
                            "stoch_d"),
                  ["stoch_k", "stoch_d"])


SQL_STOCHASTIC = SQL_BASE + """
, k AS (
  SELECT product_id, bucket_start,
         CASE WHEN count(close) OVER w14 >= 14 THEN
           100.0 * (close - min(low) OVER w14)
                 / (max(high) OVER w14 - min(low) OVER w14)
         END AS stoch_k
  FROM candles
  WINDOW w14 AS (PARTITION BY product_id ORDER BY bucket_start
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT product_id, bucket_start,
       ROUND(stoch_k, 6) + 0 AS stoch_k,
       ROUND(CASE WHEN count(stoch_k) OVER w3 >= 3
             THEN avg(stoch_k) OVER w3 END, 6) + 0 AS stoch_d
FROM k
WINDOW w3 AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# ----------------------------------------------------------------- gap audit

def q_candle_gaps(spark, sf_dir):
    """Missing-bucket audit per product: expected 5-minute grid from
    each product's min to max bucket (generated with sequence(), no
    driver loop) anti-joined against observed candles. The per-key
    grid is generated map-side from the tiny min/max aggregate —
    at scale this is one small generate + one anti-join on
    (product, bucket), not a calendar cross join."""
    c = candles(spark, sf_dir).select("product_id", "bucket_start")
    span = c.groupBy("product_id").agg(
        F.min("bucket_start").alias("t0"),
        F.max("bucket_start").alias("t1"))
    grid = span.select(
        "product_id",
        F.explode(F.sequence("t0", "t1",
                             F.expr("INTERVAL 5 MINUTES")))
        .alias("bucket_start"))
    missing = grid.join(c, ["product_id", "bucket_start"], "left_anti")
    return (missing.groupBy("product_id")
            .agg(F.count(F.lit(1)).alias("missing_buckets"),
                 F.min("bucket_start").alias("first_gap"),
                 F.max("bucket_start").alias("last_gap")))


SQL_CANDLE_GAPS = SQL_BASE + """
, span AS (
  SELECT product_id, min(bucket_start) AS t0, max(bucket_start) AS t1
  FROM candles GROUP BY product_id
), grid AS (
  SELECT product_id,
         unnest(generate_series(t0, t1, INTERVAL 5 MINUTE))
           AS bucket_start
  FROM span
), missing AS (
  SELECT g.product_id, g.bucket_start
  FROM grid g LEFT JOIN candles c
    ON g.product_id = c.product_id AND g.bucket_start = c.bucket_start
  WHERE c.product_id IS NULL
)
SELECT product_id, count(*) AS missing_buckets,
       min(bucket_start) AS first_gap, max(bucket_start) AS last_gap
FROM missing GROUP BY product_id
"""


# ------------------------------------------------------------------ cohorts

def q_retention_cohorts(spark, sf_dir):
    """Weekly retention: users grouped by first-seen week (cohort),
    counted distinct in each subsequent activity week. Two aggregates
    over one events scan joined on user_id; the first-week table is
    one row PER USER (unbounded at scale), so the join is left to AQE
    — broadcast only if it actually fits, shuffle-join otherwise."""
    ev = load_table(spark, sf_dir, "events")
    wk = F.to_date(F.date_trunc("week", F.col("ts")))
    first = (ev.groupBy("user_id")
             .agg(F.to_date(F.date_trunc("week", F.min("ts")))
                  .alias("cohort_week")))
    out = (ev.select("user_id", wk.alias("active_week"))
           .join(first, "user_id")
           .groupBy("cohort_week", "active_week")
           .agg(F.count_distinct("user_id").alias("active_users"))
           .withColumn("weeks_since",
                       F.datediff("active_week", "cohort_week")
                       .cast("int") / 7)
           .withColumn("weeks_since", F.col("weeks_since").cast("int")))
    return out


SQL_RETENTION_COHORTS = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE)
           AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_trunc('week', e.ts) AS DATE) AS active_week,
       count(DISTINCT e.user_id) AS active_users,
       CAST(date_diff('day', f.cohort_week,
                      CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
         AS weeks_since
FROM events e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


# ----------------------------------------------------------------- registry


# -------------------------------------------------- drawdown / rolling corr

def q_max_drawdown(spark, sf_dir):
    """Per-product maximum drawdown of the candle close series (most
    negative close/running_peak - 1) with its trough timestamp."""
    return I.max_drawdown(candles(spark, sf_dir), key="product_id",
                          ts="bucket_start")


SQL_MAX_DRAWDOWN = SQL_BASE + """
, dd AS (
  SELECT product_id, bucket_start,
         ROUND(close / max(close) OVER (
             PARTITION BY product_id ORDER BY bucket_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - 1.0, 6) + 0 AS dd
  FROM candles
)
SELECT product_id, dd AS max_drawdown, bucket_start AS trough_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY product_id
                               ORDER BY dd, bucket_start) AS rn
  FROM dd
) WHERE rn = 1
"""


ROLL_CORR_W = 24


def q_rolling_correlation(spark, sf_dir):
    """Trailing close/volume Pearson correlation per product —
    windowed moments, NULL for short or zero-variance frames."""
    return I.rolling_correlation(candles(spark, sf_dir),
                                 key="product_id", ts="bucket_start",
                                 window=ROLL_CORR_W)


SQL_ROLLING_CORRELATION = SQL_BASE + f"""
, m AS (
  SELECT product_id, bucket_start,
         count(*) OVER w AS n,
         avg(close) OVER w AS ex, avg(volume) OVER w AS ey,
         avg(close * volume) OVER w AS exy,
         avg(close * close) OVER w AS exx,
         avg(volume * volume) OVER w AS eyy
  FROM candles
  WINDOW w AS (PARTITION BY product_id ORDER BY bucket_start
               ROWS BETWEEN {ROLL_CORR_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT product_id, bucket_start,
       CASE WHEN n >= {ROLL_CORR_W}
             AND exx - ex * ex > 0 AND eyy - ey * ey > 0
            THEN ROUND((exy - ex * ey)
                       / sqrt((exx - ex * ex) * (eyy - ey * ey)), 6) + 0
       END AS rolling_corr
FROM m
"""


ROLL_BETA_W = 24


def q_rolling_beta(spark, sf_dir):
    """Trailing market beta per product vs the equal-weight mean log
    return across products (6dp-snapped inputs, key-ordered market
    fold, NULL short/zero-variance frames)."""
    return I.rolling_beta(candles(spark, sf_dir),
                          key="product_id", ts="bucket_start",
                          window=ROLL_BETA_W)


SQL_ROLLING_BETA = SQL_BASE + f"""
, rets AS (
  SELECT product_id, bucket_start,
         ROUND(CASE WHEN close > 0
                    AND lag(close) OVER (PARTITION BY product_id
                                         ORDER BY bucket_start) > 0
               THEN ln(close / lag(close) OVER (
                   PARTITION BY product_id ORDER BY bucket_start)) END,
               6) + 0 AS ret
  FROM candles
), r AS (
  SELECT * FROM rets WHERE ret IS NOT NULL
), mkt AS (
  SELECT bucket_start,
         list_sum(list(ret ORDER BY product_id)) / count(*) AS mkt_ret
  FROM r GROUP BY bucket_start
), j AS (
  SELECT r.product_id, r.bucket_start, r.ret, mkt.mkt_ret
  FROM r JOIN mkt USING (bucket_start)
), m AS (
  SELECT product_id, bucket_start, ret, mkt_ret,
         count(*) OVER w AS n,
         avg(ret) OVER w AS er, avg(mkt_ret) OVER w AS em,
         avg(ret * mkt_ret) OVER w AS erm,
         avg(mkt_ret * mkt_ret) OVER w AS emm
  FROM j
  WINDOW w AS (PARTITION BY product_id ORDER BY bucket_start
               ROWS BETWEEN {ROLL_BETA_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT product_id, bucket_start, ret, mkt_ret,
       CASE WHEN n >= {ROLL_BETA_W} AND emm - em * em > 0
            THEN ROUND((erm - er * em) / (emm - em * em), 6) + 0
       END AS rolling_beta
FROM m
"""


def q_candle_patterns(spark, sf_dir):
    """Candlestick pattern flags per candle: doji, hammer, bull/bear
    engulfing vs the previous candle (operators/candles.py)."""
    return C.candle_patterns(candles(spark, sf_dir))


SQL_CANDLE_PATTERNS = SQL_BASE + """
, p AS (
  SELECT product_id, bucket_start, open, high, low, close,
         close - open AS body, high - low AS rng,
         high - greatest(open, close) AS upper,
         least(open, close) - low AS lower,
         lag(open) OVER w AS p_open, lag(close) OVER w AS p_close
  FROM candles
  WINDOW w AS (PARTITION BY product_id ORDER BY bucket_start)
)
SELECT product_id, bucket_start,
       ROUND(body, 6) + 0 AS body,
       ROUND(rng, 6) + 0 AS range,
       abs(body) <= 0.1 * rng AS is_doji,
       (rng > 0 AND lower >= 2 * abs(body) AND upper <= abs(body))
         AS is_hammer,
       CASE WHEN body > 0 AND p_close < p_open
                 AND open <= p_close AND close >= p_open THEN 'bull'
            WHEN body < 0 AND p_close > p_open
                 AND open >= p_close AND close <= p_open THEN 'bear'
       END AS engulfing
FROM p
"""


# ---------------------------------------------------- grid fill / xs rank

def q_candle_grid_fill(spark, sf_dir):
    """Dense 5-minute grid per product (pandas-resample semantics for
    missing buckets: OHLC ffill, volume 0, is_gap flag)."""
    out = C.candle_grid_fill(candles(spark, sf_dir))
    return _round(out, ["open", "high", "low", "close", "volume"])


SQL_CANDLE_GRID_FILL = SQL_BASE + """
, span AS (
  SELECT product_id, min(bucket_start) AS t0, max(bucket_start) AS t1
  FROM candles GROUP BY product_id
), grid AS (
  SELECT product_id,
         unnest(generate_series(t0, t1, INTERVAL 5 MINUTE))
           AS bucket_start
  FROM span
), joined AS (
  SELECT g.product_id, g.bucket_start,
         c.open, c.high, c.low, c.close, c.volume, c.n_ticks,
         c.n_ticks IS NULL AS is_gap
  FROM grid g LEFT JOIN candles c
    ON g.product_id = c.product_id AND g.bucket_start = c.bucket_start
)
SELECT product_id, bucket_start,
       ROUND(last_value(open IGNORE NULLS) OVER w, 6) + 0 AS open,
       ROUND(last_value(high IGNORE NULLS) OVER w, 6) + 0 AS high,
       ROUND(last_value(low IGNORE NULLS) OVER w, 6) + 0 AS low,
       ROUND(last_value(close IGNORE NULLS) OVER w, 6) + 0 AS close,
       ROUND(coalesce(volume, 0.0), 6) + 0 AS volume,
       coalesce(n_ticks, 0) AS n_ticks,
       is_gap
FROM joined
WINDOW w AS (PARTITION BY product_id ORDER BY bucket_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_cross_sectional_rank(spark, sf_dir):
    """Cross-sectional momentum rank: per bucket, products ordered by
    their one-bucket log return — the time-partitioned window axis
    (rank ACROSS keys at each instant), complementing the per-key
    series windows everywhere else. First-bucket rows (no return)
    are excluded on both engines."""
    c = candles(spark, sf_dir)
    wk = Window.partitionBy("product_id").orderBy("bucket_start")
    prev = F.lag("close").over(wk)
    # non-positive prices have no log return (see with_log_returns)
    ret = (F.round(F.when((F.col("close") > 0) & (prev > 0),
                          F.log(F.col("close") / prev)), 6)
           + F.lit(0.0))
    t = (c.select("product_id", "bucket_start", ret.alias("ret"))
         .filter(F.col("ret").isNotNull()))
    wt = Window.partitionBy("bucket_start").orderBy(
        F.desc("ret"), F.col("product_id"))
    return t.withColumn("xs_rank",
                        F.row_number().over(wt).cast("int"))


SQL_CROSS_SECTIONAL_RANK = SQL_BASE + """
, rets AS (
  SELECT product_id, bucket_start,
         ROUND(CASE WHEN close > 0
                    AND lag(close) OVER (PARTITION BY product_id
                                         ORDER BY bucket_start) > 0
               THEN ln(close / lag(close) OVER (
                   PARTITION BY product_id ORDER BY bucket_start)) END,
               6) + 0
           AS ret
  FROM candles
)
SELECT product_id, bucket_start, ret,
       CAST(row_number() OVER (PARTITION BY bucket_start
                               ORDER BY ret DESC, product_id) AS INT)
         AS xs_rank
FROM rets WHERE ret IS NOT NULL
"""


# ---------------------------------------------------------- keltner channel

KC_MA, KC_ATR, KC_MULT = 20, 10, 2.0


def q_keltner_channel(spark, sf_dir):
    """Keltner channel (SMA basis): MA(20) of typical price ± 2×
    ATR(10) — the volatility-width companion to bollinger's σ-width
    and donchian's range-width; all three share the one-window-family
    plan. Typical price (H+L+C)/3 is identical-per-row arithmetic;
    full windows only (NULL edges); 6dp rounding at the boundary."""
    c = candles(spark, sf_dir)
    w1 = Window.partitionBy("product_id").orderBy("bucket_start")
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    prev_close = F.lag("close").over(w1)
    tr = F.greatest(F.col("high") - F.col("low"),
                    F.abs(F.col("high") - prev_close),
                    F.abs(F.col("low") - prev_close))
    base = c.select("product_id", "bucket_start", "close",
                    tp.alias("_tp"), tr.alias("_tr"))
    wm = w1.rowsBetween(-(KC_MA - 1), 0)
    wa = w1.rowsBetween(-(KC_ATR - 1), 0)
    mid = F.when(F.count(F.lit(1)).over(wm) >= KC_MA,
                 F.avg("_tp").over(wm))
    atr = F.when(F.count("_tr").over(wa) >= KC_ATR,
                 F.avg("_tr").over(wa))
    out = base.select(
        "product_id", "bucket_start", "close",
        (F.round(mid, RND) + F.lit(0.0)).alias("kc_mid"),
        (F.round(mid + KC_MULT * atr, RND) + F.lit(0.0)).alias("kc_upper"),
        (F.round(mid - KC_MULT * atr, RND) + F.lit(0.0)).alias("kc_lower"))
    return out


SQL_KELTNER = SQL_BASE + f"""
, base AS (
  SELECT product_id, bucket_start, close,
         (high + low + close) / 3.0 AS tp,
         greatest(high - low,
                  abs(high - lag(close) OVER w1),
                  abs(low - lag(close) OVER w1)) AS tr
  FROM candles
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
), ch AS (
  SELECT product_id, bucket_start, close,
         CASE WHEN count(*) OVER wm >= {KC_MA}
              THEN avg(tp) OVER wm END AS mid,
         CASE WHEN count(tr) OVER wa >= {KC_ATR}
              THEN avg(tr) OVER wa END AS atr
  FROM base
  WINDOW wm AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN {KC_MA - 1} PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN {KC_ATR - 1} PRECEDING AND CURRENT ROW)
)
SELECT product_id, bucket_start, close,
       ROUND(mid, 6) + 0 AS kc_mid,
       ROUND(mid + {KC_MULT} * atr, 6) + 0 AS kc_upper,
       ROUND(mid - {KC_MULT} * atr, 6) + 0 AS kc_lower
FROM ch
"""


# ------------------------------------------------------------- pivot points

def q_pivot_points(spark, sf_dir):
    """Classic floor-trader pivot levels per product per day, from the
    PREVIOUS day's OHLC: P=(H+L+C)/3, R1=2P−L, S1=2P−H, R2=P+(H−L),
    S2=P−(H−L) — the support/resistance grid desks quote daily. One
    per-(product, day) aggregate + one lag window; open/close via
    deterministic struct min/max keyed by bucket time."""
    c = candles(spark, sf_dir)
    day = F.date_trunc("day", F.col("bucket_start")).alias("day")
    daily = (c.groupBy("product_id", day)
             .agg(F.max("high").alias("h"), F.min("low").alias("l"),
                  F.max(F.struct("bucket_start", "close")).alias("_c"))
             .select("product_id", "day", "h", "l",
                     F.col("_c.close").alias("c")))
    w = Window.partitionBy("product_id").orderBy("day")
    ph = F.lag("h").over(w)
    pl = F.lag("l").over(w)
    pc = F.lag("c").over(w)
    p = (ph + pl + pc) / 3.0
    return (daily.select(
        "product_id", "day",
        (F.round(p, RND) + F.lit(0.0)).alias("pivot"),
        (F.round(2 * p - pl, RND) + F.lit(0.0)).alias("r1"),
        (F.round(2 * p - ph, RND) + F.lit(0.0)).alias("s1"),
        (F.round(p + (ph - pl), RND) + F.lit(0.0)).alias("r2"),
        (F.round(p - (ph - pl), RND) + F.lit(0.0)).alias("s2")))


SQL_PIVOT_POINTS = SQL_BASE + """
, daily AS (
  -- CAST: DuckDB date_trunc('day') yields DATE; Spark's yields
  -- TIMESTAMP — align the types or the value-hash strings differ
  SELECT product_id,
         CAST(date_trunc('day', bucket_start) AS TIMESTAMP) AS day,
         max(high) AS h, min(low) AS l,
         max(struct_pack(t := bucket_start, c := close)).c AS c
  FROM candles GROUP BY 1, 2
), lagged AS (
  SELECT product_id, day,
         lag(h) OVER w AS ph, lag(l) OVER w AS pl, lag(c) OVER w AS pc
  FROM daily
  WINDOW w AS (PARTITION BY product_id ORDER BY day)
)
SELECT product_id, day,
       ROUND((ph + pl + pc) / 3.0, 6) + 0 AS pivot,
       ROUND(2 * ((ph + pl + pc) / 3.0) - pl, 6) + 0 AS r1,
       ROUND(2 * ((ph + pl + pc) / 3.0) - ph, 6) + 0 AS s1,
       ROUND((ph + pl + pc) / 3.0 + (ph - pl), 6) + 0 AS r2,
       ROUND((ph + pl + pc) / 3.0 - (ph - pl), 6) + 0 AS s2
FROM lagged
"""


# --------------------------------------------------------- money flow index

MFI_W = 14


def q_mfi(spark, sf_dir):
    """Money Flow Index (SMA formulation): volume-weighted RSI over
    typical-price money flow — raw flow = tp × volume signed by the
    tp delta, MFI = 100 − 100/(1 + Σpos/Σneg) over a 14-bucket
    window. All-positive windows → 100 (the RSI convention); full
    windows only. The money sums are windowed sums of
    engine-identical doubles in frame order, rounded at the
    boundary."""
    c = candles(spark, sf_dir)
    w1 = Window.partitionBy("product_id").orderBy("bucket_start")
    tp = (F.col("high") + F.col("low") + F.col("close")) / 3.0
    base = c.select("product_id", "bucket_start", tp.alias("_tp"),
                    "volume")
    dtp = F.col("_tp") - F.lag("_tp").over(w1)
    flow = F.col("_tp") * F.col("volume")
    flagged = base.select(
        "product_id", "bucket_start",
        F.when(dtp > 0, flow).otherwise(
            F.when(dtp.isNotNull(), F.lit(0.0))).alias("_pos"),
        F.when(dtp < 0, flow).otherwise(
            F.when(dtp.isNotNull(), F.lit(0.0))).alias("_neg"))
    wn = w1.rowsBetween(-(MFI_W - 1), 0)
    cnt = F.count("_pos").over(wn)
    pos = F.sum("_pos").over(wn)
    neg = F.sum("_neg").over(wn)
    mfi = F.when(cnt >= MFI_W,
                 F.when(neg == 0, F.lit(100.0))
                 .otherwise(100.0 - 100.0 / (1.0 + pos / neg)))
    return flagged.select(
        "product_id", "bucket_start",
        (F.round(mfi, RND) + F.lit(0.0)).alias("mfi"))


SQL_MFI = SQL_BASE + f"""
, base AS (
  SELECT product_id, bucket_start,
         (high + low + close) / 3.0 AS tp, volume
  FROM candles
), flagged AS (
  SELECT product_id, bucket_start,
         CASE WHEN tp - lag(tp) OVER w1 > 0 THEN tp * volume
              WHEN tp - lag(tp) OVER w1 IS NOT NULL THEN 0.0
         END AS pos,
         CASE WHEN tp - lag(tp) OVER w1 < 0 THEN tp * volume
              WHEN tp - lag(tp) OVER w1 IS NOT NULL THEN 0.0
         END AS neg
  FROM base
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
)
SELECT product_id, bucket_start,
       ROUND(CASE WHEN count(pos) OVER wn >= {MFI_W} THEN
               CASE WHEN sum(neg) OVER wn = 0 THEN 100.0
                    ELSE 100.0 - 100.0 / (1.0 + sum(pos) OVER wn
                                          / sum(neg) OVER wn) END
             END, 6) + 0 AS mfi
FROM flagged
WINDOW wn AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN {MFI_W - 1} PRECEDING AND CURRENT ROW)
"""


# ------------------------------------------------------------ volume profile

VP_BINS = 20


def q_volume_profile(spark, sf_dir):
    """Market-profile volume histogram per product: close-price range
    split into 20 equal bins, per-bin traded volume + bucket count,
    and the is_poc flag on the point of control (the highest-volume
    bin — deterministic argmax via (volume, bin) struct max). The
    where-does-volume-cluster view behind support/resistance levels.
    One stats aggregate broadcast back + one binned aggregate."""
    c = candles(spark, sf_dir)
    bounds = (c.groupBy("product_id")
              .agg(F.min("close").alias("lo"), F.max("close").alias("hi")))
    bin_expr = F.when(
        F.col("hi") > F.col("lo"),
        F.least(F.lit(VP_BINS - 1),
                F.floor((F.col("close") - F.col("lo"))
                        / (F.col("hi") - F.col("lo")) * VP_BINS)
                .cast("int"))).otherwise(F.lit(0))
    binned = (c.join(F.broadcast(bounds), "product_id")
              .select("product_id", "lo", "hi",
                      bin_expr.alias("bin"), "volume")
              .groupBy("product_id", "lo", "hi", "bin")
              .agg(F.count(F.lit(1)).alias("n_buckets"),
                   (F.round(F.sum("volume"), RND) + F.lit(0.0))
                   .alias("bin_volume")))
    w = Window.partitionBy("product_id")
    poc = F.max(F.struct("bin_volume", "bin")).over(w)
    return (binned
            .withColumn("is_poc",
                        (F.col("bin_volume") == poc.getField("bin_volume"))
                        & (F.col("bin") == poc.getField("bin")))
            .select("product_id", "bin",
                    (F.round(F.col("lo") + F.col("bin")
                             * (F.col("hi") - F.col("lo")) / VP_BINS,
                             RND) + F.lit(0.0)).alias("bin_low"),
                    "n_buckets", "bin_volume", "is_poc"))


SQL_VOLUME_PROFILE = SQL_BASE + f"""
, bounds AS (
  SELECT product_id, min(close) AS lo, max(close) AS hi
  FROM candles GROUP BY product_id
), binned AS (
  SELECT c.product_id, b.lo, b.hi,
         CASE WHEN b.hi > b.lo
              THEN least({VP_BINS - 1},
                         CAST(floor((c.close - b.lo) / (b.hi - b.lo)
                                    * {VP_BINS}) AS INT))
              ELSE 0 END AS bin,
         c.volume
  FROM candles c JOIN bounds b USING (product_id)
), agg AS (
  SELECT product_id, lo, hi, bin,
         CAST(count(*) AS BIGINT) AS n_buckets,
         ROUND(sum(volume), 6) + 0 AS bin_volume
  FROM binned GROUP BY product_id, lo, hi, bin
), poc AS (
  SELECT product_id, max(struct_pack(v := bin_volume, b := bin)) AS m
  FROM agg GROUP BY product_id
)
SELECT a.product_id, a.bin,
       ROUND(a.lo + a.bin * (a.hi - a.lo) / {VP_BINS}, 6) + 0
         AS bin_low,
       a.n_buckets, a.bin_volume,
       (a.bin_volume = p.m.v AND a.bin = p.m.b) AS is_poc
FROM agg a JOIN poc p ON p.product_id = a.product_id
"""


# -------------------------------------------------------------- CSV source

def q_csv_ingest(spark, sf_dir):
    """CSV source round-trip — the one built-in columnar-text source
    the other ingest paths (parquet, JSON wire) don't exercise: ticks
    export to headered CSV (event time as exact epoch-µs longs — CSV
    has no timestamp type worth trusting), re-ingest with an explicit
    schema in FAILFAST mode (schema drift must error, not
    silently null), then the standard candle aggregation. Oracle:
    the round trip must reproduce the batch candle relation exactly.
    """
    import os
    import shutil
    import uuid

    from ..functions.timeutil import epoch_micros

    tmp_root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".tmp")
    csv_dir = os.path.join(tmp_root, f"csv-{uuid.uuid4().hex[:8]}")
    try:
        t = ticks(spark, sf_dir)
        (t.select("product_id",
                  epoch_micros(F.col("time")).alias("time_us"),
                  "price", "volume", "event_id")
         .write.mode("overwrite").option("header", True).csv(csv_dir))
        schema = ("product_id string, time_us long, price double, "
                  "volume double, event_id long")
        back = (spark.read.schema(schema)
                .option("header", True).option("mode", "FAILFAST")
                .csv(csv_dir)
                .select("product_id",
                        F.timestamp_micros(F.col("time_us"))
                        .alias("time"),
                        "price", "volume", "event_id"))
        out = (back.groupBy(
            "product_id",
            F.window("time", "5 minutes")["start"].alias("bucket_start"))
            .agg(F.min_by("price", "time").alias("open"),
                 F.max("price").alias("high"),
                 F.min("price").alias("low"),
                 F.max_by("price", "time").alias("close"),
                 F.count(F.lit(1)).alias("n_ticks"),
                 (F.round(F.sum("volume"), RND) + F.lit(0.0))
                 .alias("volume")))
        # materialize BEFORE the temp CSV is removed — the batch read
        # is lazy, unlike the streaming harness's memory sink
        return (_round(out, ["open", "high", "low", "close"])
                .localCheckpoint(eager=True))
    finally:
        shutil.rmtree(csv_dir, ignore_errors=True)


SQL_CSV_INGEST = SQL_BASE + """
SELECT product_id, bucket_start,
       ROUND(open, 6) + 0 AS open, ROUND(high, 6) + 0 AS high,
       ROUND(low, 6) + 0 AS low, ROUND(close, 6) + 0 AS close,
       n_ticks, ROUND(volume, 6) + 0 AS volume
FROM candles
"""


# ---------------------------------------------------------- hopping windows

HOP_WIN_MIN, HOP_SLIDE_MIN = 30, 10


def q_hopping_volume(spark, sf_dir):
    """Hopping-window (sliding) aggregation via Spark's native
    ``window(ts, '30 minutes', '10 minutes')`` — the overlapping-
    window operator class (each tick expands into exactly
    window/slide = 3 rows via the Expand operator, then one
    aggregation): per (product, window) tick count, order-exact
    high/low, and the 6dp-rounded volume sum. The smoother
    monitoring view a 5-min tumbling candle can't give.

    Oracle: each tick belongs to the 3 slide-aligned windows ending
    after it — generate_series(0,2) reproduces Spark's expansion
    exactly."""
    t = ticks(spark, sf_dir)
    w = F.window("time", f"{HOP_WIN_MIN} minutes",
                 f"{HOP_SLIDE_MIN} minutes")
    return (t.groupBy("product_id", w.alias("w"))
            .agg(F.count(F.lit(1)).alias("n_ticks"),
                 F.max("price").alias("high"),
                 F.min("price").alias("low"),
                 (F.round(F.sum("volume"), RND) + F.lit(0.0))
                 .alias("volume"))
            .select("product_id",
                    F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "n_ticks", "high", "low", "volume"))


SQL_HOPPING_VOLUME = SQL_BASE + f"""
, expanded AS (
  SELECT product_id, price, volume,
         time_bucket(INTERVAL '{HOP_SLIDE_MIN} minutes', time)
           - k.k * INTERVAL '{HOP_SLIDE_MIN} minutes' AS window_start
  FROM ticks,
       unnest(generate_series(0, {HOP_WIN_MIN // HOP_SLIDE_MIN - 1}))
         AS k(k)
)
SELECT product_id, window_start,
       window_start + INTERVAL '{HOP_WIN_MIN} minutes' AS window_end,
       CAST(count(*) AS BIGINT) AS n_ticks,
       max(price) AS high, min(price) AS low,
       ROUND(sum(volume), 6) + 0 AS volume
FROM expanded
GROUP BY product_id, window_start
"""


# --------------------------------------------------------- donchian channel

DONCHIAN_W = 20


def q_donchian_channel(spark, sf_dir):
    """Donchian price channel per product: trailing 20-bucket
    high/low channel + midline, with breakout flags against the
    PREVIOUS bucket's channel (self-exclusive, so a new extreme
    counts as a breakout). max/min are order-independent — the only
    float arithmetic is the midline, a half-sum of identical doubles
    rounded 6dp. One window family, single shuffle."""
    c = candles(spark, sf_dir)
    w1 = Window.partitionBy("product_id").orderBy("bucket_start")
    w20 = w1.rowsBetween(-(DONCHIAN_W - 1), 0)
    cnt = F.count(F.lit(1)).over(w20)
    ch_high = F.when(cnt >= DONCHIAN_W, F.max("high").over(w20))
    ch_low = F.when(cnt >= DONCHIAN_W, F.min("low").over(w20))
    base = (c.select("product_id", "bucket_start", "high", "low",
                     "close")
            .withColumn("ch_high", ch_high)
            .withColumn("ch_low", ch_low)
            .drop("high", "low"))
    prev_hi = F.lag("ch_high").over(w1)
    prev_lo = F.lag("ch_low").over(w1)
    return (base
            .withColumn("ch_mid",
                        F.round((F.col("ch_high") + F.col("ch_low"))
                                / 2.0, RND) + F.lit(0.0))
            .withColumn("breakout_up",
                        F.when(prev_hi.isNotNull(),
                               F.col("close") > prev_hi))
            .withColumn("breakout_down",
                        F.when(prev_lo.isNotNull(),
                               F.col("close") < prev_lo)))


SQL_DONCHIAN = SQL_BASE + f"""
, ch AS (
  SELECT product_id, bucket_start, close,
         CASE WHEN count(*) OVER w20 >= {DONCHIAN_W}
              THEN max(high) OVER w20 END AS ch_high,
         CASE WHEN count(*) OVER w20 >= {DONCHIAN_W}
              THEN min(low) OVER w20 END AS ch_low
  FROM candles
  WINDOW w20 AS (PARTITION BY product_id ORDER BY bucket_start
                 ROWS BETWEEN {DONCHIAN_W - 1} PRECEDING
                 AND CURRENT ROW)
)
SELECT product_id, bucket_start, close, ch_high, ch_low,
       ROUND((ch_high + ch_low) / 2.0, 6) + 0 AS ch_mid,
       CASE WHEN lag(ch_high) OVER w1 IS NOT NULL
            THEN close > lag(ch_high) OVER w1 END AS breakout_up,
       CASE WHEN lag(ch_low) OVER w1 IS NOT NULL
            THEN close < lag(ch_low) OVER w1 END AS breakout_down
FROM ch
WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
"""


# ---------------------------------------------------------- return moments

def q_return_moments(spark, sf_dir):
    """Higher-moment distribution profile of log returns per product:
    mean, std, skewness, excess kurtosis, plus min/max — the fat-tail
    diagnostic behind risk sizing and the reference's scaler choices
    (RobustScaler exists because these skews/kurtoses are large).

    All four moments derive algebraically from raw power sums
    Σr..Σr⁴ computed as bucket-ordered folds over 6dp-snapped
    returns — identical doubles in, identical expression tree, so
    even kurtosis value-hashes (a groupBy SUM of r⁴ would not)."""
    df = I.with_log_returns(candles(spark, sf_dir), key="product_id",
                            ts="bucket_start")
    r6 = F.round(F.col("log_returns"), RND) + F.lit(0.0)
    cell = (df.filter(F.col("log_returns").isNotNull())
            .select("product_id", "bucket_start", r6.alias("r")))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_start", "r"))),
        lambda s: s.getField("r"))

    def psum(p: int):
        if p == 1:
            return F.aggregate(ordered, F.lit(0.0), lambda a, x: a + x)
        if p == 2:
            return F.aggregate(ordered, F.lit(0.0),
                               lambda a, x: a + x * x)
        if p == 3:
            return F.aggregate(ordered, F.lit(0.0),
                               lambda a, x: a + x * x * x)
        return F.aggregate(ordered, F.lit(0.0),
                           lambda a, x: a + x * x * x * x)

    agg = (cell.groupBy("product_id")
           .agg(F.count(F.lit(1)).alias("n_obs"),
                psum(1).alias("s1"), psum(2).alias("s2"),
                psum(3).alias("s3"), psum(4).alias("s4"),
                F.min("r").alias("r_min"), F.max("r").alias("r_max")))
    n = F.col("n_obs").cast("double")
    mean = F.col("s1") / n
    m2 = F.greatest(F.col("s2") / n - mean * mean, F.lit(0.0))
    m3 = (F.col("s3") / n - 3 * mean * (F.col("s2") / n)
          + 2 * mean * mean * mean)
    m4 = (F.col("s4") / n - 4 * mean * (F.col("s3") / n)
          + 6 * mean * mean * (F.col("s2") / n)
          - 3 * mean * mean * mean * mean)
    std = F.sqrt(m2)
    return agg.select(
        "product_id", "n_obs",
        (F.round(mean, RND) + F.lit(0.0)).alias("mean_return"),
        (F.round(std, RND) + F.lit(0.0)).alias("std_return"),
        F.when(m2 > 0, F.round(m3 / (std * std * std), RND) + F.lit(0.0))
        .alias("skewness"),
        F.when(m2 > 0, F.round(m4 / (m2 * m2) - 3.0, RND) + F.lit(0.0))
        .alias("excess_kurtosis"),
        F.col("r_min").alias("min_return"),
        F.col("r_max").alias("max_return"))


SQL_RETURN_MOMENTS = SQL_BASE + """
, lr AS (
  SELECT product_id, bucket_start,
         ROUND(CASE WHEN close > 0
                    AND lag(close) OVER (PARTITION BY product_id
                                         ORDER BY bucket_start) > 0
               THEN ln(close / lag(close) OVER (
                   PARTITION BY product_id ORDER BY bucket_start)) END,
               6) + 0 AS r
  FROM candles
), sums AS (
  SELECT product_id, count(*) AS n_obs,
         list_sum(list(r ORDER BY bucket_start)) AS s1,
         list_sum(list(r * r ORDER BY bucket_start)) AS s2,
         list_sum(list(r * r * r ORDER BY bucket_start)) AS s3,
         list_sum(list(r * r * r * r ORDER BY bucket_start)) AS s4,
         min(r) AS r_min, max(r) AS r_max
  FROM lr WHERE r IS NOT NULL GROUP BY product_id
), m AS (
  SELECT product_id, n_obs, s1 / n_obs AS mean,
         greatest(s2 / n_obs - (s1 / n_obs) * (s1 / n_obs), 0.0) AS m2,
         s3 / n_obs - 3 * (s1 / n_obs) * (s2 / n_obs)
           + 2 * (s1 / n_obs) * (s1 / n_obs) * (s1 / n_obs) AS m3,
         s4 / n_obs - 4 * (s1 / n_obs) * (s3 / n_obs)
           + 6 * (s1 / n_obs) * (s1 / n_obs) * (s2 / n_obs)
           - 3 * (s1 / n_obs) * (s1 / n_obs) * (s1 / n_obs)
               * (s1 / n_obs) AS m4,
         r_min, r_max
  FROM sums
)
SELECT product_id, n_obs,
       ROUND(mean, 6) + 0 AS mean_return,
       ROUND(sqrt(m2), 6) + 0 AS std_return,
       CASE WHEN m2 > 0
            THEN ROUND(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 6) + 0
       END AS skewness,
       CASE WHEN m2 > 0 THEN ROUND(m4 / (m2 * m2) - 3.0, 6) + 0
       END AS excess_kurtosis,
       r_min AS min_return, r_max AS max_return
FROM m
"""


# ------------------------------------------------------ drawdown durations

def q_drawdown_durations(spark, sf_dir):
    """Underwater-episode profile per product: number of drawdown
    episodes (consecutive runs below the running peak), total
    underwater buckets, and the LONGEST episode with its time span —
    the duration companion to max_drawdown's depth.

    Gaps-and-islands in one window family: running peak (cummax) →
    underwater flag → episode id as a running count of peak rows →
    per-episode integer aggregates → deterministic longest pick
    (rows DESC, start ASC). All-integer outputs, hash-exact."""
    c = candles(spark, sf_dir)
    w = Window.partitionBy("product_id").orderBy("bucket_start")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max("close").over(wcum)
    flagged = c.select(
        "product_id", "bucket_start", "close",
        (F.col("close") < peak).alias("_under"))
    grp = F.sum(F.when(F.col("_under"), 0).otherwise(1)).over(wcum)
    eps = (flagged.withColumn("_grp", grp)
           .filter(F.col("_under"))
           .groupBy("product_id", "_grp")
           .agg(F.count(F.lit(1)).alias("ep_rows"),
                F.min("bucket_start").alias("ep_start"),
                F.max("bucket_start").alias("ep_end")))
    wpick = Window.partitionBy("product_id").orderBy(
        F.col("ep_rows").desc(), F.col("ep_start"))
    longest = (eps.withColumn("_rk", F.row_number().over(wpick))
               .filter(F.col("_rk") == 1)
               .select("product_id",
                       F.col("ep_rows").alias("longest_episode_rows"),
                       F.col("ep_start").alias("longest_episode_start"),
                       F.col("ep_end").alias("longest_episode_end")))
    totals = (eps.groupBy("product_id")
              .agg(F.count(F.lit(1)).alias("n_episodes"),
                   F.sum("ep_rows").alias("underwater_rows")))
    return (totals.join(longest, "product_id")
            .select("product_id", "n_episodes",
                    F.col("underwater_rows").cast("long")
                    .alias("underwater_rows"),
                    F.col("longest_episode_rows").cast("long")
                    .alias("longest_episode_rows"),
                    "longest_episode_start", "longest_episode_end"))


SQL_DRAWDOWN_DURATIONS = SQL_BASE + """
, under_flag AS (
  SELECT product_id, bucket_start, close,
         close < max(close) OVER (PARTITION BY product_id
                                  ORDER BY bucket_start
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS under
  FROM candles
), flagged AS (
  SELECT product_id, bucket_start, close, under,
         sum(CASE WHEN under THEN 0 ELSE 1 END)
           OVER (PARTITION BY product_id ORDER BY bucket_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS grp
  FROM under_flag
), eps AS (
  SELECT product_id, grp, CAST(count(*) AS BIGINT) AS ep_rows,
         min(bucket_start) AS ep_start, max(bucket_start) AS ep_end
  FROM flagged WHERE under GROUP BY product_id, grp
), longest AS (
  SELECT product_id, ep_rows AS longest_episode_rows,
         ep_start AS longest_episode_start,
         ep_end AS longest_episode_end,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY ep_rows DESC, ep_start) AS rk
  FROM eps
), totals AS (
  SELECT product_id, count(*) AS n_episodes,
         CAST(sum(ep_rows) AS BIGINT) AS underwater_rows
  FROM eps GROUP BY product_id
)
SELECT t.product_id, t.n_episodes, t.underwater_rows,
       l.longest_episode_rows, l.longest_episode_start,
       l.longest_episode_end
FROM totals t JOIN longest l ON l.product_id = t.product_id
WHERE l.rk = 1
"""


# ------------------------------------------------------- quantile transform

def q_quantile_transform(spark, sf_dir):
    """Quantile (rank) normalization of close per product:
    u = rank/(n+1) in (0,1) — the distribution-free feature transform
    (the empirical-CDF alternative to robust_scale when outliers make
    even IQR scaling unstable). RANK (not row_number) so equal prices
    map to equal u on both engines; u is a ratio of engine-identical
    integers, unrounded."""
    c = candles(spark, sf_dir)
    w = Window.partitionBy("product_id").orderBy("close")
    n = Window.partitionBy("product_id")
    return (c.select("product_id", "bucket_start", "close")
            .withColumn("u", F.rank().over(w).cast("double")
                        / (F.count(F.lit(1)).over(n) + 1)))


SQL_QUANTILE_TRANSFORM = SQL_BASE + """
SELECT product_id, bucket_start, close,
       CAST(rank() OVER (PARTITION BY product_id ORDER BY close)
            AS DOUBLE)
         / (count(*) OVER (PARTITION BY product_id) + 1) AS u
FROM candles
"""


# -------------------------------------------------------- trend decomposition

TREND_HALF = 12  # centered MA half-width → 25-row trend window
TREND_W = 2 * TREND_HALF + 1


def q_trend_decompose(spark, sf_dir):
    """STL-lite additive decomposition per product:
    close = trend + seasonal + resid, with trend a CENTERED 25-row
    moving average (full windows only — NULL edges dropped), seasonal
    the per-(product, hour-of-day) mean of the detrended series, and
    resid the remainder — the classical-decomposition diagnostic
    behind 'does this series have intraday structure worth a model'.

    Floats: the trend average folds the window's collect_list in
    frame order (both engines list ascending bucket_start → identical
    doubles; a window avg() would sum in engine-specific accumulator
    order), the seasonal mean folds 6dp-snapped detrended terms in
    bucket order — the seasonality_profile midpoint lesson applied.
    Plan: one per-key window pass + one (product, hour) aggregate
    joined back broadcast (keys × 24 rows)."""
    c = candles(spark, sf_dir)
    w = (Window.partitionBy("product_id").orderBy("bucket_start")
         .rowsBetween(-TREND_HALF, TREND_HALF))
    arr = F.collect_list("close").over(w)
    s = F.aggregate(F.col("_arr"), F.lit(0.0), lambda a, x: a + x)
    trend = F.round(s / TREND_W, RND) + F.lit(0.0)
    base = (c.select("product_id", "bucket_start", "close",
                     arr.alias("_arr"))
            .filter(F.size("_arr") == TREND_W)
            .select("product_id", "bucket_start", "close",
                    trend.alias("trend")))
    d = base.select(
        "*", (F.round(F.col("close") - F.col("trend"), RND) + F.lit(0.0))
        .alias("_detr"), F.hour("bucket_start").alias("_hh"))
    ordered_detr = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_start", "_detr"))),
        lambda x: x.getField("_detr"))
    s2 = F.aggregate(ordered_detr, F.lit(0.0), lambda a, x: a + x)
    seas = (d.groupBy("product_id", "_hh")
            .agg((F.round(s2 / F.count(F.lit(1)), RND) + F.lit(0.0))
                 .alias("seasonal")))
    return (d.join(F.broadcast(seas), ["product_id", "_hh"])
            .select("product_id", "bucket_start", "close", "trend",
                    "seasonal",
                    (F.round(F.col("_detr") - F.col("seasonal"), RND)
                     + F.lit(0.0)).alias("resid")))


SQL_TREND_DECOMPOSE = SQL_BASE + f"""
, arrd AS (
  SELECT product_id, bucket_start, close,
         list(close) OVER (PARTITION BY product_id ORDER BY bucket_start
                           ROWS BETWEEN {TREND_HALF} PRECEDING
                           AND {TREND_HALF} FOLLOWING) AS arr
  FROM candles
), t AS (
  SELECT product_id, bucket_start, close,
         ROUND(list_sum(arr) / {TREND_W}, 6) + 0 AS trend
  FROM arrd WHERE len(arr) = {TREND_W}
), d AS (
  SELECT product_id, bucket_start, close, trend,
         ROUND(close - trend, 6) + 0 AS detr,
         hour(bucket_start) AS hh
  FROM t
), seas AS (
  SELECT product_id, hh,
         ROUND(list_sum(list(detr ORDER BY bucket_start)) / count(*), 6)
           + 0 AS seasonal
  FROM d GROUP BY product_id, hh
)
SELECT d.product_id, d.bucket_start, d.close, d.trend, s.seasonal,
       ROUND(d.detr - s.seasonal, 6) + 0 AS resid
FROM d JOIN seas s ON s.product_id = d.product_id AND s.hh = d.hh
"""


# ------------------------------------------------------------ autocorrelation

ACF_LAGS = [1, 2, 3, 6, 12]


def q_acf(spark, sf_dir):
    """Per-product autocorrelation of log returns at row lags 1/2/3/
    6/12 — the model-selection diagnostic a forecasting service runs
    before choosing seq_len (the reference trains seq_len=288
    windows; ACF is how that gets justified).

    Plan: ONE per-key window pass computes every lag column (same
    window family → single Exchange), an inline stack unpivots to
    (product, lag) pairs, and corr() partial-aggregates per group.
    corr over unrounded engine-identical returns, 6dp-rounded at the
    boundary — the returns_correlation contract."""
    df = I.with_log_returns(candles(spark, sf_dir), key="product_id",
                            ts="bucket_start")
    w = Window.partitionBy("product_id").orderBy("bucket_start")
    lagged = df.select(
        "product_id", F.col("log_returns").alias("r"),
        *[F.lag("log_returns", L).over(w).alias(f"_l{L}")
          for L in ACF_LAGS])
    stack_args = ", ".join(f"{L}, _l{L}" for L in ACF_LAGS)
    un = lagged.select(
        "product_id", "r",
        F.expr(f"stack({len(ACF_LAGS)}, {stack_args}) AS (lag_k, r_lag)"))
    return (un.filter(F.col("r").isNotNull() & F.col("r_lag").isNotNull())
            .groupBy("product_id", "lag_k")
            .agg((F.round(F.corr("r", "r_lag"), RND) + F.lit(0.0))
                 .alias("acf"),
                 F.count(F.lit(1)).alias("n_obs")))


def _sql_acf() -> str:
    lag_cols = ",\n         ".join(
        f"lag(r, {L}) OVER (PARTITION BY product_id ORDER BY bucket_start)"
        f" AS r_{L}" for L in ACF_LAGS)
    union = "\nUNION ALL\n".join(
        f"SELECT product_id, {L} AS lag_k, r, r_{L} AS r_lag FROM lagged"
        for L in ACF_LAGS)
    return SQL_BASE + f"""
, lr AS (
  SELECT product_id, bucket_start,
         CASE WHEN close > 0
              AND lag(close) OVER (PARTITION BY product_id
                                   ORDER BY bucket_start) > 0
         THEN ln(close / lag(close) OVER (PARTITION BY product_id
                                          ORDER BY bucket_start)) END
           AS r
  FROM candles
), lagged AS (
  SELECT product_id, bucket_start, r,
         {lag_cols}
  FROM lr
), un AS (
{union}
)
SELECT product_id, lag_k, ROUND(corr(r, r_lag), 6) + 0 AS acf,
       count(*) AS n_obs
FROM un WHERE r IS NOT NULL AND r_lag IS NOT NULL
GROUP BY product_id, lag_k
"""


SQL_ACF = _sql_acf()


# ------------------------------------------------------------- seasonality

def q_seasonality_profile(spark, sf_dir):
    """Hour-of-day seasonality profile per product: bucket count,
    mean/σ of log returns and the positive-return share for each
    (product, hour) cell — the intraday-pattern table behind
    time_features' is_market_open flag.

    Floats: returns snap to the 6dp grid, then mean/σ come from
    EXPLICIT moment sums (Σr, Σr²) folded in bucket order — a
    partition-order avg()/stddev() differs across engines in the low
    bits, which flips the final rounding exactly when a cell mean
    lands on a 6dp midpoint (seen at sf0.001: a 10-row cell whose
    mean is ...485). Identical fold order → identical doubles →
    identical rounding. pos_share is a ratio of engine-identical
    integers, left unrounded. One partial-aggregating shuffle."""
    df = I.with_log_returns(candles(spark, sf_dir), key="product_id",
                            ts="bucket_start")
    r6 = F.round(F.col("log_returns"), RND) + F.lit(0.0)
    cell = (df.filter(F.col("log_returns").isNotNull())
            .select("product_id",
                    F.hour("bucket_start").alias("hour_of_day"),
                    F.col("bucket_start"), r6.alias("r")))
    ordered_r = F.transform(
        F.array_sort(F.collect_list(F.struct("bucket_start", "r"))),
        lambda s: s.getField("r"))
    s1 = F.aggregate(ordered_r, F.lit(0.0), lambda a, x: a + x)
    s2 = F.aggregate(ordered_r, F.lit(0.0), lambda a, x: a + x * x)
    n = F.count(F.lit(1)).cast("double")
    var = F.greatest((s2 - s1 * s1 / n) / (n - 1), F.lit(0.0))
    return (cell.groupBy("product_id", "hour_of_day")
            .agg(F.count(F.lit(1)).alias("n_obs"),
                 (F.round(s1 / n, RND) + F.lit(0.0))
                 .alias("mean_return"),
                 F.when(F.count(F.lit(1)) > 1,
                        F.round(F.sqrt(var), RND) + F.lit(0.0))
                 .alias("vol_return"),
                 (F.sum(F.when(F.col("r") > 0, 1).otherwise(0))
                  .cast("double") / F.count(F.lit(1)))
                 .alias("pos_share")))


SQL_SEASONALITY = SQL_BASE + """
, lr AS (
  SELECT product_id, bucket_start,
         ROUND(CASE WHEN close > 0
                    AND lag(close) OVER (PARTITION BY product_id
                                         ORDER BY bucket_start) > 0
               THEN ln(close / lag(close) OVER (
                   PARTITION BY product_id ORDER BY bucket_start)) END,
               6) + 0 AS r
  FROM candles
)
, cells AS (
  SELECT product_id, hour(bucket_start) AS hour_of_day,
         count(*) AS n_obs,
         list_sum(list(r ORDER BY bucket_start)) AS s1,
         list_sum(list(r * r ORDER BY bucket_start)) AS s2,
         CAST(sum(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS DOUBLE)
           / count(*) AS pos_share
  FROM lr WHERE r IS NOT NULL
  GROUP BY product_id, hour(bucket_start)
)
SELECT product_id, hour_of_day, n_obs,
       ROUND(s1 / n_obs, 6) + 0 AS mean_return,
       CASE WHEN n_obs > 1
            THEN ROUND(sqrt(greatest((s2 - s1 * s1 / n_obs)
                                     / (n_obs - 1), 0.0)), 6) + 0
       END AS vol_return,
       pos_share
FROM cells
"""


SPARK_QUERIES_TS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "candle_parse": q_candle_parse,
    "clean_series": q_clean_series,
    "macd_approx": q_macd_approx,
    "top_k": q_top_k,
    "dedup_exact": q_dedup_exact,
    "candle_rollup": q_candle_rollup,
    "candle_upsert": q_candle_upsert,
    "prediction_horizon_eval": q_prediction_horizon_eval,
    "scale_fit_transform": q_scale_fit_transform,
    "grouped_scale": q_grouped_scale,
    "grouped_scale_full": q_grouped_scale_full,
    "returns_correlation": q_returns_correlation,
    "candle_gaps": q_candle_gaps,
    "retention_cohorts": q_retention_cohorts,
    "vwap": q_vwap,
    "bollinger": q_bollinger,
    "stochastic": q_stochastic,
    "max_drawdown": q_max_drawdown,
    "rolling_correlation": q_rolling_correlation,
    "rolling_beta": q_rolling_beta,
    "candle_patterns": q_candle_patterns,
    "candle_grid_fill": q_candle_grid_fill,
    "cross_sectional_rank": q_cross_sectional_rank,
    "acf": q_acf,
    "seasonality_profile": q_seasonality_profile,
    "trend_decompose": q_trend_decompose,
    "return_moments": q_return_moments,
    "drawdown_durations": q_drawdown_durations,
    "quantile_transform": q_quantile_transform,
    "donchian_channel": q_donchian_channel,
    "hopping_volume": q_hopping_volume,
    "csv_ingest": q_csv_ingest,
    "volume_profile": q_volume_profile,
    "keltner_channel": q_keltner_channel,
    "pivot_points": q_pivot_points,
    "mfi": q_mfi,
}

ORACLE_SQL_TS: dict[str, str] = {
    "candle_parse": SQL_CANDLE_PARSE,
    "clean_series": SQL_CLEAN_SERIES,
    "macd_approx": _sql_macd_approx(),
    "top_k": SQL_TOP_K,
    "dedup_exact": SQL_DEDUP_EXACT_EVENTS,
    "candle_rollup": SQL_CANDLE_ROLLUP,
    "candle_upsert": SQL_CANDLE_UPSERT,
    "prediction_horizon_eval": SQL_PREDICTION_HORIZON_EVAL,
    "scale_fit_transform": SQL_SCALE_FIT_TRANSFORM,
    "grouped_scale": SQL_GROUPED_SCALE,
    "grouped_scale_full": SQL_GROUPED_SCALE_FULL,
    "returns_correlation": SQL_RETURNS_CORRELATION,
    "candle_gaps": SQL_CANDLE_GAPS,
    "retention_cohorts": SQL_RETENTION_COHORTS,
    "vwap": SQL_VWAP,
    "bollinger": SQL_BOLLINGER,
    "stochastic": SQL_STOCHASTIC,
    "max_drawdown": SQL_MAX_DRAWDOWN,
    "rolling_correlation": SQL_ROLLING_CORRELATION,
    "rolling_beta": SQL_ROLLING_BETA,
    "candle_patterns": SQL_CANDLE_PATTERNS,
    "candle_grid_fill": SQL_CANDLE_GRID_FILL,
    "cross_sectional_rank": SQL_CROSS_SECTIONAL_RANK,
    "acf": SQL_ACF,
    "seasonality_profile": SQL_SEASONALITY,
    "trend_decompose": SQL_TREND_DECOMPOSE,
    "return_moments": SQL_RETURN_MOMENTS,
    "drawdown_durations": SQL_DRAWDOWN_DURATIONS,
    "quantile_transform": SQL_QUANTILE_TRANSFORM,
    "donchian_channel": SQL_DONCHIAN,
    "hopping_volume": SQL_HOPPING_VOLUME,
    "csv_ingest": SQL_CSV_INGEST,
    "volume_profile": SQL_VOLUME_PROFILE,
    "keltner_channel": SQL_KELTNER,
    "pivot_points": SQL_PIVOT_POINTS,
    "mfi": SQL_MFI,
}