"""Query catalog: every capability from SURVEY.md §2 as a
(spark_builder, oracle_sql) pair.

The driver (and tests/test_oracle_parity.py) run each Spark query and
its ANSI-SQL twin on DuckDB over the same parquet and compare
row-count + schema + order-insensitive value hash. Float columns that
are *derived* (window math, divisions, libm calls) are rounded to 6
decimals on BOTH sides so engine-level ulp differences can't break the
hash; pass-through columns are emitted raw.

Data model mapping (SURVEY.md §3): the `events` table plays the tick
stream — event_type→product_id, ts→time, value→price, and the JSON
`props.k` field→volume (also exercising the reference's from_json
ticker parse, kafka_spark_processor/spark_processor.py:146-155).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import candles as C
from ..operators import indicators as I
from ..sources.tables import load_table

RND = 6  # shared float rounding for hash-stable comparison

# --------------------------------------------------------------------- bases

def ticks(spark: SparkSession, sf_dir: str, *,
          spread: bool = False) -> DataFrame:
    """events → tick stream (typed parse incl. JSON field extraction).

    `ts_nanos` (the raw scan column, when the parquet stores nanos) is
    carried along so time-range queries can push range predicates into
    the scan; column pruning drops it everywhere it goes unused.

    `spread=True` round-robins the raw scan to cluster parallelism
    BEFORE the parse projection (spread_scan: a no-op on
    well-partitioned production input) so the JSON parse doesn't
    serialize onto a single-row-group scan task. Keep the default for
    time-range readers: a repartition above the scan would block
    predicate pushdown into parquet row-group stats.
    """
    ev = load_table(spark, sf_dir, "events")
    if spread:
        from ..operators.spread import spread_scan

        ev = spread_scan(ev)
    cols = [
        F.col("event_type").alias("product_id"),
        F.col("ts").alias("time"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("double").alias("volume"),
        F.col("event_id"),
    ]
    if "ts_nanos" in ev.columns:
        cols.append(F.col("ts_nanos"))
    return ev.select(*cols)


def candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute OHLCV candles from the tick stream. The tick parse
    runs spread (partial aggregation parallelizes with it); no
    pushdown is lost because the candle build reads every tick."""
    return C.candle_resample(ticks(spark, sf_dir, spread=True),
                             volume="volume")


# Shared oracle CTE prefix mirroring the two builders above.
SQL_BASE = """
WITH ticks AS (
  SELECT event_type AS product_id,
         ts AS time,
         value AS price,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume,
         event_id
  FROM events
),
candles AS (
  SELECT product_id,
         time_bucket(INTERVAL '5 minutes', time) AS bucket_start,
         arg_min(price, time) AS open,
         max(price) AS high,
         min(price) AS low,
         arg_max(price, time) AS close,
         count(*) AS n_ticks,
         sum(volume) AS volume
  FROM ticks
  GROUP BY 1, 2
)
"""

# feature-window SQL fragment: candles + per-key ordered window
SQL_W = ("WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)")


def _round(df: DataFrame, cols: list[str]) -> DataFrame:
    for c in cols:
        # + 0.0 collapses IEEE -0.0 to +0.0 so both engines agree
        df = df.withColumn(c, F.round(F.col(c), RND) + F.lit(0.0))
    return df


# ------------------------------------------------------------------ queries
# Each builder: (spark, sf_dir) -> DataFrame. Keep column names aligned
# with the oracle SQL (driver sorts columns by name before hashing).

def q_ticker_parse(spark, sf_dir):
    """Typed ticker parse + channel filter (spark_processor.py:146-155)."""
    t = ticks(spark, sf_dir).filter(F.col("product_id") == "view")
    return t.select("product_id", "time", "price", "volume", "event_id")


SQL_TICKER_PARSE = SQL_BASE + """
SELECT product_id, time, price, volume, event_id
FROM ticks WHERE product_id = 'view'
"""


def q_candle_resample(spark, sf_dir):
    df = candles(spark, sf_dir)
    return _round(df, ["open", "high", "low", "close", "volume"])


SQL_CANDLE_RESAMPLE = SQL_BASE + """
SELECT product_id, bucket_start,
       ROUND(open, 6) + 0 AS open, ROUND(high, 6) + 0 AS high,
       ROUND(low, 6) + 0 AS low, ROUND(close, 6) + 0 AS close,
       n_ticks, ROUND(volume, 6) + 0 AS volume
FROM candles
"""


def q_latest_n(spark, sf_dir):
    """Latest 100 ticks per product (data_fetcher.py:38-44)."""
    t = ticks(spark, sf_dir)
    out = C.latest_n_per_key(t, 100, key="product_id", ts="time",
                             tiebreak="event_id")
    return out.select("product_id", "time", "price", "event_id")


SQL_LATEST_N = SQL_BASE + """
SELECT product_id, time, price, event_id FROM (
  SELECT product_id, time, price, event_id,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY time DESC, event_id DESC) AS rn
  FROM ticks
) WHERE rn <= 100
"""


def q_available_products(spark, sf_dir):
    return C.available_products(ticks(spark, sf_dir))


SQL_AVAILABLE_PRODUCTS = SQL_BASE + "SELECT DISTINCT product_id FROM ticks"


def q_data_availability(spark, sf_dir):
    return C.data_availability(ticks(spark, sf_dir))


SQL_DATA_AVAILABILITY = SQL_BASE + """
SELECT product_id, min(time) AS earliest, max(time) AS latest,
       count(*) AS row_count
FROM ticks GROUP BY product_id
"""


def q_time_range_fetch(spark, sf_dir):
    """Key + time-range scan with parquet pushdown (data_fetcher.py:31-36).

    The range is applied BOTH on the semantic `time` column and (when
    the raw nanos scan column exists) on `ts_nanos`, so the predicate
    reaches the parquet row-group stats — only matching row groups are
    read (verified in tests/test_plans.py).
    """
    from datetime import datetime, timezone

    start, end = "2024-01-05 00:00:00", "2024-01-12 00:00:00"
    t = ticks(spark, sf_dir)
    if "ts_nanos" in t.columns:
        def nanos(s: str) -> int:
            dt = datetime.fromisoformat(s).replace(tzinfo=timezone.utc)
            return int(dt.timestamp()) * 1_000_000_000
        t = t.filter(F.col("ts_nanos").between(nanos(start), nanos(end)))
    out = C.time_range_fetch(
        t, key="product_id", ts="time", key_value="click",
        start=start, end=end)
    return out.select("product_id", "time", "price", "event_id")


SQL_TIME_RANGE_FETCH = SQL_BASE + """
SELECT product_id, time, price, event_id FROM ticks
WHERE product_id = 'click'
  AND time >= TIMESTAMP '2024-01-05 00:00:00'
  AND time <= TIMESTAMP '2024-01-12 00:00:00'
"""


def q_log_returns(spark, sf_dir):
    df = I.with_log_returns(candles(spark, sf_dir), key="product_id",
                            ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "log_returns"),
                  ["log_returns"])


SQL_LOG_RETURNS = SQL_BASE + f"""
SELECT product_id, bucket_start,
       ROUND(CASE WHEN close > 0 AND lag(close) OVER w1 > 0
             THEN ln(close / lag(close) OVER w1) END, 6) + 0
         AS log_returns
FROM candles {SQL_W}
"""


def q_price_features(spark, sf_dir):
    # snap-then-divide (see q_vwap): the windowed mean is 6dp-rounded
    # before the ratio so both engines divide identical doubles, and
    # the quotients are NOT re-rounded (midpoint-rule divergence).
    # price_spread is raw per-row arithmetic on identical parquet
    # doubles — deterministic without any rounding. The operator
    # itself (with_price_features) keeps full precision; the snap is
    # only this catalog/oracle comparison view.
    c = candles(spark, sf_dir)
    w24 = (Window.partitionBy("product_id").orderBy("bucket_start")
           .rowsBetween(-23, 0))
    ma = F.round(F.avg("close").over(w24), RND)
    return c.select(
        "product_id", "bucket_start",
        (F.col("close") / ma).alias("price_ma_ratio"),
        ((F.col("high") - F.col("low")) / F.col("close"))
        .alias("price_spread"))


SQL_PRICE_FEATURES = SQL_BASE + """
SELECT product_id, bucket_start,
       close / ROUND(avg(close) OVER w24, 6) AS price_ma_ratio,
       (high - low) / close AS price_spread
FROM candles
WINDOW w24 AS (PARTITION BY product_id ORDER BY bucket_start
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
"""


def q_volume_features(spark, sf_dir):
    df = I.with_volume_features(candles(spark, sf_dir), key="product_id",
                                ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "volume_zscore",
                            "volume_ma_ratio", "liquidity"),
                  ["volume_zscore", "volume_ma_ratio", "liquidity"])


SQL_VOLUME_FEATURES = SQL_BASE + """
SELECT product_id, bucket_start,
       ROUND(CASE WHEN count(volume) OVER w24 >= 24 THEN
         (volume - avg(volume) OVER w24) / stddev_samp(volume) OVER w24
       END, 6) + 0 AS volume_zscore,
       ROUND(volume / avg(volume) OVER w24, 6) + 0 AS volume_ma_ratio,
       ROUND(ln(1 + volume * close), 6) + 0 AS liquidity
FROM candles
WINDOW w24 AS (PARTITION BY product_id ORDER BY bucket_start
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
"""


def q_rsi(spark, sf_dir):
    df = I.with_rsi(candles(spark, sf_dir), key="product_id",
                    ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "rsi"), ["rsi"])


SQL_RSI = SQL_BASE + """
, deltas AS (
  SELECT product_id, bucket_start,
         close - lag(close) OVER w1 AS delta
  FROM candles
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
), gl AS (
  SELECT product_id, bucket_start,
         CASE WHEN delta > 0 THEN delta
              WHEN delta IS NOT NULL THEN 0.0 END AS gain,
         CASE WHEN delta < 0 THEN -delta
              WHEN delta IS NOT NULL THEN 0.0 END AS loss
  FROM deltas
)
SELECT product_id, bucket_start,
       ROUND(CASE WHEN count(gain) OVER w14 >= 14 THEN
         CASE WHEN avg(loss) OVER w14 = 0 THEN 100.0
              ELSE 100.0 - 100.0 / (1.0 + (avg(gain) OVER w14)
                                          / (avg(loss) OVER w14))
         END END, 6) + 0 AS rsi
FROM gl
WINDOW w14 AS (PARTITION BY product_id ORDER BY bucket_start
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""


def q_atr(spark, sf_dir):
    df = I.with_atr(candles(spark, sf_dir), key="product_id",
                    ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "atr"), ["atr"])


SQL_ATR = SQL_BASE + """
, tr AS (
  SELECT product_id, bucket_start,
         greatest(high - low,
                  abs(high - lag(close) OVER w1),
                  abs(low  - lag(close) OVER w1)) AS tr
  FROM candles
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
)
SELECT product_id, bucket_start,
       ROUND(CASE WHEN count(tr) OVER w14 >= 14
             THEN avg(tr) OVER w14 END, 6) + 0 AS atr
FROM tr
WINDOW w14 AS (PARTITION BY product_id ORDER BY bucket_start
               ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
"""


def q_obv(spark, sf_dir):
    df = I.with_obv(candles(spark, sf_dir), key="product_id",
                    ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "obv"), ["obv"])


SQL_OBV = SQL_BASE + """
, sv AS (
  SELECT product_id, bucket_start,
         CASE WHEN close - lag(close) OVER w1 > 0 THEN volume
              WHEN close - lag(close) OVER w1 < 0 THEN -volume
              ELSE 0.0 END AS signed_volume
  FROM candles
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
)
SELECT product_id, bucket_start,
       ROUND(sum(signed_volume) OVER (PARTITION BY product_id
             ORDER BY bucket_start
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) + 0 AS obv
FROM sv
"""


def q_volatility(spark, sf_dir):
    df = I.with_log_returns(candles(spark, sf_dir), key="product_id",
                            ts="bucket_start")
    df = I.with_volatility(df, key="product_id", ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "volatility_6",
                            "volatility_12", "volatility_24"),
                  ["volatility_6", "volatility_12", "volatility_24"])


SQL_VOLATILITY = SQL_BASE + """
, lr AS (
  SELECT product_id, bucket_start,
         CASE WHEN close > 0 AND lag(close) OVER w1 > 0
         THEN ln(close / lag(close) OVER w1) END AS log_returns
  FROM candles
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
)
SELECT product_id, bucket_start,
       ROUND(CASE WHEN count(log_returns) OVER w6 >= 6
             THEN stddev_samp(log_returns) OVER w6 END, 6) + 0 AS volatility_6,
       ROUND(CASE WHEN count(log_returns) OVER w12 >= 12
             THEN stddev_samp(log_returns) OVER w12 END, 6) + 0 AS volatility_12,
       ROUND(CASE WHEN count(log_returns) OVER w24 >= 24
             THEN stddev_samp(log_returns) OVER w24 END, 6) + 0 AS volatility_24
FROM lr
WINDOW w6 AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
       w12 AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN 11 PRECEDING AND CURRENT ROW),
       w24 AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
"""


def q_momentum(spark, sf_dir):
    df = I.with_momentum(candles(spark, sf_dir), key="product_id",
                         ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "momentum_3_6",
                            "momentum_6_12"),
                  ["momentum_3_6", "momentum_6_12"])


SQL_MOMENTUM = SQL_BASE + """
SELECT product_id, bucket_start,
       ROUND((CASE WHEN count(close) OVER w3 >= 3
               THEN avg(close) OVER w3 END)
           - (CASE WHEN count(close) OVER w6 >= 6
               THEN avg(close) OVER w6 END), 6) + 0 AS momentum_3_6,
       ROUND((CASE WHEN count(close) OVER w6 >= 6
               THEN avg(close) OVER w6 END)
           - (CASE WHEN count(close) OVER w12 >= 12
               THEN avg(close) OVER w12 END), 6) + 0 AS momentum_6_12
FROM candles
WINDOW w3 AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
       w6 AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN 5 PRECEDING AND CURRENT ROW),
       w12 AS (PARTITION BY product_id ORDER BY bucket_start
              ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
"""


def q_time_features(spark, sf_dir):
    df = I.with_time_features(candles(spark, sf_dir), ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "hour",
                            "dayofweek", "is_weekend", "is_market_open",
                            "hour_sin", "hour_cos", "dow_sin", "dow_cos"),
                  ["hour_sin", "hour_cos", "dow_sin", "dow_cos"])


SQL_TIME_FEATURES = SQL_BASE + """
SELECT product_id, bucket_start,
       CAST(hour(bucket_start) AS INT) AS hour,
       CAST(isodow(bucket_start) - 1 AS INT) AS dayofweek,
       CAST(isodow(bucket_start) - 1 IN (5, 6) AS INT) AS is_weekend,
       CAST(hour(bucket_start) >= 8 AND hour(bucket_start) < 20 AS INT)
         AS is_market_open,
       ROUND(sin(2 * pi() * hour(bucket_start) / 24.0), 6) + 0 AS hour_sin,
       ROUND(cos(2 * pi() * hour(bucket_start) / 24.0), 6) + 0 AS hour_cos,
       ROUND(sin(2 * pi() * (isodow(bucket_start) - 1) / 7.0), 6) + 0 AS dow_sin,
       ROUND(cos(2 * pi() * (isodow(bucket_start) - 1) / 7.0), 6) + 0 AS dow_cos
FROM candles
"""


def q_robust_scale(spark, sf_dir):
    df = I.robust_scale(candles(spark, sf_dir), ["close", "volume"],
                        key="product_id")
    return _round(df.select("product_id", "bucket_start", "close_scaled",
                            "volume_scaled"),
                  ["close_scaled", "volume_scaled"])


SQL_ROBUST_SCALE = SQL_BASE + """
, stats AS (
  SELECT product_id,
         quantile_cont(close, 0.5) AS c_med,
         quantile_cont(close, 0.25) AS c_q1,
         quantile_cont(close, 0.75) AS c_q3,
         quantile_cont(volume, 0.5) AS v_med,
         quantile_cont(volume, 0.25) AS v_q1,
         quantile_cont(volume, 0.75) AS v_q3
  FROM candles GROUP BY product_id
)
SELECT c.product_id, bucket_start,
       ROUND(CASE WHEN c_q3 - c_q1 != 0
             THEN (close - c_med) / (c_q3 - c_q1)
             ELSE close - c_med END, 6) + 0 AS close_scaled,
       ROUND(CASE WHEN v_q3 - v_q1 != 0
             THEN (volume - v_med) / (v_q3 - v_q1)
             ELSE volume - v_med END, 6) + 0 AS volume_scaled
FROM candles c JOIN stats s ON c.product_id = s.product_id
"""


def q_minmax_scale(spark, sf_dir):
    df = I.minmax_scale(candles(spark, sf_dir), ["close"],
                        key="product_id", feature_range=(-1.0, 1.0))
    return _round(df.select("product_id", "bucket_start", "close_scaled"),
                  ["close_scaled"])


SQL_MINMAX_SCALE = SQL_BASE + """
, stats AS (
  SELECT product_id, min(close) AS c_min, max(close) AS c_max
  FROM candles GROUP BY product_id
)
SELECT c.product_id, bucket_start,
       ROUND((CASE WHEN c_max - c_min != 0
              THEN (close - c_min) / (c_max - c_min)
              ELSE 0.0 END) * 2.0 - 1.0, 6) + 0 AS close_scaled
FROM candles c JOIN stats s ON c.product_id = s.product_id
"""


def q_ewm_indicators(spark, sf_dir):
    """Exact EWM MACD / Wilder RSI (adjust=False recursion)."""
    df = I.ewm_features(candles(spark, sf_dir), key="product_id",
                        ts="bucket_start")
    return _round(df.select("product_id", "bucket_start", "ema_fast",
                            "ema_slow", "macd", "rsi_wilder"),
                  ["ema_fast", "ema_slow", "macd", "rsi_wilder"])


def _sql_ewm_indicators(fast: int = 12, slow: int = 26, signal: int = 9,
                        rsi_window: int = 14) -> str:
    """Recursive-CTE oracle for the exact EWM family.

    adjust=False EWM is y_t = ((1-α)·y_{t-1} + α·x_t) / ((1-α)+α),
    seeded at the first observation, with the update SKIPPED when
    x_t equals y_{t-1} — that is pandas' literal inner loop
    (pandas/_libs/window/aggregations.pyx), and both engines run
    IEEE-754 doubles, so replicating the exact op order (constants
    inlined via repr) makes the recursion bit-identical, not merely
    close. One frontier row per product per step → the recursion
    advances all keys in lockstep, depth = longest series.
    """
    def consts(span: float):
        a = 2.0 / (span + 1.0) if span >= 1 else span
        return a, 1.0 - a, (1.0 - a) + a

    af, omf, df_ = consts(fast)
    as_, oms, ds = consts(slow)
    ag_, omg, dg = consts(signal)
    ar = 1.0 / rsi_window
    omr, dr = 1.0 - ar, (1.0 - ar) + ar

    def step(prev: str, cur: str, a: float, om: float, d: float) -> str:
        return (f"CASE WHEN {prev} = {cur} THEN {prev} "
                f"ELSE ({om!r} * {prev} + {a!r} * {cur}) / {d!r} END")

    return SQL_BASE.replace("WITH ", "WITH RECURSIVE ", 1) + f"""
, ordered AS (
  SELECT product_id, bucket_start, close,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY bucket_start) AS rn
  FROM candles
), rec AS (
  SELECT product_id, bucket_start, rn, close,
         close AS ema_fast, close AS ema_slow,
         close - close AS sig,
         CAST(NULL AS DOUBLE) AS avg_gain,
         CAST(NULL AS DOUBLE) AS avg_loss
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT product_id, bucket_start, rn, close, ema_fast, ema_slow,
         {step('prev_sig', '(ema_fast - ema_slow)', ag_, omg, dg)}
           AS sig,
         avg_gain, avg_loss
  FROM (
    SELECT o.product_id, o.bucket_start, o.rn, o.close,
           {step('r.ema_fast', 'o.close', af, omf, df_)} AS ema_fast,
           {step('r.ema_slow', 'o.close', as_, oms, ds)} AS ema_slow,
           r.sig AS prev_sig,
           CASE WHEN r.avg_gain IS NULL
                THEN (CASE WHEN o.close - r.close > 0
                      THEN o.close - r.close ELSE 0.0 END)
                ELSE {step('r.avg_gain',
                           '(CASE WHEN o.close - r.close > 0 '
                           'THEN o.close - r.close ELSE 0.0 END)',
                           ar, omr, dr)} END AS avg_gain,
           CASE WHEN r.avg_loss IS NULL
                THEN (CASE WHEN o.close - r.close < 0
                      THEN r.close - o.close ELSE 0.0 END)
                ELSE {step('r.avg_loss',
                           '(CASE WHEN o.close - r.close < 0 '
                           'THEN r.close - o.close ELSE 0.0 END)',
                           ar, omr, dr)} END AS avg_loss
    FROM rec r JOIN ordered o
      ON o.product_id = r.product_id AND o.rn = r.rn + 1
  ) s
)
SELECT product_id, bucket_start,
       ROUND(ema_fast, 6) + 0 AS ema_fast,
       ROUND(ema_slow, 6) + 0 AS ema_slow,
       ROUND((ema_fast - ema_slow) - sig, 6) + 0 AS macd,
       ROUND(CASE WHEN rn - 1 >= {rsi_window} THEN
              CASE WHEN avg_loss = 0 THEN 100.0
                   ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss) END
             END, 6) + 0 AS rsi_wilder
FROM rec
"""


HW_ALPHA, HW_BETA = 0.2, 0.1


def q_holt_winters(spark, sf_dir):
    """Holt double exponential smoothing (level + trend) per product —
    the local-trend forecast baseline one rung above naive_forecast.
    Same seam as ewm_indicators: per-key applyInPandas recursion,
    recursive-CTE oracle with the identical IEEE op order."""
    df = I.holt_features(candles(spark, sf_dir), key="product_id",
                         ts="bucket_start", alpha=HW_ALPHA, beta=HW_BETA)
    return _round(df.select("product_id", "bucket_start", "hw_level",
                            "hw_trend", "hw_forecast"),
                  ["hw_level", "hw_trend", "hw_forecast"])


def _sql_holt_winters(alpha: float = HW_ALPHA,
                      beta: float = HW_BETA) -> str:
    """Recursive-CTE oracle for Holt smoothing — same doctrine as
    _sql_ewm_indicators: constants inlined via repr, op order written
    to match the numpy loop literally, one frontier row per product
    per step."""
    oma, omb = 1.0 - alpha, 1.0 - beta
    return SQL_BASE.replace("WITH ", "WITH RECURSIVE ", 1) + f"""
, ordered AS (
  SELECT product_id, bucket_start, close,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY bucket_start) AS rn
  FROM candles
), rec AS (
  SELECT product_id, bucket_start, rn, close,
         close AS lvl, CAST(0.0 AS DOUBLE) AS tr
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT product_id, bucket_start, rn, close, lvl,
         {beta!r} * (lvl - prev_lvl) + {omb!r} * prev_tr AS tr
  FROM (
    SELECT o.product_id, o.bucket_start, o.rn, o.close,
           {alpha!r} * o.close + {oma!r} * (r.lvl + r.tr) AS lvl,
           r.lvl AS prev_lvl, r.tr AS prev_tr
    FROM rec r JOIN ordered o
      ON o.product_id = r.product_id AND o.rn = r.rn + 1
  ) s
)
SELECT product_id, bucket_start,
       ROUND(lvl, 6) + 0 AS hw_level,
       ROUND(tr, 6) + 0 AS hw_trend,
       ROUND(lvl + tr, 6) + 0 AS hw_forecast
FROM rec
"""


HWS_ALPHA, HWS_BETA, HWS_GAMMA, HWS_PERIOD = 0.2, 0.1, 0.3, 24


def q_holt_winters_seasonal(spark, sf_dir):
    """TRIPLE (additive-seasonal) Holt-Winters over the HOURLY close
    series, period = 24 (hour-of-day — the periodicity
    seasonality_profile already measures on this data). Level, trend
    AND a 24-slot seasonal ring evolve per step; output starts after
    the first full cycle seeds the ring. Same doctrine as
    holt_winters: applyInPandas recursion per product, recursive-CTE
    oracle carrying the ring as a LIST column with the identical IEEE
    op order (the seed mean is a left fold on both sides)."""
    c = candles(spark, sf_dir)
    hourly = (c.groupBy("product_id",
                        F.date_trunc("hour", "bucket_start")
                        .alias("hour_start"))
              .agg(F.max_by("close", "bucket_start").alias("close")))
    df = I.holt_winters_seasonal(hourly, key="product_id",
                                 ts="hour_start", alpha=HWS_ALPHA,
                                 beta=HWS_BETA, gamma=HWS_GAMMA,
                                 period=HWS_PERIOD)
    return _round(df.select("product_id", "hour_start", "hw_level",
                            "hw_trend", "hw_season", "hw_forecast"),
                  ["hw_level", "hw_trend", "hw_season", "hw_forecast"])


def _sql_holt_winters_seasonal(alpha: float = HWS_ALPHA,
                               beta: float = HWS_BETA,
                               gamma: float = HWS_GAMMA,
                               m: int = HWS_PERIOD) -> str:
    """Recursive-CTE oracle for triple Holt-Winters. The recursion
    carries the m-slot seasonal ring as a DOUBLE[] (oldest first:
    after step t the ring is [s_{t−m+1} … s_t], so prev ring[1] is
    exactly the s_{t−m} the update needs and ring[1] of the new ring
    is the s_{t+1−m} the one-step forecast needs); the seed phase
    accumulates the first cycle's values in a list and folds them
    left-to-right (list_reduce), matching the Python loop's
    accumulation order literally."""
    oma, omb, omg = 1.0 - alpha, 1.0 - beta, 1.0 - gamma
    return SQL_BASE.replace("WITH ", "WITH RECURSIVE ", 1) + f"""
, hourly AS (
  SELECT product_id, date_trunc('hour', bucket_start) AS hour_start,
         arg_max(close, bucket_start) AS close
  FROM candles GROUP BY 1, 2
), ordered AS (
  SELECT product_id, hour_start, close,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY hour_start) AS rn
  FROM hourly
), rec AS (
  SELECT product_id, hour_start, rn, close,
         [close] AS ys,
         CAST(NULL AS DOUBLE) AS lvl, CAST(NULL AS DOUBLE) AS tr,
         CAST(NULL AS DOUBLE[]) AS seas
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT s.product_id, s.hour_start, s.rn, s.close,
         CASE WHEN s.rn < {m} THEN s.ys ELSE NULL END AS ys,
         s.lvl,
         CASE WHEN s.rn < {m} THEN NULL
              WHEN s.rn = {m} THEN CAST(0.0 AS DOUBLE)
              ELSE {beta!r} * (s.lvl - s.prev_lvl)
                   + {omb!r} * s.prev_tr END AS tr,
         CASE WHEN s.rn < {m} THEN NULL
              WHEN s.rn = {m} THEN
                list_transform(s.ys, v -> v - s.lvl)
              ELSE s.prev_seas[2:] ||
                [{gamma!r} * (s.close - s.lvl)
                 + {omg!r} * s.prev_seas[1]] END AS seas
  FROM (
    SELECT o.product_id, o.hour_start, o.rn, o.close,
           CASE WHEN o.rn <= {m} THEN r.ys || [o.close]
                ELSE NULL END AS ys,
           CASE WHEN o.rn < {m} THEN NULL
                WHEN o.rn = {m} THEN
                  list_reduce(r.ys || [o.close], (a, b) -> a + b) / {m}
                ELSE {alpha!r} * (o.close - r.seas[1])
                     + {oma!r} * (r.lvl + r.tr) END AS lvl,
           r.lvl AS prev_lvl, r.tr AS prev_tr, r.seas AS prev_seas
    FROM rec r JOIN ordered o
      ON o.product_id = r.product_id AND o.rn = r.rn + 1
  ) s
)
SELECT product_id, hour_start,
       ROUND(lvl, 6) + 0 AS hw_level,
       ROUND(tr, 6) + 0 AS hw_trend,
       ROUND(seas[{m}], 6) + 0 AS hw_season,
       ROUND(lvl + tr + seas[1], 6) + 0 AS hw_forecast
FROM rec WHERE rn >= {m}
"""


def q_heikin_ashi(spark, sf_dir):
    """Heikin-Ashi smoothed candles (recursive ha_open — the EWM
    situation: applyInPandas per key, recursive-CTE oracle replicates
    the IEEE op order bit-for-bit)."""
    df = I.heikin_ashi(candles(spark, sf_dir), key="product_id",
                       ts="bucket_start")
    return _round(df, ["ha_open", "ha_high", "ha_low", "ha_close"])


SQL_HEIKIN_ASHI = SQL_BASE.replace("WITH ", "WITH RECURSIVE ", 1) + """
, ordered AS (
  SELECT product_id, bucket_start, open, high, low, close,
         row_number() OVER (PARTITION BY product_id
                            ORDER BY bucket_start) AS rn
  FROM candles
), rec AS (
  SELECT product_id, bucket_start, rn, high, low,
         (open + high + low + close) / 4.0 AS ha_close,
         (open + close) / 2.0 AS ha_open
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.product_id, o.bucket_start, o.rn, o.high, o.low,
         (o.open + o.high + o.low + o.close) / 4.0 AS ha_close,
         (r.ha_open + r.ha_close) / 2.0 AS ha_open
  FROM rec r JOIN ordered o
    ON o.product_id = r.product_id AND o.rn = r.rn + 1
)
SELECT product_id, bucket_start,
       ROUND(ha_open, 6) + 0 AS ha_open,
       ROUND(greatest(high, ha_open, ha_close), 6) + 0 AS ha_high,
       ROUND(least(low, ha_open, ha_close), 6) + 0 AS ha_low,
       ROUND(ha_close, 6) + 0 AS ha_close
FROM rec
"""


# ------------------------------------------------------------------ TPC-H

def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan→filter→aggregate, fully codegen'd,
    partial-agg before the single shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    # money-scale SUMS round to 2dp (classic TPC-H answer precision):
    # at sf0.1+ they reach ~1e9, where a 6dp quantum is smaller than
    # one double ulp — cross-engine summation order would straddle
    # rounding boundaries. Averages stay 6dp (small magnitudes).
    out = (li.filter(F.col("l_shipdate") <= "1998-09-02")
           .groupBy("l_returnflag", "l_linestatus")
           .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))
                              * (1 + F.col("l_tax"))), 2)
                 .alias("sum_charge"),
                F.round(F.avg("l_quantity"), RND).alias("avg_qty"),
                F.round(F.avg("l_extendedprice"), RND).alias("avg_price"),
                F.round(F.avg("l_discount"), RND).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order")))
    return out


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       ROUND(sum(l_quantity), 2) + 0 AS sum_qty,
       ROUND(sum(l_extendedprice), 2) + 0 AS sum_base_price,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 2) + 0 AS sum_disc_price,
       ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) + 0
         AS sum_charge,
       ROUND(avg(l_quantity), 6) + 0 AS avg_qty,
       ROUND(avg(l_extendedprice), 6) + 0 AS avg_price,
       ROUND(avg(l_discount), 6) + 0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filters + fact join. Customer is
    SF-proportional, so it is NOT hint-broadcast — Catalyst's size
    stats broadcast it while it fits and AQE re-plans when it doesn't;
    lineitem↔orders shuffle-joins on orderkey."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = (li.filter(F.col("l_shipdate") > "1997-03-15")
           .join(od.filter(F.col("o_orderdate") < "1997-03-15"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .join(cu.filter(F.col("c_mktsegment") == "BUILDING"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), RND)
                 .alias("revenue")))
    return out


SQL_Q3 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 6) + 0 AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
"""


def q5_local_supplier(spark, sf_dir):
    """TPC-H Q5 shape: multi-way join. Only the fixed-cardinality dims
    (nation, region) carry broadcast hints; customer and supplier grow
    with SF, so their join strategy is left to size stats + AQE."""
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    na = load_table(spark, sf_dir, "nation")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = (li
           .join(od.filter((F.col("o_orderdate") >= "1996-01-01")
                           & (F.col("o_orderdate") < "1997-01-01")),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
           .join(cu,
                 (F.col("o_custkey") == F.col("c_custkey"))
                 & (F.col("c_nationkey") == F.col("s_nationkey")))
           .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
           .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy("n_name")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))
    return out


SQL_Q5 = """
SELECT n_name,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 2) + 0 AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


# ----------------------------------------------------------------- registry

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ticker_parse": q_ticker_parse,
    "candle_resample": q_candle_resample,
    "latest_n_per_key": q_latest_n,
    "available_products": q_available_products,
    "data_availability": q_data_availability,
    "time_range_fetch": q_time_range_fetch,
    "log_returns": q_log_returns,
    "price_features": q_price_features,
    "volume_features": q_volume_features,
    "rsi": q_rsi,
    "atr": q_atr,
    "obv": q_obv,
    "volatility": q_volatility,
    "momentum": q_momentum,
    "time_features": q_time_features,
    "robust_scale": q_robust_scale,
    "minmax_scale": q_minmax_scale,
    "ewm_indicators": q_ewm_indicators,
    "holt_winters": q_holt_winters,
    "holt_winters_seasonal": q_holt_winters_seasonal,
    "heikin_ashi": q_heikin_ashi,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
}

ORACLE_SQL: dict[str, str] = {
    "ticker_parse": SQL_TICKER_PARSE,
    "candle_resample": SQL_CANDLE_RESAMPLE,
    "latest_n_per_key": SQL_LATEST_N,
    "available_products": SQL_AVAILABLE_PRODUCTS,
    "data_availability": SQL_DATA_AVAILABILITY,
    "time_range_fetch": SQL_TIME_RANGE_FETCH,
    "log_returns": SQL_LOG_RETURNS,
    "price_features": SQL_PRICE_FEATURES,
    "volume_features": SQL_VOLUME_FEATURES,
    "rsi": SQL_RSI,
    "atr": SQL_ATR,
    "obv": SQL_OBV,
    "volatility": SQL_VOLATILITY,
    "momentum": SQL_MOMENTUM,
    "time_features": SQL_TIME_FEATURES,
    "robust_scale": SQL_ROBUST_SCALE,
    "minmax_scale": SQL_MINMAX_SCALE,
    "ewm_indicators": _sql_ewm_indicators(),
    "holt_winters": _sql_holt_winters(),
    "holt_winters_seasonal": _sql_holt_winters_seasonal(),
    "heikin_ashi": SQL_HEIKIN_ASHI,
    "q1_pricing_summary": SQL_Q1,
    "q3_shipping_priority": SQL_Q3,
    "q5_local_supplier": SQL_Q5,
}
