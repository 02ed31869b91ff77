"""Typed parse of raw JSON event payloads (batch AND streaming — the
same functions apply to either kind of DataFrame).

Reference parity: kafka_spark_processor/spark_processor.py:160-171
(ticker: product_id, to_timestamp(time), cast price) and :197-215
(candle: unix-seconds-or-ISO `start` coercion, cast OHLCV).

Scale notes: `from_json` + casts are pure row-local expressions —
whole-stage codegen, no shuffle, safe at any width. The coercion is a
`when(cast long).otherwise(to_timestamp)` exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .schemas import CANDLE_SCHEMA, TICKER_SCHEMA


def coerce_timestamp(col: Column) -> Column:
    """Unix-seconds-or-ISO string → timestamp
    (spark_processor.py:205-207)."""
    as_long = col.cast("long")
    return (F.when(as_long.isNotNull(), F.timestamp_seconds(as_long))
             .otherwise(F.to_timestamp(col)))


def parse_tickers(raw: DataFrame, *, value_col: str = "value",
                  channel_filter: bool = True,
                  fallback_ts_col: str | None = None) -> DataFrame:
    """Raw JSON ticker payloads → (product_id, time, price).

    spark_processor.py:160-171; `channel_filter` adds the
    `type == 'ticker'` guard of the legacy job (:58-63).
    `fallback_ts_col` reproduces the producer's time injection
    (producer.py:87-91: a payload without `time` gets the transport
    timestamp) — pass e.g. the Kafka message timestamp column.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"),
                    TICKER_SCHEMA).alias("t"),
        *([F.col(fallback_ts_col)] if fallback_ts_col else []))
    time_col = F.to_timestamp("t.time")
    if fallback_ts_col is not None:
        time_col = F.coalesce(time_col,
                              F.col(fallback_ts_col).cast("timestamp"))
    out = parsed.select(
        F.col("t.product_id").alias("product_id"),
        time_col.alias("time"),
        F.col("t.price").cast("double").alias("price"),
        F.col("t.type").alias("type"),
    )
    if channel_filter:
        out = out.filter(F.col("type") == "ticker")
    return out.drop("type")


def parse_candles(raw: DataFrame, *, value_col: str = "value") -> DataFrame:
    """Raw JSON candle payloads → typed OHLCV row
    (spark_processor.py:197-215)."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"),
                    CANDLE_SCHEMA).alias("c"))
    return parsed.select(
        F.col("c.product_id").alias("product_id"),
        coerce_timestamp(F.col("c.start")).alias("start_time"),
        F.col("c.open").cast("double").alias("open"),
        F.col("c.high").cast("double").alias("high"),
        F.col("c.low").cast("double").alias("low"),
        F.col("c.close").cast("double").alias("close"),
        F.col("c.volume").cast("double").alias("volume"),
    )
