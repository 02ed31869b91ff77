"""Wire schemas for the reference's two Kafka topics.

Reference parity: kafka_spark_processor/spark_processor.py:110-137 —
the Advanced-Trade ticker schema (all-string payloads, cast after
parse) and the candle schema (string OHLCV + `start` that is either
unix-seconds or an ISO timestamp).

All fields are StringType on purpose: the exchange emits JSON with
numeric fields as strings, and keeping the wire schema string-typed
makes `from_json` total (malformed numerics become NULL at the cast,
not a parse failure that nulls the whole row).
"""

from __future__ import annotations

from pyspark.sql.types import StringType, StructField, StructType


def _s(*names: str) -> StructType:
    return StructType([StructField(n, StringType(), True) for n in names])


# spark_processor.py:110-124
TICKER_SCHEMA = _s(
    "type", "product_id", "price", "volume_24h", "low_24h", "high_24h",
    "low_52w", "high_52w", "price_percent_chg_24h",
    "volume_percent_chg_24h", "price_change_24h", "volume_change_24h",
    "time",
)

# spark_processor.py:127-135
CANDLE_SCHEMA = _s(
    "start", "high", "low", "open", "close", "volume", "product_id",
)
