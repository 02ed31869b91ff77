"""Parquet table registry.

Mirrors the reference's storage catalog (Cassandra keyspace `coinbase`
tables + the S3 archive: /root/reference/cassandra/scripts, consumer.go)
as a flat parquet namespace. On a cluster these paths are object-store
URIs; locally they are the driver-generated testdata dirs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_runtime_conf(spark: SparkSession) -> None:
    """Runtime confs this engine's semantics depend on, set defensively
    because callers (e.g. the verify driver) may pass their own session:

    - nanosAsLong: testdata events.parquet stores TIMESTAMP(NANOS),
      which Spark 4 otherwise refuses to read;
    - ansi off: x/0 → NULL (DuckDB/classic-Spark semantics) instead of
      an error — the engine's documented division semantics.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down → session.py defaults already apply


# Inferred parquet schemas, per (application, path) — the metadata a
# catalog/metastore would hold. A bare `spark.read.parquet(path)`
# re-reads the footer to infer the schema on EVERY call (~150 ms
# warm, measured r13); a catalog query builder calls load_table 1-4
# times, so schema inference alone was a large slice of the
# per-query fixed cost (guide §6: listing/footer work is driver-side
# planning overhead). Metadata only — never rows; a different path
# (new sf dir, probe dir) misses and re-infers.
_SCHEMA_CACHE: dict[tuple[str, str], "object"] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Plain parquet scan → Catalyst gets full pushdown."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_runtime_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (spark.sparkContext.applicationId, path)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        if len(_SCHEMA_CACHE) > 256:
            _SCHEMA_CACHE.clear()
        _SCHEMA_CACHE[key] = df.schema
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) read as long (nanosAsLong): integer-divide to
        # microseconds — lossless for this data and bit-identical to
        # DuckDB's us-precision read. The raw long survives as
        # `ts_nanos` so time-range predicates can be expressed on the
        # scan column itself and reach parquet as PushedFilters (a
        # filter on the converted expression cannot push down).
        df = (df.withColumnRenamed("ts", "ts_nanos")
                .withColumn("ts", F.timestamp_micros(
                    F.expr("ts_nanos div 1000"))))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can be used."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
