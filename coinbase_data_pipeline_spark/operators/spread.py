"""Scan-parallelism guard for CPU-dense narrow stages.

Spark parallelizes a parquet scan at ROW-GROUP granularity: a small
table written as one file with one row group yields ONE input
partition, and every narrow transformation pipelined into that scan
stage — tokenize/shingle/hash in the text operators, the dominant CPU
cost of the corpus family — serializes onto a single core no matter
how many the cluster has. At production scale the corpus arrives as
thousands of row groups and the scan alone saturates the cluster; the
pathology is specifically SMALL inputs (testdata, a re-read of a
compacted dimension, the tail partition of an incremental load).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame, *, factor: int = 1) -> DataFrame:
    """Round-robin repartition `df` to `factor`× cluster parallelism —
    but ONLY when its scan yields fewer partitions than that (the
    check is plan metadata, no job runs). On a well-partitioned
    production input this is a no-op, so the full-corpus shuffle it
    would cost at 100 TB never happens; on a single-row-group input it
    unlocks every core for the tokenize stage that follows.
    """
    target = factor * df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def spread_by_key(df: DataFrame, key: str, *, factor: int = 1) -> DataFrame:
    """Pin the key-partitioning a window family needs at cluster
    parallelism. The planner would insert this exact exchange anyway
    (ClusteredDistribution on `key`), but as an AQE-owned shuffle it
    coalesces small-byte stages to ONE partition — and a multi-column
    window family is CPU-dense per byte, so byte-based coalescing
    serializes minutes of window evaluation onto one core. An explicit
    repartition(n, key) satisfies the same distribution (no second
    exchange appears) while keeping the user-specified width. Same
    cost as the planner's own exchange at any scale; parallelism is
    still bounded by the number of distinct keys."""
    target = factor * df.sparkSession.sparkContext.defaultParallelism
    from pyspark.sql import functions as F

    return df.repartition(target, F.col(key))
