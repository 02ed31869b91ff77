"""As-of (nearest-at-or-before) join.

Reference parity: the prediction service correlates predictions with
the actual price at/just-before target_time (prediction_service/src/
data_writer.py get_recent_predictions + Grafana actual-vs-predicted
panels). Cassandra does this with clustered time lookups; the Spark
re-expression is a distributed as-of join.

Spark-first strategy: the classic union + last_value(ignorenulls)
trick — tag both sides, union, ONE shuffle on (key), ONE ordered pass
per key filling the latest right-side values forward onto left rows.
No range-join explosion, no per-row subqueries; linear in
|left|+|right| after the shuffle, which is optimal at 100 TB.
Equal timestamps are inclusive (right row at t matches left row at t).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *, key: str,
              left_ts: str, right_ts: str,
              right_vals: list[str]) -> DataFrame:
    """For every left row: the most recent right row with
    right_ts <= left_ts within the same key. Left rows with no prior
    right row get NULLs (left-outer as-of semantics).

    DuckDB oracle twin: ``l ASOF LEFT JOIN r ON l.key = r.key AND
    l.ts >= r.ts``.
    """
    lcols = left.columns
    l = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(f"_r_{c}") for c in right_vals],
    ).withColumn("_side", F.lit(0))

    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal _t → inclusive match
    w = (Window.partitionBy(key).orderBy(F.col("_t"), F.col("_side"))
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in right_vals:
        u = u.withColumn(f"_r_{c}",
                         F.last(f"_r_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_r_{c}").alias(f"{c}_asof") for c in right_vals])
    return out
