"""Gap-based sessionization over the event stream.

Classic event-analytics operator (not in the reference's surface but
a first-class need of any events pipeline at scale; complements the
data_fetcher-style scans over the same table).

Spark-first: sessions are derived with the standard two-window trick —
`lag` flags gap starts, a running sum numbers sessions — over ONE
`partitionBy(user).orderBy(ts)` window family (single shuffle), then a
groupBy on (user, session_no) that reuses the same hash partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.timeutil import epoch_seconds


def sessionize(events: DataFrame, *, user: str = "user_id",
               ts: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """One row per session: (user, session_no, start, end, n_events).

    A new session begins when the gap to the previous event of the
    same user exceeds `gap_minutes` (or at the user's first event).
    """
    w = Window.partitionBy(user).orderBy(ts)
    gap_s = gap_minutes * 60
    prev = F.lag(ts).over(w)
    # fractional-second gap (epoch_seconds keeps microseconds and is
    # NTZ-safe); unix_timestamp would truncate and mis-split gaps
    # within 1s of the threshold
    is_new = (prev.isNull()
              | ((epoch_seconds(F.col(ts)) - epoch_seconds(prev))
                 > gap_s)).cast("long")
    numbered = (events
                .withColumn("_new", is_new)
                .withColumn("session_no", F.sum("_new").over(
                    w.rowsBetween(Window.unboundedPreceding, 0))))
    return (numbered.groupBy(user, "session_no")
            .agg(F.min(ts).alias("session_start"),
                 F.max(ts).alias("session_end"),
                 F.count(F.lit(1)).alias("n_events")))
