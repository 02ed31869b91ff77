"""Catalog part 6: event analytics (sessionization, daily actives,
grouped quantiles, corpus n-gram frequency) and the skew-resistant
salted candle build. Same contract as catalog.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.text import sql_hash60
from ..operators import candles as C
from ..operators import sessions as S
from ..operators import textstats as TS
from ..sources.tables import load_table
from .catalog import SQL_BASE, SQL_CANDLE_RESAMPLE, _round, ticks


# ------------------------------------------------------------ sessionization

def q_sessionize(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return S.sessionize(ev, gap_minutes=30)


SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
)
SELECT user_id, session_no,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_no
"""


# -------------------------------------------------------------- daily actives

def q_daily_active_users(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy(F.to_date("ts").alias("day"))
            .agg(F.count_distinct("user_id").alias("dau"),
                 F.count(F.lit(1)).alias("n_events")))


SQL_DAU = """
SELECT CAST(ts AS DATE) AS day,
       count(DISTINCT user_id) AS dau,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def q_approx_distinct_users(spark, sf_dir):
    """HLL++ distinct estimate per event_type — rows-only (sketch
    internals differ across engines; the exact twin is
    daily_active_users). The scale point: one pass, mergeable state,
    no count-distinct expansion."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.02)
                 .alias("approx_users"),
                 F.count(F.lit(1)).alias("n_events")))


# ------------------------------------------------------------------ quantiles

def q_price_quantiles(spark, sf_dir):
    """Exact per-product price quantiles (grouped percentile summary —
    the distribution-profile scan a feature store runs per key)."""
    t = ticks(spark, sf_dir)
    qs = {"q25": 0.25, "q50": 0.5, "q75": 0.75, "q90": 0.9, "q99": 0.99}
    aggs = [(F.round(F.percentile("price", F.lit(p)), 6) + F.lit(0.0))
            .alias(name) for name, p in qs.items()]
    return t.groupBy("product_id").agg(*aggs)


SQL_PRICE_QUANTILES = SQL_BASE + """
SELECT product_id,
       ROUND(quantile_cont(price, 0.25), 6) + 0 AS q25,
       ROUND(quantile_cont(price, 0.5), 6) + 0 AS q50,
       ROUND(quantile_cont(price, 0.75), 6) + 0 AS q75,
       ROUND(quantile_cont(price, 0.9), 6) + 0 AS q90,
       ROUND(quantile_cont(price, 0.99), 6) + 0 AS q99
FROM ticks GROUP BY product_id
"""


# ------------------------------------------------------------- ngram docfreq

def q_ngram_doc_frequency(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return TS.ngram_doc_frequency(docs, top_n=20, n=2)


SQL_NGRAM_DOC_FREQUENCY = """
WITH toks AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(lower(text), '[^a-z]+'),
           x -> len(x) > 0) AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 1, 0)),
           i -> t[i] || ' ' || t[i + 1]))) AS ngram
  FROM toks
)
SELECT ngram, count(*) AS doc_freq
FROM grams GROUP BY ngram
ORDER BY doc_freq DESC, ngram
LIMIT 20
"""


# ------------------------------------------------------------- salted candles

def q_candle_resample_salted(spark, sf_dir):
    """Skew path: two-level salted candle aggregation. Same oracle as
    candle_resample — the salt must be invisible in the result."""
    df = C.candle_resample_salted(ticks(spark, sf_dir), volume="volume")
    return _round(df, ["open", "high", "low", "close", "volume"])


# ------------------------------------------------------------------ range join

def q_range_join(spark, sf_dir):
    """Interval join: each purchase event matched to the session
    interval containing it (same user, ts within [start, end]).

    The equi-key (user_id) carries the join — Spark plans a hash join
    on user with the interval predicate as a post-join filter, so no
    interval-only cross pairing ever happens; sessions per user are
    few, keeping the per-key fanout bounded at any scale."""
    ev = load_table(spark, sf_dir, "events")
    sessions = S.sessionize(ev, gap_minutes=30)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id", "value"))
    return (purchases.join(
        sessions,
        (purchases["user_id"] == sessions["user_id"])
        & (F.col("ts") >= F.col("session_start"))
        & (F.col("ts") <= F.col("session_end")))
        .select(purchases["user_id"], "ts", "event_id", "value",
                "session_no", "session_start", "n_events"))


SQL_RANGE_JOIN = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS session_no
  FROM flagged
), sessions AS (
  SELECT user_id, session_no,
         min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
  FROM numbered GROUP BY user_id, session_no
)
SELECT e.user_id, e.ts, e.event_id, e.value,
       s.session_no, s.session_start, s.n_events
FROM events e JOIN sessions s
  ON e.user_id = s.user_id
 AND e.ts >= s.session_start AND e.ts <= s.session_end
WHERE e.event_type = 'purchase'
"""


# ---------------------------------------------------------------------- pivot

def q_event_type_pivot(spark, sf_dir):
    """Wide per-user event-type counts (pivot). The pivot values are a
    fixed, declared list — the plan is one groupBy with conditional
    partial aggregates, not a discovery pass + shuffle per column."""
    ev = load_table(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    out = (ev.groupBy("user_id")
           .pivot("event_type", types)
           .agg(F.count(F.lit(1))))
    for t in types:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0)))
    return out


SQL_EVENT_TYPE_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'view') AS view,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'error') AS error
FROM events GROUP BY user_id
"""


# ------------------------------------------------------------- grouping sets

def q_volume_rollup(spark, sf_dir):
    """ROLLUP (product, day): per-product-per-day, per-product, and
    grand-total tick volume in ONE pass (partial aggregates expand the
    grouping sets map-side; no re-scan per level)."""
    t = ticks(spark, sf_dir)
    out = (t.withColumn("day", F.to_date("time"))
           .rollup("product_id", "day")
           .agg((F.round(F.sum("volume"), 6) + F.lit(0.0))
                .alias("total_volume"),
                F.count(F.lit(1)).alias("n_ticks")))
    return out


SQL_VOLUME_ROLLUP = SQL_BASE + """
SELECT product_id, CAST(time AS DATE) AS day,
       ROUND(sum(volume), 6) + 0 AS total_volume,
       count(*) AS n_ticks
FROM ticks
GROUP BY ROLLUP (product_id, day)
"""


# -------------------------------------------------------------------- tf-idf

def q_tfidf_top_terms(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return TS.tfidf_top_terms(docs, top_n=3)


SQL_TFIDF = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                            x -> len(x) > 0)) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS doc_freq FROM tf GROUP BY term
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * ln(n.n_docs / df.doc_freq), 6) + 0 AS tfidf
  FROM tf, df, n WHERE tf.term = df.term
), ranked AS (
  SELECT doc_id, term, tf, tfidf,
         CAST(row_number() OVER (PARTITION BY doc_id
                                 ORDER BY tfidf DESC, term) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS term_count, tfidf, rank
FROM ranked WHERE rank <= 3
"""


# --------------------------------------------------------------------- funnel

def q_funnel(spark, sf_dir):
    """Ordered conversion funnel view → click → purchase: a user
    counts at each step only if the event happened strictly after the
    previous step's first event. Three grouped aggregates (each one
    pass, partial-agg), joined on the (small) per-user step tables."""
    ev = load_table(spark, sf_dir, "events")
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t_view")))
    c = (ev.filter(F.col("event_type") == "click")
         .join(v, "user_id")
         .filter(F.col("ts") > F.col("t_view"))
         .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    p = (ev.filter(F.col("event_type") == "purchase")
         .join(c, "user_id")
         .filter(F.col("ts") > F.col("t_click"))
         .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    return (v.agg(F.count(F.lit(1)).alias("step_view"))
            .crossJoin(F.broadcast(
                c.agg(F.count(F.lit(1)).alias("step_click"))))
            .crossJoin(F.broadcast(
                p.agg(F.count(F.lit(1)).alias("step_purchase")))))


SQL_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS step_view,
       (SELECT count(*) FROM c) AS step_click,
       (SELECT count(*) FROM p) AS step_purchase
"""


# ----------------------------------------------------------------- registry

# ------------------------------------------------------------- histogram

HIST_BINS = 20


def q_value_histogram(spark, sf_dir):
    """Data-profiling histogram: per event_type, 20 equal-width bins
    over `value` (bounds = the key's own min/max, broadcast back from
    a one-row-per-key aggregate; top edge folded into the last bin).
    Shared explicit bin arithmetic — both engines compute
    least(floor((v - lo)/(hi - lo) * bins), bins - 1) in IEEE double,
    so the oracle is exact. One stats shuffle + one grouped count."""
    ev = load_table(spark, sf_dir, "events")
    stats = (ev.groupBy("event_type")
             .agg(F.min("value").alias("_lo"), F.max("value").alias("_hi"))
             .filter(F.col("_hi") > F.col("_lo")))
    binc = F.least(
        F.floor((F.col("value") - F.col("_lo"))
                / (F.col("_hi") - F.col("_lo")) * HIST_BINS),
        F.lit(HIST_BINS - 1)).cast("int")
    return (ev.join(F.broadcast(stats), "event_type")
            .withColumn("bin", binc)
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 (F.round(F.min("value"), 6) + F.lit(0.0)).alias("bin_min"),
                 (F.round(F.max("value"), 6) + F.lit(0.0)).alias("bin_max")))


SQL_VALUE_HISTOGRAM = f"""
WITH stats AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type HAVING max(value) > min(value)
)
SELECT event_type,
       CAST(least(floor((value - lo) / (hi - lo) * {HIST_BINS}),
                  {HIST_BINS - 1}) AS INT) AS bin,
       count(*) AS n,
       ROUND(min(value), 6) + 0 AS bin_min,
       ROUND(max(value), 6) + 0 AS bin_max
FROM events JOIN stats USING (event_type)
GROUP BY 1, 2
"""


# ---------------------------------------------------------- anomaly detection

ANOM_SIGMA = 2.5          # flag |return| > sigma * trailing vol
ANOM_WINDOW = 24          # trailing buckets (exclusive of current)
ANOM_MIN_OBS = 12         # minimum trailing observations


def q_price_anomalies(spark, sf_dir):
    """Return-spike detection over the candle series: per product,
    flag buckets whose log return exceeds ANOM_SIGMA x the trailing
    ANOM_WINDOW-bucket return volatility (volatility window EXCLUDES
    the current bucket, so a spike cannot mask itself).

    One window family (partitionBy product, orderBy bucket) → single
    shuffle shared by the lag and the rolling stddev; the filter is
    evaluated pre-shuffle-free, JVM-side. Precision: return and vol
    are snapped to 6dp before the comparison and the ratio, so both
    engines compare/divide identical doubles (zscore itself is NOT
    re-rounded — quotients of identical doubles are bit-identical).
    """
    from pyspark.sql import Window

    from .catalog import candles as _candles

    c = _candles(spark, sf_dir)
    w1 = Window.partitionBy("product_id").orderBy("bucket_start")
    wv = w1.rowsBetween(-ANOM_WINDOW, -1)
    prev = F.lag("close").over(w1)
    ret = F.when((F.col("close") > 0) & (prev > 0),
                 F.log(F.col("close") / prev))
    scored = (c.select("product_id", "bucket_start",
                       ret.alias("ret"))
              .select("product_id", "bucket_start",
                      (F.round("ret", 6) + F.lit(0.0)).alias("log_return"),
                      (F.round(F.when(F.count("ret").over(wv)
                                      >= ANOM_MIN_OBS,
                                      F.stddev_samp("ret").over(wv)), 6)
                       + F.lit(0.0)).alias("trail_vol")))
    return (scored
            .filter((F.col("trail_vol") > 0)
                    & (F.abs("log_return")
                       > ANOM_SIGMA * F.col("trail_vol")))
            .select("product_id", "bucket_start", "log_return",
                    "trail_vol",
                    (F.col("log_return") / F.col("trail_vol"))
                    .alias("zscore")))


SQL_PRICE_ANOMALIES = SQL_BASE + f"""
, rets AS (
  SELECT product_id, bucket_start,
         CASE WHEN close > 0 AND lag(close) OVER w1 > 0
              THEN ln(close / lag(close) OVER w1) END AS ret
  FROM candles
  WINDOW w1 AS (PARTITION BY product_id ORDER BY bucket_start)
), scored AS (
  SELECT product_id, bucket_start,
         ROUND(ret, 6) + 0 AS log_return,
         ROUND(CASE WHEN count(ret) OVER wv >= {ANOM_MIN_OBS}
               THEN stddev_samp(ret) OVER wv END, 6) + 0 AS trail_vol
  FROM rets
  WINDOW wv AS (PARTITION BY product_id ORDER BY bucket_start
                ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING)
)
SELECT product_id, bucket_start, log_return, trail_vol,
       log_return / trail_vol AS zscore
FROM scored
WHERE trail_vol > 0 AND abs(log_return) > {ANOM_SIGMA} * trail_vol
"""


# ------------------------------------------------------------- KMV sketch

KMV_K = 64


def q_kmv_distinct_users(spark, sf_dir):
    """Deterministic mergeable cardinality sketch: k-minimum-values
    over hash60(user_id) per event day. est = (k−1)·2^60 / kth-min
    when the day has ≥ k distinct hashes, exact count below — the
    oracle-checkable sibling of the rows-only HLL query (KMV's state
    is the k smallest hash values: integers, order-free, mergeable
    by union+trim; HLL's register max/harmonic-mean pipeline never
    value-hashes across engines).

    Scale shape: the k-smallest reduction runs as a SHARDED partial
    aggregate — per (day, hash-shard) sorted k-min arrays (bounded:
    each shard buffers its own distinct hashes... bounded further by
    pre-distinct), merged per day by concat+sort+trim of 256 k-sized
    arrays. No full-day sort, no unbounded collect; accuracy
    pytest-bounded (~1/√k)."""
    ev = load_table(spark, sf_dir, "events")
    from ..functions.text import hash60
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hashes = (ev.select(day, hash60(F.col("user_id").cast("string"),
                                    "kmv").alias("h"))
              .distinct())
    shard = (F.col("h") % 256).alias("shard")
    partial = (hashes.select("day", shard, "h")
               .groupBy("day", "shard")
               .agg(F.slice(F.array_sort(F.collect_list("h")), 1,
                            KMV_K).alias("mins")))
    merged = (partial.groupBy("day")
              .agg(F.slice(F.array_sort(F.flatten(
                  F.collect_list("mins"))), 1, KMV_K).alias("mins")))
    n_seen = F.size("mins")
    kth = F.element_at("mins", KMV_K)
    est = F.when(
        n_seen >= KMV_K,
        F.round((F.lit(float(KMV_K - 1)) * F.lit(float(1 << 60)))
                / kth, 3) + F.lit(0.0)) \
        .otherwise(n_seen.cast("double"))
    return merged.select("day", n_seen.alias("n_tracked"),
                         F.when(n_seen >= KMV_K, kth).alias("kth_hash"),
                         est.alias("est_distinct"))


SQL_KMV_DISTINCT_USERS = f"""
WITH hashes AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         {sql_hash60("CAST(user_id AS VARCHAR)", "kmv")} AS h
  FROM events
), ranked AS (
  SELECT day, h,
         row_number() OVER (PARTITION BY day ORDER BY h) AS rn
  FROM hashes
), mins AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_tracked,
         max(CASE WHEN rn = {KMV_K} THEN h END) AS kth
  FROM ranked WHERE rn <= {KMV_K} GROUP BY day
)
SELECT day, n_tracked,
       CASE WHEN n_tracked >= {KMV_K} THEN kth END AS kth_hash,
       CASE WHEN n_tracked >= {KMV_K}
            THEN round({float(KMV_K - 1)} * {float(1 << 60)} / kth, 3)
                 + 0
            ELSE CAST(n_tracked AS DOUBLE) END AS est_distinct
FROM mins
"""


def q_kmv_weekly_merge(spark, sf_dir):
    """The MERGEABILITY proof in query form: weekly distinct-user
    estimates computed by MERGING the daily KMV sketch states
    (union + sort + trim of the k-min arrays) — never re-reading the
    raw events per week. k-min(A ∪ B) ≡ k-min(k-min(A) ∪ k-min(B))
    exactly, so the merged estimate is BIT-IDENTICAL to a direct
    weekly sketch — which is what the oracle computes from scratch.
    This tiered rollup (day partials → week) is how a sketch
    actually deploys at 100 TB: one pass over raw data ever.

    The daily stage is the SAME (day, hash-shard) sharded k-min
    partial as q_kmv_distinct_users (k-min is merge-invariant, so
    shard→day→week produces bit-identical sketches) — per-group state
    stays k-bounded instead of collecting a whole day's distinct
    hashes into one array."""
    ev = load_table(spark, sf_dir, "events")
    from ..functions.text import hash60
    day = F.date_trunc("day", F.col("ts")).alias("day")
    hashes = (ev.select(day, hash60(F.col("user_id").cast("string"),
                                    "kmv").alias("h"))
              .distinct())
    shard = (F.col("h") % 256).alias("shard")
    partial = (hashes.select("day", shard, "h")
               .groupBy("day", "shard")
               .agg(F.slice(F.array_sort(F.collect_list("h")), 1,
                            KMV_K).alias("mins")))
    daily = (partial.groupBy("day")
             .agg(F.slice(F.array_sort(F.flatten(
                 F.collect_list("mins"))), 1, KMV_K).alias("mins")))
    week = F.date_trunc("week", F.col("day")).alias("week")
    merged = (daily.select(week, "mins")
              .groupBy("week")
              .agg(F.slice(F.array_sort(F.array_distinct(F.flatten(
                  F.collect_list("mins")))), 1, KMV_K).alias("mins")))
    n_seen = F.size("mins")
    kth = F.element_at("mins", KMV_K)
    est = F.when(
        n_seen >= KMV_K,
        F.round((F.lit(float(KMV_K - 1)) * F.lit(float(1 << 60)))
                / kth, 3) + F.lit(0.0)) \
        .otherwise(n_seen.cast("double"))
    return merged.select("week", n_seen.alias("n_tracked"),
                         F.when(n_seen >= KMV_K, kth).alias("kth_hash"),
                         est.alias("est_distinct"))


SQL_KMV_WEEKLY_MERGE = f"""
WITH hashes AS (
  SELECT DISTINCT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
         {sql_hash60("CAST(user_id AS VARCHAR)", "kmv")} AS h
  FROM events
), ranked AS (
  SELECT week, h,
         row_number() OVER (PARTITION BY week ORDER BY h) AS rn
  FROM hashes
), mins AS (
  SELECT week, CAST(count(*) AS BIGINT) AS n_tracked,
         max(CASE WHEN rn = {KMV_K} THEN h END) AS kth
  FROM ranked WHERE rn <= {KMV_K} GROUP BY week
)
SELECT week, n_tracked,
       CASE WHEN n_tracked >= {KMV_K} THEN kth END AS kth_hash,
       CASE WHEN n_tracked >= {KMV_K}
            THEN round({float(KMV_K - 1)} * {float(1 << 60)} / kth, 3)
                 + 0
            ELSE CAST(n_tracked AS DOUBLE) END AS est_distinct
FROM mins
"""


# -------------------------------------------------------- session windows

def q_session_window_agg(spark, sf_dir):
    """Per-user session aggregation via Spark's NATIVE
    ``session_window`` (the engine's dynamic-gap window operator —
    the declarative alternative to the hand-rolled lag+cumsum
    sessionize, and the same operator Structured Streaming uses for
    watermarked streaming sessionization): one groupBy produces
    (user, session start/end, events, value sum).

    Engine convention: session_window merges an event into the open
    session when its gap to the previous event is STRICTLY below the
    30-minute gap duration (end = last_event + gap, merge while
    next < end) — one fencepost tighter than sessionize's `gap >
    1800 starts new`; the oracle mirrors `>= 1800` exactly. Value
    sums round 2dp."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id",
                       F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.round(F.sum("value"), 2) + F.lit(0.0))
                 .alias("value_sum"))
            .select("user_id",
                    F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "n_events", "value_sum"))


SQL_SESSION_WINDOW_AGG = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTES AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       ROUND(CAST(sum(value) AS DOUBLE), 2) + 0 AS value_sum
FROM sess GROUP BY user_id, sid
"""


# ------------------------------------------------------------ event paths

PATH_N, PATH_TOP = 3, 25


def q_event_paths(spark, sf_dir):
    """Top common 3-step event-type paths within user sessions (the
    clickstream path-mining table behind funnel design): each user's
    events sort into 30-minute-gap sessions (the sessionize
    machinery), every consecutive event-type trigram inside a session
    counts once, top 25 paths by (count DESC, path) — deterministic
    total order.

    Plan: one shuffle on user for sessionization, per-(user, session)
    sequences assemble via a sorted-struct fold (ts order is the
    path), trigram explode is narrow, one count shuffle; the final
    ranking window is global but runs over the path VOCABULARY
    (≤ |event types|³ rows), not the event stream."""
    from ..functions.timeutil import epoch_micros
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # exact BIGINT µs gap (epoch_micros ↔ DuckDB epoch_us): a double
    # subtraction can flip a gap of exactly 1800s by one ulp on
    # fractional-second timestamps
    is_new = (prev.isNull()
              | ((epoch_micros(F.col("ts")) - epoch_micros(prev))
                 > 1_800_000_000)).cast("long")
    sess = (ev.withColumn("_new", is_new)
            .withColumn("session_id", F.sum("_new").over(
                w.rowsBetween(W.unboundedPreceding, 0))))
    seq = (sess.groupBy("user_id", "session_id")
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct("ts", "event_id",
                                                    "event_type"))),
               lambda s: s.getField("event_type")).alias("_seq")))
    last = F.size("_seq") - (PATH_N - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)) \
           .otherwise(F.array().cast("array<int>"))
    paths = (seq.select(F.explode(
        F.transform(idx, lambda i: F.array_join(
            F.slice(F.col("_seq"), i, PATH_N), ">"))).alias("path")))
    ranked = (paths.groupBy("path")
              .agg(F.count(F.lit(1)).alias("n_paths")))
    # top-K FIRST (TakeOrderedAndProject — per-partition partial
    # top-K, never a global sort), THEN rank the ≤K survivors: the
    # old row_number-then-filter was an unpartitioned window over
    # EVERY distinct path — single-partition at corpus scale (the
    # one WindowExec warning the r09 driver sim surfaced)
    top = ranked.orderBy(F.col("n_paths").desc(), "path") \
                .limit(PATH_TOP)
    w = Window.orderBy(F.col("n_paths").desc(), F.col("path"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def _sql_event_paths() -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts - lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS session_id
  FROM flagged
), seqs AS (
  SELECT user_id, session_id,
         list(event_type ORDER BY ts, event_id) AS seq
  FROM sess GROUP BY user_id, session_id
), paths AS (
  SELECT unnest(list_transform(
           generate_series(1, greatest(len(seq) - {PATH_N - 1}, 0)),
           i -> array_to_string(seq[i:i+{PATH_N - 1}], '>'))) AS path
  FROM seqs
), ranked AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_paths FROM paths
  GROUP BY path
)
SELECT path, n_paths,
       CAST(row_number() OVER (ORDER BY n_paths DESC, path) AS INT)
         AS rank
FROM ranked
ORDER BY n_paths DESC, path
LIMIT {PATH_TOP}
"""


SQL_EVENT_PATHS = _sql_event_paths()


# ------------------------------------------------------------------- RFM

RFM_THRESHOLD_BINS = 128


def q_rfm_scores(spark, sf_dir, *, approx_thresholds: bool = False):
    """RFM customer segmentation over the event stream: per user,
    Recency (days since last purchase, vs the corpus max ts),
    Frequency (purchase count) and Monetary (2dp purchase value sum),
    each scored into quintiles — the classic lifecycle-marketing
    table.

    Default path (what the oracle pins): EXACT quintiles, but never
    through ``ntile() OVER (ORDER BY ...)`` — an unpartitioned window
    drags the whole user relation to one task at 10⁹ users. The three
    metrics go to long format (user, metric, value — descending
    metrics negated so every rank is ascending with the user_id
    tiebreak), operators/ranking.py exact_group_ntile assigns tiles
    via the salted-prefix-sum recipe (value-binned shards + partitioned
    local ranks + broadcast shard offsets + ntile's closed-form
    boundary arithmetic), and one pivot-back join restores the wide
    shape. Bit-identical to the single-node ntile (ties break on
    user_id in both engines), registry plan-audited to contain no
    unpartitioned WindowExec.

    ``approx_thresholds=True`` is the cheaper 100 TB variant when tile
    EDGES may be approximate: quintile cut points from ONE mergeable
    histogram pass (operators/sketches.py histogram_quantiles — the
    approx_quantiles_hist machinery), broadcast, score = 1 + #cuts
    strictly below the value. No ranking shuffle at all. Semantics
    shift deliberately from rank-quintiles to VALUE-quintiles (equal
    values always share a score — what ntile cannot give under ties);
    pytest pins the structure (ties identical, metric-monotone) and
    bounds each cut to one histogram bin of the exact percentile."""
    from ..functions.timeutil import epoch_micros
    from ..operators.ranking import exact_group_ntile

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase")
    ref = p.agg(F.max("ts").alias("_ref"))
    per = (p.groupBy("user_id")
           .agg(F.max("ts").alias("last_ts"),
                F.count(F.lit(1)).alias("frequency"),
                (F.round(F.sum("value"), 2) + F.lit(0.0))
                .alias("monetary")))
    base = (per.crossJoin(F.broadcast(ref))
            .select("user_id",
                    ((epoch_micros(F.col("_ref"))
                      - epoch_micros(F.col("last_ts")))
                     / F.lit(86400_000_000)).cast("int")
                    .alias("recency_days"),
                    "frequency", "monetary"))
    # long format; DESC metrics negated (exact: ints < 2^53, IEEE
    # doubles) so every ntile runs ASC with the user_id tiebreak
    long = base.select(
        "user_id",
        F.explode(F.array(
            F.struct(F.lit("r").alias("m"),
                     F.col("recency_days").cast("double").alias("v")),
            F.struct(F.lit("f").alias("m"),
                     (-F.col("frequency")).cast("double").alias("v")),
            F.struct(F.lit("m").alias("m"),
                     (-F.col("monetary")).alias("v")))).alias("mv")) \
        .select("user_id", F.col("mv.m").alias("metric"),
                F.col("mv.v").alias("val"))
    if approx_thresholds:
        from ..operators.sketches import histogram_quantiles
        cuts = histogram_quantiles(long, ["metric"], "val",
                                   [0.2, 0.4, 0.6, 0.8],
                                   RFM_THRESHOLD_BINS)
        thr = (cuts.groupBy("metric")
               .agg(F.sort_array(F.collect_list("estimate_raw"))
                    .alias("cuts")))
        scored = (long.join(F.broadcast(thr), "metric")
                  .select("user_id", "metric",
                          (F.lit(1) + F.aggregate(
                              "cuts", F.lit(0),
                              lambda acc, c: acc + F.when(
                                  F.col("val") > c, 1).otherwise(0)))
                          .cast("int").alias("tile")))
    else:
        scored = exact_group_ntile(long, "metric", "val", "user_id",
                                   n_tiles=5)
    scores = scored.groupBy("user_id").agg(
        F.max(F.when(F.col("metric") == "r", F.col("tile")))
        .cast("int").alias("r_score"),
        F.max(F.when(F.col("metric") == "f", F.col("tile")))
        .cast("int").alias("f_score"),
        F.max(F.when(F.col("metric") == "m", F.col("tile")))
        .cast("int").alias("m_score"))
    return (base.join(scores, "user_id")
            .select("user_id", "recency_days", "frequency", "monetary",
                    "r_score", "f_score", "m_score"))


SQL_RFM_SCORES = """
WITH p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
), ref AS (
  SELECT max(ts) AS r FROM p
), per AS (
  SELECT user_id, max(ts) AS last_ts,
         CAST(count(*) AS BIGINT) AS frequency,
         ROUND(CAST(sum(value) AS DOUBLE), 2) + 0 AS monetary
  FROM p GROUP BY user_id
), base AS (
  SELECT user_id,
         CAST(epoch_us(ref.r - last_ts) // 86400000000 AS INT)
           AS recency_days,
         frequency, monetary
  FROM per CROSS JOIN ref
)
SELECT user_id, recency_days, frequency, monetary,
       CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS INT)
         AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT)
         AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INT)
         AS m_score
FROM base
"""


# ----------------------------------------------------- purchase attribution

ATTR_WINDOW_US = 1800 * 1_000_000  # 30-minute last-touch window


def q_purchase_attribution(spark, sf_dir):
    """Last-touch attribution: for every purchase event, the most
    recent preceding view/click by the same user, credited only if it
    happened within 30 minutes — the conversion-credit join every
    event-analytics stack runs, here as the linear-cost as-of union
    trick (one shuffle on user, one ordered pass; no range-join
    explosion).

    Touches pre-aggregate to one row per (user, ts) (max event_type)
    so an as-of tie cannot pick engine-dependent winners; touch age
    is EXACT BIGINT microseconds (epoch_micros) because a fractional-
    seconds double difference can flip the 30-minute boundary by one
    ulp between engines."""
    from ..functions.timeutil import epoch_micros
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("event_id", "user_id", "ts"))
    touches = (ev.filter(F.col("event_type").isin("view", "click"))
               .groupBy("user_id", "ts")
               .agg(F.max("event_type").alias("touch_type"))
               .select("user_id", "ts",
                       "touch_type", F.col("ts").alias("touch_ts")))
    j = asof_join(purchases, touches, key="user_id", left_ts="ts",
                  right_ts="ts", right_vals=["touch_type", "touch_ts"])
    age_us = (epoch_micros(F.col("ts"))
              - epoch_micros(F.col("touch_ts_asof")))
    ok = F.col("touch_ts_asof").isNotNull() & (age_us <= ATTR_WINDOW_US)
    return j.select(
        "event_id", "user_id", "ts",
        F.when(ok, F.col("touch_type_asof")).alias("attributed_type"),
        F.when(ok, age_us).cast("long").alias("age_us"))


SQL_PURCHASE_ATTRIBUTION = f"""
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), touches AS (
  SELECT user_id, ts, max(event_type) AS touch_type
  FROM events WHERE event_type IN ('view', 'click')
  GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts,
       CASE WHEN t.ts IS NOT NULL
             AND epoch_us(p.ts - t.ts) <= {ATTR_WINDOW_US}
            THEN t.touch_type END AS attributed_type,
       CASE WHEN t.ts IS NOT NULL
             AND epoch_us(p.ts - t.ts) <= {ATTR_WINDOW_US}
            THEN CAST(epoch_us(p.ts - t.ts) AS BIGINT) END AS age_us
FROM purchases p
ASOF LEFT JOIN touches t ON p.user_id = t.user_id AND p.ts >= t.ts
"""


# -------------------------------------------------------- association rules

RULE_MIN_USERS = 5


def q_association_rules(spark, sf_dir):
    """Market-basket association rules over per-user event-type sets:
    for every ordered pair (antecedent → consequent), support,
    confidence and lift — the co-occurrence mining shape (who views
    also purchases?).

    Plan: one distinct (user, type) shuffle; the pair space is a
    self-equi-join ON USER (fanout ≤ types² per user, types is small
    by domain); three integer aggregates. Every ratio divides
    engine-identical BIGINTs — unrounded, bit-identical.
    """
    ev = load_table(spark, sf_dir, "events")
    u = ev.select("user_id", "event_type").distinct()
    n_users = u.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users"))
    item = u.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_item"))
    a = u.select("user_id", F.col("event_type").alias("antecedent"))
    b = u.select("user_id", F.col("event_type").alias("consequent"))
    pair = (a.join(b, "user_id")
            .filter(F.col("antecedent") != F.col("consequent"))
            .groupBy("antecedent", "consequent")
            .agg(F.count(F.lit(1)).alias("n_both"))
            .filter(F.col("n_both") >= RULE_MIN_USERS))
    na = item.select(F.col("event_type").alias("antecedent"),
                     F.col("n_item").alias("n_ante"))
    nc = item.select(F.col("event_type").alias("consequent"),
                     F.col("n_item").alias("n_cons"))
    return (pair.join(F.broadcast(na), "antecedent")
            .join(F.broadcast(nc), "consequent")
            .crossJoin(F.broadcast(n_users))
            .select("antecedent", "consequent", "n_both",
                    (F.col("n_both").cast("double") / F.col("n_users"))
                    .alias("support"),
                    (F.col("n_both").cast("double") / F.col("n_ante"))
                    .alias("confidence"),
                    (F.col("n_both").cast("double") * F.col("n_users")
                     / (F.col("n_ante") * F.col("n_cons")))
                    .alias("lift")))


SQL_ASSOCIATION_RULES = f"""
WITH u AS (
  SELECT DISTINCT user_id, event_type FROM events
), n AS (
  SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM u
), item AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_item
  FROM u GROUP BY event_type
), pair AS (
  SELECT a.event_type AS antecedent, b.event_type AS consequent,
         CAST(count(*) AS BIGINT) AS n_both
  FROM u a JOIN u b ON a.user_id = b.user_id
  WHERE a.event_type != b.event_type
  GROUP BY 1, 2
  HAVING count(*) >= {RULE_MIN_USERS}
)
SELECT antecedent, consequent, n_both,
       CAST(n_both AS DOUBLE) / n.n_users AS support,
       CAST(n_both AS DOUBLE) / na.n_item AS confidence,
       CAST(n_both AS DOUBLE) * n.n_users / (na.n_item * nc.n_item)
         AS lift
FROM pair
JOIN item na ON na.event_type = pair.antecedent
JOIN item nc ON nc.event_type = pair.consequent
CROSS JOIN n
"""


# ------------------------------------------------------ histogram quantiles

HQ_BINS = 128
HQ_QUANTILES = [0.5, 0.9, 0.99]


def q_approx_quantiles_hist(spark, sf_dir):
    """Mergeable-histogram approximate quantiles per product over tick
    prices: ONE pass builds a 128-bin equal-width histogram (bin
    counts partial-aggregate map-side — the sketch a 100 TB scan can
    afford), then p50/p90/p99 interpolate inside the first bin whose
    cumulative count reaches ceil(q·n). Deterministic by
    construction (integer bin counts + closed-form interpolation on
    engine-identical min/max), so unlike t-digest/HLL it value-hashes
    cross-engine. Accuracy pytest-bounded by one bin width vs exact
    percentiles. Core factored to operators/sketches.py
    histogram_quantiles (shared with rfm_scores' threshold path)."""
    from ..operators.sketches import histogram_quantiles

    ev = ticks(spark, sf_dir)
    hq = histogram_quantiles(ev, ["product_id"], "price",
                             HQ_QUANTILES, HQ_BINS)
    return hq.select(
        "product_id", F.col("q").alias("quantile"), "n",
        (F.round(F.col("estimate_raw"), 6) + F.lit(0.0))
        .alias("estimate"))


def _sql_hq() -> str:
    # CAST to DOUBLE: bare VALUES literals are DECIMAL in DuckDB —
    # wrong Arrow schema AND exact-decimal ceil(q*n) where Spark
    # computes binary-double q*n (ceil differs when the true product
    # is an integer, e.g. 0.9*10: decimal 9 vs double 9.0000000002)
    qvals = ", ".join(f"(CAST({q} AS DOUBLE))" for q in HQ_QUANTILES)
    return SQL_BASE + f"""
, bounds AS (
  SELECT product_id, min(price) AS lo, max(price) AS hi,
         CAST(count(*) AS BIGINT) AS n
  FROM ticks GROUP BY product_id
), binned AS (
  SELECT t.product_id, b.lo, b.hi, b.n,
         CASE WHEN b.hi > b.lo
              THEN least({HQ_BINS - 1},
                         CAST(floor((t.price - b.lo) / (b.hi - b.lo)
                                    * {HQ_BINS}) AS INT))
              ELSE 0 END AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM ticks t JOIN bounds b USING (product_id)
  GROUP BY 1, 2, 3, 4, 5
), cum AS (
  SELECT *, CAST(sum(cnt) OVER (PARTITION BY product_id ORDER BY bin
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS cum
  FROM binned
), qs(q) AS (VALUES {qvals}),
hit AS (
  SELECT c.product_id, c.lo, c.hi, c.n, c.bin, c.cnt, c.cum, qs.q,
         greatest(1, CAST(ceil(qs.q * c.n) AS BIGINT)) AS target
  FROM cum c CROSS JOIN qs
)
SELECT product_id, q AS quantile, n,
       ROUND(CASE WHEN hi > lo
                  THEN lo + (bin + CAST(target - (cum - cnt) AS DOUBLE)
                                   / cnt)
                           * (hi - lo) / {HQ_BINS}
                  ELSE lo END, 6) + 0 AS estimate
FROM hit
WHERE cum >= target AND cum - cnt < target
"""


SQL_APPROX_QUANTILES_HIST = _sql_hq()


# -------------------------------------------------------------- OLAP rollup

def q_sales_rollup(spark, sf_dir):
    """Hierarchical subtotal cube over lineitem — ship-year ×
    returnflag with year-level and grand totals in one pass
    (GROUP BY ROLLUP): the reporting shape Spark's Expand operator
    executes as a single scan + one aggregation, no per-level
    re-reads. grouping_id disambiguates NULL group keys from real
    NULLs on both engines (same bit convention: leftmost key = MSB).
    Money sums round 2dp — the quantum that dominates cross-engine
    summation-order error at ~1e9 magnitudes."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select(
        F.year("l_shipdate").alias("ship_year"), "l_returnflag",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("_rev"))
    return (df.rollup("ship_year", "l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 (F.round(F.sum("l_quantity"), 2) + F.lit(0.0))
                 .alias("sum_qty"),
                 (F.round(F.sum("_rev"), 2) + F.lit(0.0))
                 .alias("revenue"),
                 F.grouping_id().cast("int").alias("grouping_level")))


SQL_SALES_ROLLUP = """
SELECT year(l_shipdate) AS ship_year, l_returnflag,
       count(*) AS n_items,
       ROUND(CAST(sum(l_quantity) AS DOUBLE), 2) + 0 AS sum_qty,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 2) + 0 AS revenue,
       CAST(GROUPING(year(l_shipdate), l_returnflag) AS INT)
         AS grouping_level
FROM lineitem
GROUP BY ROLLUP(year(l_shipdate), l_returnflag)
"""


# ---------------------------------------------------------------- OLAP cube

def q_sales_cube(spark, sf_dir):
    """Full CUBE over (returnflag, linestatus): all four grouping-set
    levels — the cross-tab companion to sales_rollup's hierarchy
    (ROLLUP emits the prefix lattice, CUBE the full powerset; both
    are ONE Expand + one aggregation in Spark, never per-level
    re-scans). 2dp money sums, grouping_id level marker."""
    li = load_table(spark, sf_dir, "lineitem")
    df = li.select(
        "l_returnflag", "l_linestatus", "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("_rev"))
    return (df.cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 (F.round(F.sum("l_quantity"), 2) + F.lit(0.0))
                 .alias("sum_qty"),
                 (F.round(F.sum("_rev"), 2) + F.lit(0.0))
                 .alias("revenue"),
                 F.grouping_id().cast("int").alias("grouping_level")))


SQL_SALES_CUBE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       ROUND(CAST(sum(l_quantity) AS DOUBLE), 2) + 0 AS sum_qty,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 2) + 0 AS revenue,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT)
         AS grouping_level
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# ------------------------------------------------ data layout & runtime filters

ZO_ORIGIN_US = 1_704_067_200 * 1_000_000   # 2024-01-01 00:00:00 UTC
ZO_DAY_US = 86_400 * 1_000_000
ZO_VAL_BUCKET = 20.0


def q_zorder_layout(spark, sf_dir):
    """OPTIMIZE ZORDER audit: events clustered by the Morton interleave
    of (value ventile, event day), split into 64 z-ranges, one
    bounding-box row per split — the min/max stats a lakehouse planner
    prunes files with. A (value-range, time-range) predicate skips
    every split whose box misses it; a single-column sort layout can
    only prune on its leading column (consumer.go's product/date
    archive layout is that one-dimensional case). The global rank
    behind the split assignment runs DISTRIBUTED (shard by z's high
    bits + cumulative shard offsets — operators/layout.py), not as an
    unpartitioned window; the oracle's single-node ntile is
    bit-identical by ntile's own boundary arithmetic."""
    from ..functions.timeutil import epoch_micros
    from ..operators import layout as L

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("e_us", epoch_micros(F.col("ts")))
    xb = F.pmod(F.floor(F.col("value") / ZO_VAL_BUCKET).cast("long"),
                F.lit(1 << L.ZBITS))
    # FLOOR division (all-integer: subtract the nonnegative pmod
    # remainder, then the division is exact), matching the oracle's
    # DuckDB `//`: Spark's integer `div` truncates toward zero, which
    # would bucket any pre-origin timestamp one day high (latent
    # today — testdata starts at the origin — but wrong the first
    # time older data appears)
    off = F.col("e_us") - F.lit(ZO_ORIGIN_US)
    day = (off - F.pmod(off, F.lit(ZO_DAY_US))) / F.lit(ZO_DAY_US)
    yb = F.pmod(day.cast("long"), F.lit(1 << L.ZBITS))
    return L.zorder_stats(ev, xb, yb, F.col("event_id"))


def _sql_zorder_layout() -> str:
    from ..operators.layout import ZSPLITS, sql_interleave

    zbits_mod = 1 << 10
    return f"""
WITH b AS (
  SELECT ((CAST(floor(value / {ZO_VAL_BUCKET}) AS BIGINT)
           % {zbits_mod}) + {zbits_mod}) % {zbits_mod} AS xb,
         ((((epoch_us(ts) - {ZO_ORIGIN_US}) // {ZO_DAY_US})
           % {zbits_mod}) + {zbits_mod}) % {zbits_mod} AS yb,
         event_id AS tb
  FROM events
), z AS (
  SELECT xb, yb, tb, {sql_interleave('xb', 'yb')} AS z FROM b
), r AS (
  SELECT xb, yb,
         CAST(ntile({ZSPLITS}) OVER (ORDER BY z, tb) AS INT) AS split_id
  FROM z
)
SELECT split_id, CAST(count(*) AS BIGINT) AS n_rows,
       min(xb) AS min_x, max(xb) AS max_x,
       min(yb) AS min_y, max(yb) AS max_y,
       (max(xb) - min(xb) + 1) * (max(yb) - min(yb) + 1) AS box_area
FROM r GROUP BY split_id
"""


SQL_ZORDER_LAYOUT = _sql_zorder_layout()

BLOOM_PRICE_MIN = 480000.0


def q_bloom_semi_join(spark, sf_dir):
    """Runtime-filter pattern, explicit: lineitem semi-joined to the
    top-price ~5% of orders THROUGH a broadcast Bloom filter built from
    the build side's keys (operators/layout.py; one single-row
    broadcast map + row-local bit tests) — the probe side drops
    non-matching rows before any shuffle, then an exact semi-join
    removes bloom false positives, so the result equals the plain
    semi-join (the oracle) bit-for-bit. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    the ~5% that can match; Spark's InjectRuntimeFilter applies the
    same trick optimizer-side, here it is a first-class, plan-audited
    operator. Aggregated to the Q1-style pricing summary so the output
    stays small."""
    from ..operators.layout import bloom_semi_join

    li = load_table(spark, sf_dir, "lineitem")
    od = (load_table(spark, sf_dir, "orders")
          .filter(F.col("o_totalprice") > BLOOM_PRICE_MIN)
          .select("o_orderkey"))
    hit = bloom_semi_join(li, od, "l_orderkey", "o_orderkey")
    return (hit.groupBy("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue")))


SQL_BLOOM_SEMI_JOIN = f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_items,
       ROUND(sum(l_quantity), 2) + 0 AS sum_qty,
       ROUND(sum(l_extendedprice * (1 - l_discount)), 2) + 0 AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > {BLOOM_PRICE_MIN})
GROUP BY l_returnflag, l_linestatus
"""


KMV_SET_A, KMV_SET_B = "purchase", "view"


def q_kmv_set_ops(spark, sf_dir):
    """Theta-sketch-style audience overlap: distinct purchasers vs
    viewers, their union, their INTERSECTION, and the Jaccard overlap
    — all from two k=64 KMV sketches built in one pass over events
    (operators/sketches.py). The reference's analysis_tools.py answers
    overlap questions with exact per-batch distincts; at 100 TB the
    sketch replaces that with two 64-long arrays and no distinct-join.
    Every step before the final division is integer compares on int64
    hashes, so the whole pipeline value-hashes across engines."""
    from ..operators.sketches import kmv_audience_overlap

    ev = load_table(spark, sf_dir, "events")
    return kmv_audience_overlap(ev, type_a=KMV_SET_A, type_b=KMV_SET_B,
                                k=KMV_K)


def _sql_kmv_set_ops(k: int = KMV_K) -> str:
    full = float(1 << 60)
    km1 = float(k - 1)

    def est(n: str, kth: str) -> str:
        return (f"CASE WHEN {n} >= {k} THEN {km1!r} * {full!r} / {kth} "
                f"ELSE CAST({n} AS DOUBLE) END")

    return f"""
WITH hashes AS (
  SELECT DISTINCT event_type AS audience,
         {sql_hash60("CAST(user_id AS VARCHAR)", "kmv")} AS h
  FROM events WHERE event_type IN ('{KMV_SET_A}', '{KMV_SET_B}')
), ranked AS (
  SELECT audience, h,
         row_number() OVER (PARTITION BY audience ORDER BY h) AS rn
  FROM hashes
), mins AS (
  SELECT audience, h, rn FROM ranked WHERE rn <= {k}
), stats AS (
  SELECT audience, CAST(count(*) AS BIGINT) AS n,
         max(CASE WHEN rn = {k} THEN h END) AS kth
  FROM mins GROUP BY audience
), th AS (
  SELECT least(
    (SELECT CASE WHEN n >= {k} THEN kth ELSE {1 << 60} END
       FROM stats WHERE audience = '{KMV_SET_A}'),
    (SELECT CASE WHEN n >= {k} THEN kth ELSE {1 << 60} END
       FROM stats WHERE audience = '{KMV_SET_B}')) AS theta
), inter AS (
  SELECT CAST(count(*) AS BIGINT) AS n_common
  FROM mins a, mins b, th
  WHERE a.audience = '{KMV_SET_A}' AND b.audience = '{KMV_SET_B}'
    AND a.h = b.h AND a.h < th.theta
), u AS (
  SELECT h, row_number() OVER (ORDER BY h) AS rn
  FROM (SELECT DISTINCT h FROM mins)
), ustats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_u,
         max(CASE WHEN rn = {k} THEN h END) AS kth_u
  FROM u WHERE rn <= {k}
)
SELECT '{KMV_SET_A}' AS audience_a, '{KMV_SET_B}' AS audience_b,
       round({est('pa.n', 'pa.kth')}, 3) + 0 AS est_a,
       round({est('pv.n', 'pv.kth')}, 3) + 0 AS est_b,
       round({est('n_u', 'kth_u')}, 3) + 0 AS est_union,
       n_common,
       round(CAST(n_common AS DOUBLE) * {full!r} / theta, 3) + 0
         AS est_intersection,
       round((CAST(n_common AS DOUBLE) * {full!r} / theta)
             / ({est('n_u', 'kth_u')}), 6) + 0 AS jaccard_est
FROM (SELECT n, kth FROM stats WHERE audience = '{KMV_SET_A}') pa,
     (SELECT n, kth FROM stats WHERE audience = '{KMV_SET_B}') pv,
     th, inter, ustats
"""


SQL_KMV_SET_OPS = _sql_kmv_set_ops()


SPARK_QUERIES_ANALYTICS: dict[
        str, Callable[[SparkSession, str], DataFrame]] = {
    "sessionize": q_sessionize,
    "daily_active_users": q_daily_active_users,
    "approx_distinct_users": q_approx_distinct_users,
    "price_quantiles": q_price_quantiles,
    "ngram_doc_frequency": q_ngram_doc_frequency,
    "candle_resample_salted": q_candle_resample_salted,
    "range_join": q_range_join,
    "event_type_pivot": q_event_type_pivot,
    "volume_rollup": q_volume_rollup,
    "funnel": q_funnel,
    "tfidf_top_terms": q_tfidf_top_terms,
    "value_histogram": q_value_histogram,
    "price_anomalies": q_price_anomalies,
    "sales_rollup": q_sales_rollup,
    "association_rules": q_association_rules,
    "approx_quantiles_hist": q_approx_quantiles_hist,
    "purchase_attribution": q_purchase_attribution,
    "event_paths": q_event_paths,
    "rfm_scores": q_rfm_scores,
    "session_window_agg": q_session_window_agg,
    "sales_cube": q_sales_cube,
    "kmv_distinct_users": q_kmv_distinct_users,
    "kmv_weekly_merge": q_kmv_weekly_merge,
    "zorder_layout": q_zorder_layout,
    "bloom_semi_join": q_bloom_semi_join,
    "kmv_set_ops": q_kmv_set_ops,
}

ORACLE_SQL_ANALYTICS: dict[str, str] = {
    "sessionize": SQL_SESSIONIZE,
    "daily_active_users": SQL_DAU,
    # approx_distinct_users: rows-only (engine-specific HLL sketches)
    "price_quantiles": SQL_PRICE_QUANTILES,
    "ngram_doc_frequency": SQL_NGRAM_DOC_FREQUENCY,
    "candle_resample_salted": SQL_CANDLE_RESAMPLE,
    "range_join": SQL_RANGE_JOIN,
    "event_type_pivot": SQL_EVENT_TYPE_PIVOT,
    "volume_rollup": SQL_VOLUME_ROLLUP,
    "funnel": SQL_FUNNEL,
    "tfidf_top_terms": SQL_TFIDF,
    "value_histogram": SQL_VALUE_HISTOGRAM,
    "price_anomalies": SQL_PRICE_ANOMALIES,
    "sales_rollup": SQL_SALES_ROLLUP,
    "association_rules": SQL_ASSOCIATION_RULES,
    "approx_quantiles_hist": SQL_APPROX_QUANTILES_HIST,
    "purchase_attribution": SQL_PURCHASE_ATTRIBUTION,
    "event_paths": SQL_EVENT_PATHS,
    "rfm_scores": SQL_RFM_SCORES,
    "session_window_agg": SQL_SESSION_WINDOW_AGG,
    "sales_cube": SQL_SALES_CUBE,
    "kmv_distinct_users": SQL_KMV_DISTINCT_USERS,
    "kmv_weekly_merge": SQL_KMV_WEEKLY_MERGE,
    "zorder_layout": SQL_ZORDER_LAYOUT,
    "bloom_semi_join": SQL_BLOOM_SEMI_JOIN,
    "kmv_set_ops": SQL_KMV_SET_OPS,
}
