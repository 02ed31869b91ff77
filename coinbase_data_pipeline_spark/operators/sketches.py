"""Mergeable probabilistic sketches beyond the KMV cardinality pair
(plans/catalog_analytics.py): theta-style KMV set operations and a
count-min frequency sketch.

Both follow the repo's sketch doctrine: deterministic (hash60 — a
portable md5-derived 60-bit hash both engines compute identically),
bounded per-group state (k-sized arrays / a fixed d×w counter grid),
mergeable by construction (k-min union-trim; cell-wise counter sums —
i.e. map-side combinable partial aggregates), and therefore fully
SQL-oracle-checkable, unlike register-max sketches (HLL).

Reference parity: the reference has no sketch layer — its analytics
(analysis_tools.py) recompute distincts/frequencies exactly per batch.
These operators are the 100 TB replacements: audience overlap without
a distinct-join, heavy hitters without a full token group-by shuffle
to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import hash60, tokens

FULL60 = float(1 << 60)  # hash60's range, exactly representable


def _kmv_sketch(hashes: DataFrame, group: str, k: int,
                shards: int = 256) -> DataFrame:
    """(group, mins: k smallest hashes) via a sharded partial
    aggregate: per (group, h % shards) collect the shard's distinct
    hashes, sort, and slice to k — then one k-sized merge per group.
    The partial stage's aggregation buffer holds each shard's full
    distinct-hash list until the slice (it is the SHARD FANOUT, not
    the buffer, that bounds skew: a hot group's hashes spread over
    `shards` buckets, so no single task ever owns the group's whole
    distinct set; the k-long bound applies from the slice onward).
    k-min is merge-invariant, so shard→group produces the same sketch
    as a direct global k-min.
    """
    shard = (F.col("h") % shards).alias("shard")
    partial = (hashes.select(group, shard, "h")
               .groupBy(group, "shard")
               .agg(F.slice(F.array_sort(F.collect_list("h")), 1,
                            k).alias("mins")))
    return (partial.groupBy(group)
            .agg(F.slice(F.array_sort(F.flatten(
                F.collect_list("mins"))), 1, k).alias("mins")))


def _kmv_est(mins: Column, k: int) -> Column:
    """Standard KMV estimator: (k−1)·2^60 / kth-min above k tracked
    hashes, exact count below."""
    n = F.size(mins)
    kth = F.element_at(mins, k)
    return F.when(n >= k,
                  F.lit(float(k - 1)) * F.lit(FULL60) / kth) \
        .otherwise(n.cast("double"))


def kmv_audience_overlap(events: DataFrame, *, type_a: str,
                         type_b: str, k: int = 64) -> DataFrame:
    """Theta-sketch-style set operations over two event audiences:
    estimated distinct users of each, of the union, of the
    INTERSECTION, and the Jaccard overlap — one pass over events, two
    k-sized sketches, no distinct-join.

    The intersection uses the theta recipe (Dasgupta et al., "Theta
    Sketch Framework"): θ = min(θ_A, θ_B) where θ is a sketch's kth
    hash (2^60 when the sketch is exact, i.e. tracked < k); each
    sketch's entries below θ are a uniform hash-sample of its set at
    rate θ/2^60, so |sample_A ∩ sample_B| / (θ/2^60) estimates
    |A ∩ B|. Every step is integer compares on int64 hashes — the
    float division happens once at the end, so the whole pipeline
    value-hashes across engines.
    """
    ev = events.filter(F.col("event_type").isin([type_a, type_b]))
    hashes = (ev.select(F.col("event_type").alias("audience"),
                        hash60(F.col("user_id").cast("string"),
                               "kmv").alias("h"))
              .distinct())
    sk = _kmv_sketch(hashes, "audience", k)
    a = (sk.filter(F.col("audience") == type_a)
         .select(F.col("mins").alias("mins_a")))
    b = (sk.filter(F.col("audience") == type_b)
         .select(F.col("mins").alias("mins_b")))
    row = a.crossJoin(F.broadcast(b))  # 1×1: broadcast-scalar pattern

    def theta(mins: Column) -> Column:
        return F.when(F.size(mins) >= k,
                      F.element_at(mins, k)) \
            .otherwise(F.lit(1 << 60).cast("long"))

    th = F.least(theta(F.col("mins_a")), theta(F.col("mins_b")))
    row = row.withColumn("theta", th)
    below = lambda c: F.filter(c, lambda x: x < F.col("theta"))
    inter = F.array_intersect(below(F.col("mins_a")),
                              below(F.col("mins_b")))
    union_mins = F.slice(F.array_sort(F.array_distinct(
        F.concat(F.col("mins_a"), F.col("mins_b")))), 1, k)
    n_inter = F.size(inter)
    est_inter = n_inter.cast("double") * F.lit(FULL60) / F.col("theta")
    est_union = _kmv_est(union_mins, k)
    return row.select(
        F.lit(type_a).alias("audience_a"),
        F.lit(type_b).alias("audience_b"),
        (F.round(_kmv_est(F.col("mins_a"), k), 3) + F.lit(0.0))
        .alias("est_a"),
        (F.round(_kmv_est(F.col("mins_b"), k), 3) + F.lit(0.0))
        .alias("est_b"),
        (F.round(est_union, 3) + F.lit(0.0)).alias("est_union"),
        n_inter.cast("long").alias("n_common"),
        (F.round(est_inter, 3) + F.lit(0.0)).alias("est_intersection"),
        (F.round(est_inter / est_union, 6) + F.lit(0.0))
        .alias("jaccard_est"))


def cms_heavy_hitters(docs: DataFrame, *, d: int = 4, w: int = 4096,
                      min_share: float = 0.002,
                      text_col: str = "text") -> DataFrame:
    """Count-min-sketch heavy hitters over the token stream: tokens
    whose CMS estimate is ≥ `min_share` of all tokens, with the exact
    count alongside so the sketch's one-sided error (est ≥ true,
    est ≤ true + εN w.h.p.) is visible in the output.

    The sketch is a fixed d×w counter grid (d seeded hash60 rows):
    built by a (row, cell) groupBy — a map-side-combinable partial
    aggregate whose reduce state is ≤ d·w longs per task regardless of
    corpus size — then broadcast (≤ d·w rows) to estimate: each
    candidate token takes the MIN of its d cells. CMS never misses a
    heavy hitter (no false negatives at the estimate level), so
    filtering on the estimate is the standard scale recipe: the exact
    counts here exist only to exhibit the error and would be dropped
    at 100 TB.
    """
    toks = docs.select(F.explode(tokens(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # counter updates are additive, so building cells from the exact
    # counts is identical to hashing the raw stream — and shuffles
    # distinct tokens, not token instances
    cand = counts.select(
        "tok", "n",
        F.posexplode(F.array(*[
            F.pmod(hash60(F.col("tok"), f"cms{i}"), F.lit(w))
            for i in range(d)])).alias("r", "c"))
    cells = (cand.groupBy("r", "c")
             .agg(F.sum("n").alias("cellsum")))
    est = (cand.join(F.broadcast(cells), ["r", "c"])
           .groupBy("tok", "n")
           .agg(F.min("cellsum").alias("cms_est")))
    total = counts.agg(F.sum("n").alias("total"))  # 1 row
    return (est.crossJoin(F.broadcast(total))
            .filter(F.col("cms_est")
                    >= F.lit(min_share) * F.col("total").cast("double"))
            .select("tok", F.col("n").cast("long").alias("n"),
                    F.col("cms_est").cast("long").alias("cms_est"),
                    (F.col("cms_est") - F.col("n")).cast("long")
                    .alias("overestimate")))


# ------------------------------------------- mergeable histogram quantiles

def histogram_quantiles(df: DataFrame, group_cols: list[str], val: str,
                        quantiles: list[float], bins: int) -> DataFrame:
    """Approximate per-group quantiles from ONE equal-width-histogram
    pass (the mergeable sketch a 100 TB scan can afford): per group,
    min/max/count bound the bins; integer bin counts partial-aggregate
    map-side; each requested quantile interpolates inside the first
    bin whose cumulative count reaches ceil(q·n). Deterministic by
    construction (integer counts + closed-form interpolation on
    engine-identical min/max) — unlike t-digest it value-hashes
    cross-engine, which is why plans/catalog_analytics.py's
    approx_quantiles_hist can oracle-pin it exactly.

    Consumers: approx_quantiles_hist (per-product price percentiles)
    and rfm_scores' 100 TB threshold path (quintile cuts per metric).

    Returns one row per (group, quantile): ``group_cols + [q, n,
    estimate_raw]`` — the caller rounds/aliases (estimate_raw is the
    unrounded interpolated value).
    """
    from pyspark.sql import Window

    bounds = (df.groupBy(*group_cols)
              .agg(F.min(val).alias("lo"), F.max(val).alias("hi"),
                   F.count(F.lit(1)).alias("n")))
    # hi == lo (degenerate one-value key) → everything in bin 0; the
    # unguarded division would be NULL (ansi off) vs inf (DuckDB)
    bin_expr = F.when(
        F.col("hi") > F.col("lo"),
        F.least(F.lit(bins - 1),
                F.floor((F.col(val) - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * bins).cast("int"))).otherwise(F.lit(0))
    binned = (df.join(F.broadcast(bounds), group_cols)
              .select(*group_cols, "lo", "hi", "n", bin_expr.alias("bin"))
              .groupBy(*group_cols, "lo", "hi", "n", "bin")
              .agg(F.count(F.lit(1)).alias("cnt")))
    w = (Window.partitionBy(*group_cols).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = binned.withColumn("cum", F.sum("cnt").over(w))
    qlit = F.explode(F.array(*[F.lit(q) for q in quantiles])).alias("q")
    with_q = cum.select("*", qlit)
    target = F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n")))
    hit = (with_q
           .withColumn("target", target)
           .filter((F.col("cum") >= F.col("target"))
                   & (F.col("cum") - F.col("cnt") < F.col("target"))))
    frac = ((F.col("target") - (F.col("cum") - F.col("cnt")))
            .cast("double") / F.col("cnt"))
    est = F.when(F.col("hi") > F.col("lo"),
                 F.col("lo") + (F.col("bin") + frac)
                 * (F.col("hi") - F.col("lo")) / bins) \
           .otherwise(F.col("lo"))
    return hit.select(*group_cols, "q", "n", est.alias("estimate_raw"))
