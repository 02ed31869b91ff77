"""Distributed exact ranking: global ntile without an unpartitioned
window.

``ntile(P) OVER (ORDER BY ...)`` is the classic scale killer — Spark
plans it as a single-partition WindowExec, so the whole relation moves
to ONE task (at 10⁹ users that is the job). :func:`exact_group_ntile`
computes the *identical* tile assignment with the salted-prefix-sum
recipe (the pattern :func:`..operators.layout.zorder_stats` pins for
Morton ranks, generalised to any orderable column):

1. per group, min/max/count — a tiny broadcastable aggregate;
2. shard every row by its equal-width value bin (shard id is monotone
   in the sort key, and ties share a bin by construction, so shard
   order ⊕ in-shard order IS the global order);
3. rank locally per (group, shard) — a *partitioned* window;
4. add each shard's cumulative row offset (a ≤ groups × shards-row
   prefix aggregate, broadcast back);
5. map the exact global rank to its tile with ntile's closed-form
   boundary arithmetic.

The big relation only ever shuffles by (group, shard); the result is
bit-identical to the single-node ``ntile`` (pytest- and oracle-pinned
by rfm_scores).

Skew caveat (same as zorder_stats): equal-width bins concentrate
heavy-tailed values in few shards. That bounds the win, not the
correctness — worst case degrades toward the single-partition sort,
typical tails still spread across many bins. Quantile-spaced shard
cuts (via :func:`..operators.sketches.histogram_quantiles`) are the
upgrade path if a profile shows it.

Reference analogue: the reference has no distributed ranker — its RFM
shape is the pandas ``qcut``-style quintile scoring a single host
computes (Crypto-TS-Model-master/src/data_loader.py feature scaling
does the same fit-on-whole-relation trick); this operator is what that
becomes when the relation stops fitting one host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

NTILE_SHARDS = 1024


def exact_group_rank(df: DataFrame, group: str, val: str, tiebreak: str,
                     *, shards: int = NTILE_SHARDS,
                     out: str = "_rank") -> DataFrame:
    """Exact ``row_number() OVER (PARTITION BY group ORDER BY val,
    tiebreak)`` without an unpartitioned window — steps 1-4 of the
    module recipe (shard by equal-width value bin, rank per shard,
    add broadcast shard offsets). Same contracts as
    :func:`exact_group_ntile` (non-null val, unique (val, tiebreak)
    per group). Returns the input columns + `out` (long, 1-based)
    plus the `_n` group count (callers needing closed-form boundary
    arithmetic, like ntile, read it; drop it otherwise)."""
    bounds = df.groupBy(group).agg(
        F.min(val).alias("_lo"), F.max(val).alias("_hi"),
        F.count(F.lit(1)).alias("_n"))
    j = df.join(F.broadcast(bounds), group)
    # hi == lo (degenerate one-value group) -> everything in shard 0
    shard = F.when(
        F.col("_hi") > F.col("_lo"),
        F.least(F.lit(shards - 1),
                F.floor((F.col(val) - F.col("_lo"))
                        / (F.col("_hi") - F.col("_lo"))
                        * shards).cast("int"))).otherwise(F.lit(0))
    j = j.withColumn("_shard", shard)
    lrank = F.row_number().over(
        Window.partitionBy(group, "_shard").orderBy(val, tiebreak))
    ranked = j.withColumn("_lrank", lrank)
    sizes = j.groupBy(group, "_shard").agg(F.count(F.lit(1)).alias("_cnt"))
    # per-group prefix sum over <= `shards` rows — bounded by
    # construction, partitioned by group
    offs = sizes.select(
        group, "_shard",
        F.coalesce(F.sum("_cnt").over(
            Window.partitionBy(group).orderBy("_shard")
            .rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0)).alias("_off"))
    return (ranked.join(F.broadcast(offs), [group, "_shard"])
            .withColumn(out, (F.col("_off") + F.col("_lrank"))
                        .cast("long"))
            .drop("_lo", "_hi", "_shard", "_lrank", "_off"))


def exact_group_ntile(df: DataFrame, group: str, val: str, tiebreak: str,
                      *, n_tiles: int, shards: int = NTILE_SHARDS,
                      out: str = "tile") -> DataFrame:
    """Exact ``ntile(n_tiles) OVER (PARTITION BY group ORDER BY val,
    tiebreak)`` — distributed per the module doc. `val` must be
    non-null and (val, tiebreak) must be unique within a group (ties
    in `val` break on `tiebreak`, so cross-engine determinism needs a
    unique tiebreak — the same contract the single-node ntile query
    had). Descending metrics: pass the negated value (exact for ints
    < 2^53 and for IEEE doubles).

    Returns the input columns + `out` (int tile in [1, n_tiles]).
    """
    ranked = exact_group_rank(df, group, val, tiebreak, shards=shards,
                              out="_rank")
    # ntile(P) closed form (layout.zorder_stats'): the first
    # r = N % P tiles hold q+1 rows (q = N div P); ceil-div via
    # (a + b - 1) div b (all terms positive)
    ranked = (ranked
              .withColumn("_q", F.expr(f"_n div {n_tiles}"))
              .withColumn("_r", F.col("_n") - F.lit(n_tiles) * F.col("_q"))
              .withColumn("_big", F.col("_r") * (F.col("_q") + 1))
              .withColumn(out, F.when(
                  F.col("_rank") <= F.col("_big"),
                  F.expr("(_rank + _q) div (_q + 1)")).otherwise(
                  F.col("_r") + F.expr("(_rank - _big + _q - 1) div _q"))
                  .cast("int")))
    return ranked.drop("_n", "_rank", "_q", "_r", "_big")
