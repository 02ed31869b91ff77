"""Sliding sequence-window extraction.

Reference parity: CryptoDataset.__getitem__ (Crypto-TS-Model-master/
src/data_loader.py:166-172) — per product, windows of seq_len trailing
observations (x) and pred_len leading closes (y). The reference builds
them lazily per training step; the engine materializes them as a
distributed table, which is what a Spark training pipeline
(e.g. Petastorm/TorchDistributor feed) would consume.

Spark-first: collect_list over bounded row frames — same single
per-key shuffle as the rest of the feature family. Output sequences
are encoded as comma-joined scaled-integer strings (price * 1e6 as
bigint) so results are hash-comparable across engines independent of
float formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sliding_windows(candles: DataFrame, *, key: str = "product_id",
                    ts: str = "bucket_start", price: str = "close",
                    seq_len: int = 24, pred_len: int = 6) -> DataFrame:
    """Rows where a full (seq_len, pred_len) window exists:
    x = the seq_len prices ending at this row (inclusive),
    y = the pred_len prices after this row."""
    scaled = F.col("_p6")
    base = candles.withColumn(
        "_p6", F.round(F.col(price) * 1e6).cast("long"))
    wx = (Window.partitionBy(key).orderBy(ts)
          .rowsBetween(-(seq_len - 1), 0))
    wy = Window.partitionBy(key).orderBy(ts).rowsBetween(1, pred_len)
    out = (base
           .withColumn("_x", F.collect_list(scaled).over(wx))
           .withColumn("_y", F.collect_list(scaled).over(wy))
           .filter((F.size("_x") == seq_len) & (F.size("_y") == pred_len)))
    to_str = lambda c: F.concat_ws(  # noqa: E731
        ",", F.transform(F.col(c), lambda x: x.cast("string")))
    return out.select(
        key, ts,
        to_str("_x").alias("x_sig"),
        to_str("_y").alias("y_sig"),
    )


def curriculum_feature_dropout(df: DataFrame, *,
                               key: str = "product_id",
                               ts: str = "bucket_start",
                               features: tuple[str, ...] = (
                                   "open", "high", "low", "close",
                                   "volume"),
                               epoch: int = 0,
                               row_gate_pct: int = 50,
                               drop_pct: int = 10) -> DataFrame:
    """Deterministic train-time feature dropout — the last
    data-shaping behavior of the reference's data loader with no named
    query (Crypto-TS-Model-master/src/data_loader.py:215-231, step 6:
    in train mode, with probability 0.5 per sample, zero each feature
    independently with probability 0.1; ``set_epoch`` re-rolls the
    masks every epoch).

    The reference draws from ``random``/``np.random`` per __getitem__
    call — irreproducible across workers and epochs. This variant is
    the stratified_sample recipe instead: every gate is
    hash60(key:epoch_micros:epoch[, feature]) — a pure column
    expression (µs are exact integers on both engines — DuckDB
    epoch_us — so the key never touches float formatting), so the
    SAME (row, feature, epoch) always masks the
    same way on any partitioning, any engine, any retry (the property
    a distributed training feed actually needs), and a new epoch
    deterministically re-rolls every mask. The reference masks per
    (window, feature); a window here is a contiguous row range, so the
    relation-friendly formulation masks per (timestep row, feature) —
    downstream sliding_windows composes the row masks into window
    masks. The noise/mask/scale/warp curriculum steps (1-5) are the
    sibling :func:`curriculum_augment`, same hash-gate recipe.

    Output: the input rows with masked features (6dp-rounded first —
    masked values must hash identically cross-engine), plus
    ``dropout_applied`` (this row's 0.5 gate) and ``n_dropped``.
    Everything stays inside whole-stage codegen; zero shuffles added.
    """
    from ..functions.text import hash60
    from ..functions.timeutil import epoch_micros

    kstr = F.concat(F.col(key).cast("string"), F.lit(":"),
                    epoch_micros(F.col(ts)).cast("string"),
                    F.lit(f":e{int(epoch)}"))
    applied = (hash60(kstr, "curr-row") % 100) < row_gate_pct
    out = df
    dropped_flags = []
    for f in features:
        rounded = F.round(F.col(f), 6) + F.lit(0.0)
        dropped = applied & ((hash60(kstr, f"curr-f-{f}") % 100)
                             < drop_pct)
        out = out.withColumn(f, F.when(dropped, F.lit(0.0))
                             .otherwise(rounded))
        dropped_flags.append(dropped.cast("int"))
    n_dropped = dropped_flags[0]
    for d in dropped_flags[1:]:
        n_dropped = n_dropped + d
    return (out.withColumn("dropout_applied", applied)
            .withColumn("n_dropped", n_dropped))


def window_origins(candles: DataFrame, *, key: str = "product_id",
                   ts: str = "bucket_start", price: str = "close",
                   seq_len: int = 24, pred_len: int = 6) -> DataFrame:
    """The ORIGIN SET of :func:`sliding_windows` — (key, ts) of every
    row whose full (seq_len, pred_len) window exists — without
    materializing the window payloads: count(price) over the same
    trailing/leading frames replaces collect_list (count and
    collect_list drop NULLs identically, so membership matches
    bit-for-bit; pytest-pinned equality).

    For consumers that need only window MEMBERSHIP (the cadence
    audit), the per-row seq_len+pred_len array build is pure waste —
    the completeness filter references size(collect_list), so column
    pruning cannot remove it. This relation keeps the one key
    exchange and drops the array build. Measured honestly: at sf0.1
    the A/B is a wash (1.18 vs 1.20s — the candle aggregation
    dominates and the origin relation is only ~39k rows); the win is
    the 30×8 B per-row window state this avoids carrying through the
    sort at real row counts, not local seconds."""
    wx = (Window.partitionBy(key).orderBy(ts)
          .rowsBetween(-(seq_len - 1), 0))
    wy = Window.partitionBy(key).orderBy(ts).rowsBetween(1, pred_len)
    return (candles
            .withColumn("_nx", F.count(price).over(wx))
            .withColumn("_ny", F.count(price).over(wy))
            .filter((F.col("_nx") == seq_len)
                    & (F.col("_ny") == pred_len))
            .select(key, ts))


# ---------------------------------------------- curriculum augmentation

TWO_PI = 6.283185307179586   # repr(2*math.pi) — same literal in SQL
FULL60 = float(1 << 60)      # hash60's range, exactly representable
AUG_STD_FLOOR = 1e-6         # reference's np.clip(std, 1e-6, None)


def curriculum_progress(epoch: int, max_epoch: int = 100) -> float:
    """Step 1 of the reference curriculum (data_loader.py:176-181):
    progress ramps linearly to 1 over the first half of training."""
    return min(1.0, epoch / (max_epoch * 0.5))


def curriculum_augment(df: DataFrame, *,
                       key: str = "product_id",
                       ts: str = "bucket_start",
                       features: tuple[str, ...] = (
                           "open", "high", "low", "close", "volume"),
                       close_feature: str = "close",
                       epoch: int = 0,
                       max_epoch: int = 100,
                       seq_len: int = 24,
                       neighborhood: int = 5,
                       draw_partitions: int | None = None) -> DataFrame:
    """Deterministic train-time augmentation — curriculum steps 1-5 of
    the reference's data loader (Crypto-TS-Model-master/src/
    data_loader.py:176-214; step 6, feature dropout, is the sibling
    :func:`curriculum_feature_dropout`):

    1. epoch tracking: progress = min(1, epoch/(max_epoch/2)),
       noise_level = 0.02·progress, mask_ratio = 0.15·progress;
    2. local mean masking (p=0.5 per sample, span ≈ seq_len·mask_ratio
       rows, replaced by the ±5-row local mean);
    3. adaptive gaussian noise N(0, noise_level·std) with std clipped
       ≥ 1e-6 and values clipped to ±3 std;
    4. smart scaling (p=0.5): non-close features × U(0.9, 1.1);
    5. time warping (p=0.3): linear interpolation at scale U(0.8, 1.2)
       then truncate/edge-pad back to the original length.

    The reference draws from ``random``/``np.random`` per __getitem__
    — irreproducible across workers, epochs and retries. This variant
    re-expresses every draw as the stratified_sample hash-gate recipe
    (hash60 of key:epoch_micros:epoch with a per-step seed), so the
    SAME (row, feature, epoch) always augments the same way on any
    partitioning, any engine, any retry, and ``epoch`` re-rolls every
    draw like the reference's ``set_epoch``. Per-sample draws become
    per-row draws (a sample is a contiguous row range — the same
    reformulation curriculum_feature_dropout pins): the mask gate is
    p(0.5)·mask_ratio per row, scale factors draw per (row, feature),
    and the warp draw is per KEY (the key's series is the sample).

    Step-by-step relational semantics (each stage 6dp-snapped before
    the next, so cross-engine float noise can't compound):

    * mask: masked = ±`neighborhood`-row local mean when gated;
    * noise: Box-Muller on two hash60 uniforms (u1 ∈ (0,1] so ln is
      finite) × noise_level × trailing-`seq_len` window std of the
      MASKED series (population std, like np.std), result clipped to
      the window mean ± 3·std — the reference's [-3,3] clip on
      standardized features re-expressed in raw units (clip compares
      6dp-rounded values so engines can't disagree at the boundary);
    * scale: × (0.9 + 0.2·u) per gated (row, non-close feature);
    * warp: emitted as a SELECTION, not a gather — out_pos (this
      row's 0-based position in its key), src_lo/src_hi/src_frac (the
      two source positions and interpolation weight under
      align_corners=False linear warp, truncated/edge-padded back to
      the key's length). Downstream materializes the warped series
      with one self-join on (key, position); keeping the relation
      join-free is what lets the whole augment run as pure column
      expressions over ONE per-key window partitioning.

    Output: key, ts, augmented features (6dp), mask_applied,
    scale_applied, warp_applied, warp_factor, out_pos, src_lo,
    src_hi, src_frac.
    """
    from ..functions.text import hash60
    from ..functions.timeutil import epoch_micros

    progress = curriculum_progress(epoch, max_epoch)
    noise_level = 0.02 * progress
    mask_bp = int(round(0.15 * progress * 10000))  # mask_ratio in 1e-4

    kstr = F.concat(F.col(key).cast("string"), F.lit(":"),
                    epoch_micros(F.col(ts)).cast("string"),
                    F.lit(f":e{int(epoch)}"))
    kkey = F.concat(F.col(key).cast("string"), F.lit(f":e{int(epoch)}"))

    def u01(seed: str, col=None, shift: int = 0) -> F.Column:
        h = hash60(col if col is not None else kstr, seed)
        return (h + F.lit(shift)).cast("double") / F.lit(FULL60)

    wofs = Window.partitionBy(key).orderBy(ts)
    wloc = wofs.rowsBetween(-neighborhood, neighborhood)
    wstat = wofs.rowsBetween(-(seq_len - 1), 0)

    out = df
    snapped = {}
    for f in features:
        out = out.withColumn(f"_r_{f}", F.round(F.col(f), 6) + F.lit(0.0))
        snapped[f] = f"_r_{f}"

    # ---- draw stage: EVERY md5 draw materialized pre-window --------
    # The md5+conv draws dominate this operator's cost (~12/row), and
    # the per-key window stage that used to host them is tiny at test
    # SF, so AQE coalesces it to ONE task — serializing all hash work.
    # Three structural fixes, all bit-identical to the inline form:
    # * the draw keys (_k/_kk) are built once; every hash60 concats
    #   just its seed onto an attribute instead of rebuilding
    #   key:micros:e{epoch} per draw;
    # * each draw is aliased once and CONSUMED as an attribute —
    #   CollapseProject never re-inlines a multi-use non-cheap alias,
    #   so the old plan's 3x re-evaluation of each Box-Muller draw
    #   inside the clip CASE is gone;
    # * with draw_partitions=N the draw stage runs behind a PINNED
    #   repartition(N, key, ts) (AQE does not coalesce user-pinned
    #   counts), parallelizing the hash work N-way while the window
    #   stage that follows is pure arithmetic. Draws are per-row
    #   deterministic, so partitioning cannot change values. Test-SF
    #   entry points pass defaultParallelism (7.4s -> 2.5s at sf0.1);
    #   at scale leave None — input partitions are already fat, and
    #   the extra exchange would just double this operator's shuffle.
    if draw_partitions:
        out = out.repartition(draw_partitions, F.col(key), F.col(ts))
    out = out.withColumn("_k", kstr).withColumn("_kk", kkey)
    kcol, kkcol = F.col("_k"), F.col("_kk")
    out = (out
           .withColumn("_mask",
                       ((hash60(kcol, "aug-mask-gate") % 100) < 50)
                       & ((hash60(kcol, "aug-mask-row") % 10000)
                          < mask_bp))
           .withColumn("_scale",
                       (hash60(kcol, "aug-scale-gate") % 100) < 50)
           .withColumn("_warp_on",
                       (hash60(kkcol, "aug-warp-gate") % 100) < 30)
           .withColumn("_warp", F.lit(0.8)
                       + F.lit(0.4) * u01("aug-warp-f", kkcol)))
    for f in features:
        out = out.withColumn(
            f"_z_{f}",
            F.sqrt(F.lit(-2.0) * F.log(u01(f"aug-n1-{f}", kcol,
                                           shift=1)))
            * F.cos(F.lit(TWO_PI) * u01(f"aug-n2-{f}", kcol)))
        if f != close_feature:
            out = out.withColumn(
                f"_sf_{f}", F.lit(0.9)
                + F.lit(0.2) * u01(f"aug-scale-{f}", kcol))
    out = out.drop("_k", "_kk")

    # ---- window stage: pure arithmetic over the per-key ordering ---
    # Batched selects, not withColumn chains: all same-frame window
    # expressions land in ONE projection, so CollapseWindow keeps them
    # in a single Window pass (the chained form left 8 Window nodes —
    # one partition pass each; this form plans 1 wloc + 1 wstat pass).
    out = out.select(
        "*",
        *[F.when(F.col("_mask"),
                 F.round(F.avg(snapped[f]).over(wloc), 6) + F.lit(0.0))
          .otherwise(F.col(snapped[f])).alias(f"_m_{f}")
          for f in features])
    stat_cols = []
    for f in features:
        stat_cols.append(F.avg(f"_m_{f}").over(wstat).alias(f"_mu_{f}"))
        stat_cols.append(
            F.greatest(F.stddev_pop(f"_m_{f}").over(wstat),
                       F.lit(AUG_STD_FLOOR)).alias(f"_sd_{f}"))
    out = out.select("*", *stat_cols)
    bound_cols = []
    for f in features:
        bound_cols.append(
            (F.round(F.col(f"_m_{f}") + F.lit(noise_level)
                     * F.col(f"_sd_{f}") * F.col(f"_z_{f}"), 6)
             + F.lit(0.0)).alias(f"_x1_{f}"))
        bound_cols.append(
            (F.round(F.col(f"_mu_{f}") - F.lit(3.0) * F.col(f"_sd_{f}"),
                     6) + F.lit(0.0)).alias(f"_lo_{f}"))
        bound_cols.append(
            (F.round(F.col(f"_mu_{f}") + F.lit(3.0) * F.col(f"_sd_{f}"),
                     6) + F.lit(0.0)).alias(f"_hi_{f}"))
    out = out.select("*", *bound_cols)

    def _clip(f: str) -> F.Column:
        x1, lo, hi = (F.col(f"_x1_{f}"), F.col(f"_lo_{f}"),
                      F.col(f"_hi_{f}"))
        return F.when(x1 > hi, hi).when(x1 < lo, lo).otherwise(x1)

    out = out.select("*", *[_clip(f).alias(f"_n_{f}")
                            for f in features])
    aug_cols = []
    for f in features:
        if f == close_feature:
            aug = F.col(f"_n_{f}")
        else:
            aug = F.when(F.col("_scale"),
                         F.round(F.col(f"_n_{f}") * F.col(f"_sf_{f}"),
                                 6) + F.lit(0.0)) \
                .otherwise(F.col(f"_n_{f}"))
        aug_cols.append(aug.alias(f))
    # ---- warp selection (per-key draw; same window partitioning)
    t_n = F.count(F.lit(1)).over(Window.partitionBy(key))
    out_pos = F.row_number().over(wofs) - F.lit(1)
    out = (out.withColumn("_T", t_n)
           .withColumn("out_pos", out_pos.cast("int")))
    new_t = F.greatest(F.lit(1), F.floor(F.col("_T") * F.col("_warp")))
    out_eff = F.least(F.col("out_pos").cast("long"), new_t - F.lit(1))
    s = F.when(F.col("_warp_on"),
               (out_eff.cast("double") + F.lit(0.5)) / F.col("_warp")
               - F.lit(0.5)) \
        .otherwise(F.col("out_pos").cast("double"))
    s_c = F.greatest(F.lit(0.0),
                     F.least(s, (F.col("_T") - F.lit(1)).cast("double")))
    src_lo = F.floor(s_c).cast("int")
    return out.select(
        key, ts, *aug_cols,
        F.col("_mask").alias("mask_applied"),
        F.col("_scale").alias("scale_applied"),
        F.col("_warp_on").alias("warp_applied"),
        (F.round(F.when(F.col("_warp_on"), F.col("_warp"))
                 .otherwise(F.lit(1.0)), 6) + F.lit(0.0))
        .alias("warp_factor"),
        "out_pos",
        src_lo.alias("src_lo"),
        F.least(src_lo + F.lit(1), (F.col("_T") - F.lit(1)).cast("int"))
        .alias("src_hi"),
        (F.round(s_c - src_lo.cast("double"), 6) + F.lit(0.0))
        .alias("src_frac"))
