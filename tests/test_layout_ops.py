"""Operator-level tests for the data-layout / runtime-filter family
(operators/layout.py) and PMI collocations — the properties the SQL
oracles can't express: bloom pruning power, z-order locality and
file-skipping, planted-collocation ranking.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from coinbase_data_pipeline_spark.operators import layout as L
from coinbase_data_pipeline_spark.operators.textstats import (
    pmi_collocations,
)
from coinbase_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _probe_build(spark):
    li = load_table(spark, SF, "lineitem")
    od = (load_table(spark, SF, "orders")
          .filter(F.col("o_totalprice") > 480000.0)
          .select("o_orderkey"))
    return li, od


def test_bloom_filter_no_false_negatives_and_prunes(spark):
    li, od = _probe_build(spark)
    total = li.count()
    true_matches = li.join(od.withColumnRenamed("o_orderkey",
                                                "l_orderkey"),
                           "l_orderkey", "left_semi").count()
    survivors = L.bloom_filter_rows(li, od, "l_orderkey",
                                    "o_orderkey").count()
    # no false negatives: every true match passes the filter
    assert survivors >= true_matches
    # pruning power: the pre-shuffle row volume collapses to the
    # selective side's scale (plus a tiny false-positive tail), not
    # the fact table's
    assert survivors < 0.5 * total
    # end-to-end exactness
    exact = L.bloom_semi_join(li, od, "l_orderkey", "o_orderkey").count()
    assert exact == true_matches


def test_bloom_word_table_is_bounded(spark):
    _, od = _probe_build(spark)
    words = L.bloom_build(od, F.col("o_orderkey"))
    assert words.count() <= L.BLOOM_BITS // 64


def _zorder_boxes(spark):
    from coinbase_data_pipeline_spark.functions.timeutil import (
        epoch_micros,
    )
    from coinbase_data_pipeline_spark.plans.catalog_analytics import (
        ZO_DAY_US,
        ZO_ORIGIN_US,
        ZO_VAL_BUCKET,
    )

    ev = (load_table(spark, SF, "events")
          .withColumn("e_us", epoch_micros(F.col("ts"))))
    xb = F.pmod(F.floor(F.col("value") / ZO_VAL_BUCKET).cast("long"),
                F.lit(1 << L.ZBITS))
    yb = F.pmod(F.expr(f"(e_us - {ZO_ORIGIN_US}) div {ZO_DAY_US}"),
                F.lit(1 << L.ZBITS))
    ev = ev.select(xb.alias("xb"), yb.alias("yb"),
                   F.col("event_id").alias("tb"))
    boxes = L.zorder_stats(ev, F.col("xb"), F.col("yb"), F.col("tb"))
    return ev, boxes.collect()


def _skipped(split_boxes, x_lo, x_hi, y_lo, y_hi):
    """Split ids whose bounding box misses the rectangle — the splits
    min/max pruning never reads."""
    return {b["split_id"] for b in split_boxes
            if b["max_x"] < x_lo or b["min_x"] > x_hi
            or b["max_y"] < y_lo or b["min_y"] > y_hi}


def test_zorder_splits_are_ntile_shaped(spark):
    ev, boxes = _zorder_boxes(spark)
    n = ev.count()
    assert sum(b["n_rows"] for b in boxes) == n
    sizes = sorted(b["n_rows"] for b in boxes)
    assert sizes[-1] - sizes[0] <= 1          # ntile balance
    assert len(boxes) == L.ZSPLITS


def test_zorder_beats_single_column_sort_on_skipping(spark):
    """The point of Z-order: a predicate on the SECOND dimension still
    prunes splits. Under a time-sorted layout every split spans nearly
    the full value extent, so a value-range predicate reads everything;
    the z-layout skips a meaningful share of splits for the same
    predicate."""
    ev, boxes = _zorder_boxes(spark)

    from pyspark.sql import Window
    w = Window.orderBy("yb", "tb")          # time-sorted layout
    t = (ev.withColumn("split_id", F.ntile(L.ZSPLITS).over(w))
         .groupBy("split_id")
         .agg(F.min("xb").alias("min_x"), F.max("xb").alias("max_x"),
              F.min("yb").alias("min_y"), F.max("yb").alias("max_y"))
         .collect())
    # value-only rectangle (all days): buckets 2..6 of ~0..27
    z_skip = _skipped(boxes, 2, 6, 0, 10**9)
    t_skip = _skipped(t, 2, 6, 0, 10**9)
    assert len(z_skip) >= len(t_skip) + L.ZSPLITS // 4
    # and the 2-D rectangle prunes more still
    z_skip2 = _skipped(boxes, 2, 6, 5, 14)
    assert len(z_skip2) >= len(z_skip)


def test_zorder_skipping_is_sound_and_effective(spark):
    """Min/max pruning against the split boxes: splits whose box
    misses the query rectangle contain NO matching rows (soundness),
    and a selective rectangle skips a good share of splits."""
    ev, boxes = _zorder_boxes(spark)
    x_lo, x_hi, y_lo, y_hi = 2, 6, 5, 14
    skip_ids = _skipped(boxes, x_lo, x_hi, y_lo, y_hi)
    n_match = ev.filter((F.col("xb") >= x_lo) & (F.col("xb") <= x_hi)
                        & (F.col("yb") >= y_lo)
                        & (F.col("yb") <= y_hi)).count()
    # soundness: matching rows only live in non-skipped splits, so the
    # kept splits must hold at least every matching row
    kept_rows = sum(b["n_rows"] for b in boxes
                    if b["split_id"] not in skip_ids)
    assert kept_rows >= n_match
    # effectiveness: the rectangle prunes at least a quarter of splits
    assert len(skip_ids) >= L.ZSPLITS // 4


def test_pmi_ranks_planted_collocation_first(spark):
    """'zeta eta' always co-occur (a bound phrase); filler tokens are
    frequent but unbound — the planted pair must take rank 1 even
    though fillers have higher raw counts."""
    filler = "the of and to in for on with".split()
    rows = []
    for i in range(40):
        pad = " ".join(filler[(i + j) % len(filler)] for j in range(12))
        rows.append((i, f"{pad} zeta eta {pad}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pmi_collocations(docs, min_count=5, top_n=5).collect()
    assert (out[0]["a"], out[0]["b"]) == ("zeta", "eta")
    assert out[0]["pmi"] > 0


def test_zorder_write_files_skip_on_both_dimensions(spark, tmp_path):
    """The write-path twin of the layout audit: REAL parquet files,
    REAL footer statistics. A value-range predicate must skip a good
    share of z-clustered files while skipping (near) none of the
    time-sorted files; skipping must be sound (skipped files hold no
    matching rows)."""
    from coinbase_data_pipeline_spark.functions.timeutil import (
        epoch_micros,
    )
    from coinbase_data_pipeline_spark.plans.catalog_analytics import (
        ZO_DAY_US,
        ZO_ORIGIN_US,
        ZO_VAL_BUCKET,
    )
    from coinbase_data_pipeline_spark.sinks.archive import (
        file_stats,
        zorder_write,
    )

    ev = (load_table(spark, SF, "events")
          .withColumn("e_us", epoch_micros(F.col("ts"))))
    ev = ev.select(
        F.pmod(F.floor(F.col("value") / ZO_VAL_BUCKET).cast("long"),
               F.lit(1 << L.ZBITS)).alias("xb"),
        F.pmod(F.expr(f"(e_us - {ZO_ORIGIN_US}) div {ZO_DAY_US}"),
               F.lit(1 << L.ZBITS)).alias("yb"),
        "event_id")

    zpath, tpath = str(tmp_path / "z"), str(tmp_path / "t")
    zorder_write(ev, zpath, "xb", "yb", files=16)
    # time-sorted comparison layout, same file count
    (ev.repartitionByRange(16, F.col("yb"), F.col("event_id"))
       .sortWithinPartitions("yb").write.parquet(tpath))

    # "high-value events": the value distribution is bottom-heavy, so
    # most z-boxes sit at low xb and a high-value predicate skips them
    x_lo, x_hi = 4, 10**9

    def skipped(path):
        stats = [s for s in file_stats(path, ("xb",)) if s["rows"]]
        return [s for s in stats
                if s["xb_max"] < x_lo or s["xb_min"] > x_hi], stats

    z_skip, z_all = skipped(zpath)
    t_skip, _ = skipped(tpath)
    assert len(z_skip) >= len(t_skip) + 4
    # soundness: rows matching the predicate never live in a skipped file
    matches = ev.filter((F.col("xb") >= x_lo)
                        & (F.col("xb") <= x_hi)).count()
    kept_rows = sum(s["rows"] for s in z_all if s not in z_skip)
    assert kept_rows >= matches
