#!/usr/bin/env python3
"""Two-decade EVENTS-ANALYTICS + FORECAST probe: the sessionization /
funnel / cohort / path-mining / RFM family at 1x / 10x / 100x events
(10M rows at 100x), plus the forecast pair (holt_param_sweep,
model_metrics) at 1x / 10x / 100x product keys — the fifth and sixth
decade axes beside dedup, embedding, text, and TPC-H.

Events replicate with per-copy user_id/event_id OFFSETS and the time
axis fixed (the streaming state-curve doctrine: distinct keys scale,
the clock does not) — per-user behavior is preserved exactly, so
session counts, funnel conversions, cohort shapes and path tables
scale linearly by construction and any wall growth beyond ~mult is
plan overhead (window partitioning, shuffle sizing), not data
artifact. The 100x hazards probed:
- sessionize-family per-user windows: 150k distinct users at 100x —
  WindowExec partitions stay user-sized (bounded) but the shuffle
  that feeds them carries 10M rows; a mis-partitioned window (or an
  unpartitioned ORDER BY sneaking in) would knee super-linearly.
- rfm quintiles: the exact no-global-ntile formulation's threshold
  relation grows with distinct users; its join-back must not flip to
  a corpus-side broadcast.
- forecast applyInPandas: key count (products) goes 9 -> 900, far
  past the 32 cores — Arrow batch scheduling across many small
  groups is what's measured (the 4x cells in the main table never
  left the keys < cores regime).

Scaled events are written as normal TIMESTAMP(us) parquet; load_table
detects non-nanos input and skips the ts_nanos conversion (the
testdata-only TIMESTAMP(NANOS) seam).

Writes/updates one marker-delimited section in SCALING.md.
Run: PYTHONPATH=. python tools/events_decades.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_probe import candle_times  # noqa: E402

from coinbase_data_pipeline_spark.session import get_spark  # noqa: E402
from coinbase_data_pipeline_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 10, 100)
EVENT_QUERIES = ("sessionize", "funnel", "retention_cohorts",
                 "event_paths", "rfm_scores")
MARK_START = "<!-- events_decades:start -->"
MARK_END = "<!-- events_decades:end -->"


def scaled_events_dir(spark, mult: int) -> str:
    """Materialize mult key-offset copies of the sf0.1 events to a
    /tmp dir laid out like an sf_dir (fresh-scan posture)."""
    ev = load_table(spark, SF_DIR, "events").drop("ts_nanos")
    strides = ev.agg(F.max("event_id").alias("e"),
                     F.max("user_id").alias("u")).collect()[0]
    if strides["e"] is None:
        raise RuntimeError("events table is empty")
    se, su = strides["e"] + 1, strides["u"] + 1
    parts = []
    for i in range(mult):
        parts.append(ev.select(
            (F.col("event_id") + i * se).alias("event_id"),
            "ts",
            (F.col("user_id") + i * su).alias("user_id"),
            "event_type", "value", "props"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = os.path.join("/tmp", f"events-decades-{mult}x-"
                               f"{uuid.uuid4().hex[:8]}")
    try:
        (u.repartition(max(4, mult // 4))
         .write.parquet(os.path.join(out, "events.parquet")))
    except BaseException:
        shutil.rmtree(out, ignore_errors=True)
        raise
    return out


def run() -> list[str]:
    from coinbase_data_pipeline_spark.plans.registry import ALL_QUERIES

    spark = get_spark("events-decades")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).agg(F.bit_xor(F.xxhash64("id"))).collect()

    cells: dict[str, dict[int, str]] = {n: {} for n in EVENT_QUERIES}
    base: dict[str, float] = {}
    for mult in MULTS:
        d = scaled_events_dir(spark, mult)
        try:
            for name in EVENT_QUERIES:
                t0 = time.time()
                n = ALL_QUERIES[name](spark, d).count()
                wall = time.time() - t0
                if mult == MULTS[0]:
                    base[name] = wall
                ratio = ("" if mult == MULTS[0] else
                         f", {wall / base[name]:.1f}x wall")
                cells[name][mult] = f"{wall:.1f}s ({n:,} rows{ratio})"
                print(f"# {mult}x {name}: {cells[name][mult]}",
                      flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    fc_cells: dict[str, dict[int, str]] = {}
    fc_base: dict[str, float] = {}
    for mult in MULTS:
        for name, (wall, vol) in candle_times(spark, mult).items():
            fc_cells.setdefault(name, {})
            if mult == MULTS[0]:
                fc_base[name] = wall
            ratio = ("" if mult == MULTS[0] else
                     f", {wall / fc_base[name]:.1f}x wall")
            fc_cells[name][mult] = f"{wall:.1f}s ({vol:,}{ratio})"
            print(f"# {mult}x {name}: {fc_cells[name][mult]}",
                  flush=True)

    lines = [
        MARK_START,
        "## Two-decade events-analytics + forecast curve (1x/10x/100x)",
        "",
        "Events replicate with per-copy user_id/event_id offsets and",
        "the time axis fixed (distinct keys scale, the clock does",
        "not) — per-user behavior is preserved exactly, so output",
        "volume is linear by construction and wall growth beyond",
        "~mult is plan overhead, not data artifact. 100x = 10M",
        "events / 150k users; the per-user windows behind",
        "sessionize/funnel/paths stay user-sized, the shuffle feeding",
        "them carries the full stream. Forecast rows replicate the",
        "candle relation by PRODUCT (9 -> 900 keys at 100x, far past",
        "the 32 cores — the applyInPandas many-small-groups regime",
        "the 4x table never reached). Single-run wall, local[32],",
        "fresh /tmp scans; 1x cells pay session JIT.",
        "",
        "| query | " + " | ".join(f"{m}x" for m in MULTS) + " |",
        "|---|" + "---|" * len(MULTS),
    ]
    for name in EVENT_QUERIES:
        lines.append("| " + name + " | "
                     + " | ".join(cells[name][m] for m in MULTS) + " |")
    for name in fc_cells:
        lines.append("| " + name + " (keys x mult) | "
                     + " | ".join(fc_cells[name][m] for m in MULTS)
                     + " |")
    lines += ["", MARK_END]
    return lines


def splice(lines: list[str]) -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    with open(path) as f:
        text = f.read()
    block = "\n".join(lines)
    if MARK_START in text:
        pre = text[:text.index(MARK_START)]
        post = text[text.index(MARK_END) + len(MARK_END):]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    splice(run())
    print("spliced into SCALING.md")
