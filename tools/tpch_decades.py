#!/usr/bin/env python3
"""Two-decade TPC-H probe: the four heaviest multi-join pipelines at
1x / 10x / 100x of the sf0.1 tables — 100x is the SF10 row volume
(60M lineitem), run on local[32] exactly as the registry serves them
(fresh parquet scans: pushdown, AQE runtime join sizing, and
broadcast decisions all live).

Reuses tools/scale_probe.py's referentially-consistent materializer
(per-copy key offsets, nation/region fixed per TPC-H SF semantics):
joins match within a copy only, so selectivities are unchanged and
result volume is linear — any super-linear wall knee is a join
mis-sizing, not a data artifact. The specific 100x hazards this
probes, beyond the 10x cells the main SCALING table already has:
- build sides that AQE correctly broadcast at sf1 (supplier, part,
  customer per-copy slices after pushdown) outgrowing the threshold
  at sf10 — the plan must flip to shuffle joins without a cliff;
- shuffle partition sizing: 32 static shuffle partitions hold ~2M
  lineitem rows each at 100x — AQE coalescing/splitting decides
  whether spill stays bounded.

Writes/updates one marker-delimited section in SCALING.md.
Run: PYTHONPATH=. python tools/tpch_decades.py
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F  # noqa: F401  (probe parity)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_probe import TPCH_QUERIES, tpch_times  # noqa: E402

from coinbase_data_pipeline_spark.session import get_spark  # noqa: E402

MULTS = (1, 10, 100)
MARK_START = "<!-- tpch_decades:start -->"
MARK_END = "<!-- tpch_decades:end -->"


def run() -> list[str]:
    spark = get_spark("tpch-decades")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).agg(F.bit_xor(F.xxhash64("id"))).collect()

    cells: dict[str, dict[int, str]] = {n: {} for n in TPCH_QUERIES}
    base: dict[str, float] = {}
    for mult in MULTS:
        res = tpch_times(spark, mult)
        for name, (wall, rows) in res.items():
            if mult == MULTS[0]:
                base[name] = wall
            ratio = ("" if mult == MULTS[0] else
                     f", {wall / base[name]:.1f}x wall")
            cells[name][mult] = f"{wall:.1f}s ({rows:,} rows{ratio})"
            print(f"# {mult}x {name}: {cells[name][mult]}", flush=True)

    lines = [
        MARK_START,
        "## Two-decade TPC-H curve (1x/10x/100x = SF10 row volume)",
        "",
        "The four heaviest join pipelines on referentially-consistent",
        "key-offset multiples (scale_probe materializer; joins match",
        "within a copy, selectivities unchanged, result volume",
        "linear), run exactly as the registry serves them from fresh",
        "parquet scans — 100x is 60M lineitem rows, the SF10 volume,",
        "on local[32] with 32 static shuffle partitions (~2M",
        "lineitem rows each): AQE's runtime broadcast demotion and",
        "partition coalescing are what is being measured. A",
        "super-linear knee would mean a build side outgrew its",
        "broadcast threshold without a clean flip to a shuffle join,",
        "or shuffle partitions spilled unboundedly. Single-run wall;",
        "the 1x cells pay session JIT.",
        "",
        "| query | " + " | ".join(f"{m}x" for m in MULTS) + " |",
        "|---|" + "---|" * len(MULTS),
    ]
    for name in TPCH_QUERIES:
        lines.append("| " + name + " | "
                     + " | ".join(cells[name][m] for m in MULTS) + " |")
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
