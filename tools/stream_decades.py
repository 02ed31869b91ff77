#!/usr/bin/env python3
"""Two-decade STREAMING-STATE probe: the bounded-state claims pushed
to 10M events (100x of sf0.1) — the last family whose curve stopped
at 10x. Reuses tools/scale_probe.py's streaming_state_curve (key-
offset copies, time axis fixed, 2-bucket + sentinel wire replay, so
the micro-batch count stays constant while per-batch volume scales).

The claims at the 100x decade:
- streaming_kmv: ONE sketch row per day — peak state must stay flat
  at the day count while 10M user-events flow through (the sketch
  absorbing 150k distinct users is the whole point);
- streaming_sessionize_watermark: peak = open sessions (x mult, ~1.5%
  of events), and the event-time timeout flush still drains EVERY row
  (removed == peak) — eviction keeping up is the 100x question;
- streaming_dedup_watermark: peak = keys in window — LINEAR in mult
  BY DESIGN of this replay (every key stays in-window for the
  exactness oracle); at 100x that is a deliberate 10M-row state-store
  stress cell (~1 GB HDFSBackedStateStore), probing that a fat store
  survives snapshot/commit, not that state is small.

Writes/updates one marker-delimited section in SCALING.md.
Run: PYTHONPATH=. python tools/stream_decades.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_probe import streaming_state_curve  # noqa: E402

from coinbase_data_pipeline_spark.session import get_spark  # noqa: E402

MULTS = (1, 10, 100)
MARK_START = "<!-- stream_decades:start -->"
MARK_END = "<!-- stream_decades:end -->"


def run() -> list[str]:
    spark = get_spark("stream-decades")
    spark.sparkContext.setLogLevel("ERROR")

    cells: dict[str, dict[int, str]] = {}
    for mult in MULTS:
        t0 = time.time()
        res = streaming_state_curve(spark, mult)
        wall = time.time() - t0
        for name, (n_in, batches, peak, removed) in res.items():
            cells.setdefault(name, {})
            cells[name][mult] = (f"{n_in:,} → {peak:,}/{removed:,} "
                                 f"({batches} batches)")
            print(f"# {mult}x {name}: {cells[name][mult]}", flush=True)
        print(f"# {mult}x wall {wall:.0f}s all three replays",
              flush=True)

    lines = [
        MARK_START,
        "## Two-decade streaming-state curve (1x/10x/100x events)",
        "",
        "The bounded-state claims at 10M events (cells read in-rows →",
        "peak/removed state rows; same construction as the 1x–10x",
        "table above — key-offset copies, fixed time axis, constant",
        "micro-batch count with per-batch volume scaling). kmv's",
        "sketch row count must stay FLAT while 150k distinct users",
        "flow through; sessionize's timeout flush must still drain",
        "every open-session row (removed == peak);",
        "dedup_watermark's 100x cell is a deliberate 10M-row",
        "state-store stress (state linear in keys BY DESIGN of the",
        "exactness replay — eviction is pytest-gated separately).",
        "",
        "| query | " + " | ".join(f"{m}x" for m in MULTS) + " |",
        "|---|" + "---|" * len(MULTS),
    ]
    for name in cells:
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
