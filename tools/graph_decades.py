#!/usr/bin/env python3
"""Two-decade GRAPH-OPERATOR probe: connected components, PageRank
and triangle counting over the near-dup pair graph at 1x / 10x / 100x
documents — the last operator family without a measured 100x cell
(the main SCALING table stops at 4x for these, and its replicated
corpus inflates cross-copy edges; the token-disjoint corpus here
keeps the graph exactly mult x disjoint copies of the 1x graph, so
components/pagerank/triangle structure replicates cleanly and wall
growth beyond ~mult is algorithm overhead).

The 100x questions:
- connected_components: min-label propagation + pointer jumping is
  O(log d) ROUNDS of self-joins — rounds don't grow with corpus size
  (diameter is a within-copy property), so wall should track the
  edge volume (~mult x), not mult x rounds.
- doc_pagerank: 3 fixed-point iterations of inbox aggregation over
  ~mult x edges with per-round checkpoints — linear-in-edges is the
  claim; a super-linear knee would mean the checkpoint lineage or
  inbox shuffle grows with corpus, not edges.
- graph_triangles (exact) vs graph_triangles_doulion (p=0.5 DOULION):
  enumeration joins materialize every triangle — output-bound by
  construction (~mult x triangles) — while DOULION keeps each edge by
  a deterministic hash coin and scales counts by 1/p^3; the pair of
  lines shows what the sampling buys at the 100x decade.

Writes/updates one marker-delimited section in SCALING.md.
Run: PYTHONPATH=. python tools/graph_decades.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scale_decades import disjoint_dir  # noqa: E402

from coinbase_data_pipeline_spark.operators import dedup as DD  # noqa: E402
from coinbase_data_pipeline_spark.session import get_spark  # noqa: E402

MULTS = (1, 10, 100)
MARK_START = "<!-- graph_decades:start -->"
MARK_END = "<!-- graph_decades:end -->"


def run() -> list[str]:
    spark = get_spark("graph-decades")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).agg(F.bit_xor(F.xxhash64("id"))).collect()

    def components(docs):
        pairs = DD.minhash_lsh_pairs(docs, link_capped=True)
        return DD.connected_components(pairs)

    def pagerank(docs):
        return DD.doc_pagerank(docs, iterations=3, damping=0.85)

    def triangles(docs):
        return DD.graph_triangles(docs)

    def doulion(docs):
        return DD.graph_triangles_doulion(docs, sample_p=0.5)

    ops = [("dedup_components", components), ("doc_pagerank", pagerank),
           ("graph_triangles", triangles),
           ("graph_triangles_doulion", doulion)]
    cells: dict[str, dict[int, str]] = {n: {} for n, _ in ops}
    base: dict[str, float] = {}
    for mult in MULTS:
        d = disjoint_dir(spark, mult)
        try:
            docs = spark.read.parquet(d)
            for name, fn in ops:
                t0 = time.time()
                n = fn(docs).count()
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

    lines = [
        MARK_START,
        "## Two-decade graph-operator curve (1x/10x/100x disjoint copies)",
        "",
        "Components / PageRank / triangles over the near-dup pair",
        "graph of the token-disjoint corpus (500k docs at 100x): the",
        "graph is exactly mult disjoint copies of the 1x graph, so",
        "diameter — and with it the pointer-jumping round count and",
        "the fixed 3 PageRank iterations — is a within-copy constant,",
        "and wall should track EDGE volume (~mult x). Exact triangle",
        "enumeration materializes every triangle (output-bound);",
        "DOULION p=0.5 beside it shows what hash-coin edge sampling",
        "buys at the decade. Single-run wall, local[32], fresh /tmp",
        "scans; 1x cells pay session JIT.",
        "",
        "| operator | " + " | ".join(f"{m}x" for m in MULTS) + " |",
        "|---|" + "---|" * len(MULTS),
    ]
    for name, _ in ops:
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
