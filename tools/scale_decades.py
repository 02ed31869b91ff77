#!/usr/bin/env python3
"""Two-decade corpus probe (VERDICT r11 #6): the worst-scaling dedup
plans measured at 1x / 10x / 100x documents — 100x of sf0.1 is the
sf1-scale corpus (~500k docs).

Construction differs from tools/scale_probe.py's replicated copies ON
PURPOSE. There, copies cross-match (near-dup cliques merge across
copies), so TRUE pair output explodes super-linearly and wall tracks
output — which demonstrates output-boundedness but says nothing clean
about candidate generation at two decades. Here every copy is token-
DISJOINT: copy i appends an alpha suffix inside every [a-z]+ run
(regexp bijective token renaming — within-copy shingle/Jaccard/
containment structure is preserved exactly, cross-copy Jaccard is ~0).
True output is therefore exactly mult x the 1x output, and any wall
growth beyond ~mult is CANDIDATE-GENERATION growth — the thing the
sub-quadratic claim is about.

Expected regimes (and what a failure would look like):
- dedup_minhash_lsh: banded buckets are content-keyed, so disjoint
  copies land in disjoint buckets — wall ~linear. Quadratic wall here
  would mean bucket keys collide corpus-wide (a broken band hash).
- dedup_containment: prefix-filter join keys are content grams; df
  ranks replicate per copy — wall ~linear. Quadratic wall would mean
  the rarest-gram prefix degenerated into corpus-wide hub grams.
- dedup_ngram_jaccard: the EXACT method, now (r12) prefix-prefix
  filtered like containment — candidate keys are content grams, so
  wall should be ~linear too. The probe also reports the analytic
  bucket-join row count of the REPLACED length-bucket formulation
  (exact, from the token-set-size histogram): the ~mult^2 curve that
  made the old plan candidate-bound at two decades.

Writes/updates one section in SCALING.md (between the marker lines),
leaving the rest of the file intact.
Run: PYTHONPATH=. python tools/scale_decades.py
"""

from __future__ import annotations

import math
import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from coinbase_data_pipeline_spark.operators import dedup as DD
from coinbase_data_pipeline_spark.session import get_spark
from coinbase_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 10, 100)
MARK_START = "<!-- scale_decades:start -->"
MARK_END = "<!-- scale_decades:end -->"


def _alpha_suffix(i: int) -> str:
    """Copy index -> pure-alpha tag (tokenizer keeps only [a-z]+)."""
    s, i = "", i + 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(ord("a") + r) + s
    return "q" + s


def disjoint_dir(spark, mult: int) -> str:
    """Materialize mult token-disjoint copies of the sf0.1 documents
    to /tmp parquet (fresh-scan posture, like the TPC-H probe). Copy 0
    is salted too, so every multiple runs the same text shape and the
    1x cell is comparable."""
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    parts = []
    for i in range(mult):
        sfx = _alpha_suffix(i)
        parts.append(docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            F.regexp_replace("text", "([a-z]+)", "$1" + sfx)
            .alias("text"),
            "lang", "source", "n_chars"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = os.path.join("/tmp", f"decades-{mult}x-{uuid.uuid4().hex[:8]}")
    try:
        u.repartition(max(4, mult // 4)).write.parquet(out)
    except BaseException:
        shutil.rmtree(out, ignore_errors=True)
        raise
    return out


def ngram_candidate_rows(docs, threshold: float = 0.9) -> int:
    """EXACT row count of the length-bucket join used by
    dedup_ngram_jaccard BEFORE r12 (pre a<b / size-ratio filters),
    computed in O(buckets) from the token-set-size histogram: the b
    side exploded each doc to buckets {k-2..k+2}, so join rows =
    sum_k n(k) * sum_{|j-k|<=2} n(j). This is the candidate volume
    the replaced formulation would have to emit — the curve that made
    it candidate-bound and motivated the prefix-prefix rewrite."""
    from coinbase_data_pipeline_spark.functions.text import token_set

    inv_width = 1.0 / math.log(1.0 / threshold)
    sizes = (docs.select(F.size(token_set("text")).alias("n"))
             .filter(F.col("n") > 0)
             .select(F.floor(F.log(F.col("n").cast("double"))
                             * F.lit(inv_width)).cast("long").alias("bk"))
             .groupBy("bk").agg(F.count(F.lit(1)).alias("c")))
    hist = {r["bk"]: r["c"] for r in sizes.collect()}
    return sum(ca * sum(hist.get(k + d, 0) for d in range(-2, 3))
               for k, ca in hist.items())


def run() -> list[str]:
    spark = get_spark("scale-decades")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).agg(F.bit_xor(F.xxhash64("id"))).collect()

    ops = [
        ("dedup_minhash_lsh", lambda d: DD.minhash_lsh_pairs(d), None),
        ("dedup_containment", lambda d: DD.containment_pairs(d), None),
        ("dedup_ngram_jaccard", lambda d: DD.ngram_jaccard_pairs(d),
         None),
    ]
    cells: dict[str, dict[int, str]] = {n: {} for n, _, _ in ops}
    base_wall: dict[str, float] = {}
    cand_rows: dict[int, int] = {}
    for mult in MULTS:
        d = disjoint_dir(spark, mult)
        try:
            docs = spark.read.parquet(d)
            cand_rows[mult] = ngram_candidate_rows(docs)
            for name, fn, max_mult in ops:
                if max_mult is not None and mult > max_mult:
                    cells[name][mult] = (
                        f"candidate-bound: {cand_rows[mult]:,} "
                        "bucket-join rows (analytic)")
                    continue
                t0 = time.time()
                df = fn(docs)
                row = df.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.bit_xor(F.xxhash64(*df.columns)).alias("h")
                ).collect()[0]
                wall = time.time() - t0
                if mult == MULTS[0]:
                    base_wall[name] = wall
                ratio = (f", {wall / base_wall[name]:.1f}x wall"
                         if mult > MULTS[0] else "")
                cells[name][mult] = f"{wall:.1f}s ({row['n']:,}){ratio}"
                print(f"# {mult}x {name}: {cells[name][mult]}",
                      flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    lines = [
        MARK_START,
        "## Two-decade corpus curve (1x/10x/100x disjoint copies — "
        "VERDICT r11 #6)",
        "",
        "100x of sf0.1 documents = ~500k docs, the sf1-scale corpus.",
        "Copies here are token-DISJOINT (per-copy alpha suffix inside",
        "every [a-z]+ run — a bijective token renaming), unlike the",
        "cross-matching replicas above: true pair output is exactly",
        "mult x the 1x output (minhash_lsh's is ~mult x: renamed",
        "tokens re-roll its probabilistic band recall per copy, a",
        "sub-1% wobble), so wall growth beyond ~mult isolates",
        "CANDIDATE-GENERATION growth. Sub-quadratic means the 100x",
        "wall ratio sits near 100x (linear), not (100x)^2.",
        "dedup_ngram_jaccard is the EXACT method, prefix-prefix",
        "filtered since r12 — before that its candidates came from a",
        "content-blind length-bucket join whose exact analytic row",
        "count (from the size histogram) is the ~mult^2 line below",
        "the table: the curve that made the old plan candidate-bound",
        "at two decades and motivated the rewrite.",
        "Single-run wall, local[32]; fresh parquet scans from /tmp.",
        "",
        "| operator | " + " | ".join(f"{m}x" for m in MULTS) + " |",
        "|---|" + "---|" * len(MULTS),
    ]
    for name, _, _ in ops:
        lines.append("| " + name + " | "
                     + " | ".join(cells[name][m] for m in MULTS) + " |")
    lines += [
        "",
        "Replaced (pre-r12) length-bucket candidate rows (analytic, "
        "exact): "
        + ", ".join(f"{m}x = {cand_rows[m]:,}" for m in MULTS)
        + " — the ~mult^2 curve the prefix rewrite eliminated.",
        MARK_END,
    ]
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
        text = text.rstrip("\n") + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    out = run()
    splice(out)
    print("\n".join(out))
