#!/usr/bin/env python3
"""Two-decade ANN/embedding probe: the graph/IVF/SemDeDup family
measured at 1x / 10x / 100x vectors — 100x of sf0.1 embeddings is
200k vectors, the sf10-scale corpus for this table.

Construction mirrors tools/scale_decades.py's token-disjoint corpus,
in embedding space: copy i applies a per-copy deterministic SIGN-FLIP
pattern to the vector's dimensions (xxhash64(copy, dim) parity). A
sign flip is an orthogonal transform, so every within-copy distance,
cosine, and neighbor structure is preserved EXACTLY, while cross-copy
cosines scramble to ~0 and hyperplane sketches re-roll per copy —
true neighbor output is ~mult x the 1x output and wall growth beyond
~mult isolates candidate-generation growth. vec_ids interleave across
copies (new_id = old_id * mult + copy) so id-seeded k-means spreads
its seeds over every copy.

THE PARAMETER-SCALING DOCTRINE IS THE POINT. These operators are
sub-quadratic only if their partition counts grow with the corpus —
the probe scales them the way production would:
- knn_graph: bucket space 2^planes must track n to keep per-bucket
  occupancy (and so per-vector candidates ~bands*occupancy) constant;
  planes = 4 + 4*log10(mult) here (4 / 8 / 12). Fixed planes=4 at
  100x would put ~12.5k rows in each of 16 buckets/band — the
  hot-bucket cap would keep it from exploding (512-row cap + star
  links) but recall would crater; growing planes is the real posture.
- semantic_dedup: SemDeDup's cluster count grows with the corpus
  (the paper runs ~100k clusters at web scale); k = 8*mult here so
  the pair space Sum n_c^2 stays ~n*(n/k) = linear in n.
- ivf_topk: nprobe/n_lists of the corpus per query — linear in n by
  construction at fixed lists; measured as the fixed-parameter
  contrast line.

Writes/updates one marker-delimited section in SCALING.md.
Run: PYTHONPATH=. python tools/ann_decades.py
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import functions as F

from coinbase_data_pipeline_spark.operators import ann as ANN
from coinbase_data_pipeline_spark.operators import dedup as DD
from coinbase_data_pipeline_spark.session import get_spark
from coinbase_data_pipeline_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULTS = (1, 10, 100)
MARK_START = "<!-- ann_decades:start -->"
MARK_END = "<!-- ann_decades:end -->"


def disjoint_dir(spark, mult: int) -> str:
    """Materialize mult sign-flip copies of the sf0.1 embeddings to
    /tmp parquet (fresh-scan posture). Copy 0 gets a pattern too, so
    every multiple runs the same transformed shape and the 1x cell is
    comparable. Ids interleave across copies."""
    emb = load_table(spark, SF_DIR, "embeddings")
    parts = []
    for i in range(mult):
        flip = F.transform(
            "embedding",
            lambda x, j: x * (F.lit(1.0) - F.lit(2.0) * (
                F.abs(F.xxhash64(F.lit(i), j)) % F.lit(2)
            ).cast("double")))
        parts.append(emb.select(
            (F.col("vec_id") * mult + i).alias("vec_id"),
            flip.cast("array<float>").alias("embedding"),
            "label"))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = os.path.join("/tmp", f"ann-decades-{mult}x-{uuid.uuid4().hex[:8]}")
    try:
        u.repartition(max(4, mult // 4)).write.parquet(out)
    except BaseException:
        shutil.rmtree(out, ignore_errors=True)
        raise
    return out


def run() -> list[str]:
    spark = get_spark("ann-decades")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).agg(F.bit_xor(F.xxhash64("id"))).collect()

    def knn(emb, mult):
        planes = {1: 4, 10: 8, 100: 12}[mult]
        return ANN.knn_graph(emb, planes=planes), f"planes={planes}"

    def semdedup(emb, mult):
        k = 8 * mult
        return (DD.semantic_dedup_pairs(emb, k=k, threshold=0.4),
                f"k={k}")

    def ivf(emb, mult):
        queries = emb.filter(F.col("vec_id") < F.lit(64 * mult))\
                     .filter(F.col("vec_id") % F.lit(mult) == 0)
        return ANN.ivf_topk(emb, queries), "64 queries, fixed lists"

    ops = [("knn_graph", knn), ("semantic_dedup", semdedup),
           ("ann_ivf", ivf)]
    cells: dict[str, dict[int, str]] = {n: {} for n, _ in ops}
    base_wall: dict[str, float] = {}
    base_rows: dict[str, int] = {}
    for mult in MULTS:
        d = disjoint_dir(spark, mult)
        try:
            emb = spark.read.parquet(d)
            for name, fn in ops:
                t0 = time.time()
                df, note = fn(emb, mult)
                n = df.count()
                wall = time.time() - t0
                if mult == MULTS[0]:
                    base_wall[name] = wall
                    base_rows[name] = n
                ratio = ("" if mult == MULTS[0] else
                         f", {wall / base_wall[name]:.1f}x wall / "
                         f"{n / max(1, base_rows[name]):.1f}x rows")
                cells[name][mult] = f"{wall:.1f}s ({n:,}; {note}{ratio})"
                print(f"# {mult}x {name}: {cells[name][mult]}",
                      flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    lines = [
        MARK_START,
        "## Two-decade embedding curve (1x/10x/100x sign-flip copies)",
        "",
        "100x of sf0.1 embeddings = 200k vectors. Copies are",
        "SKETCH-DISJOINT: each applies a deterministic per-copy",
        "sign-flip pattern over the 64 dims — an orthogonal transform,",
        "so within-copy neighbor structure is preserved exactly while",
        "cross-copy cosines scramble to ~0 and hyperplane buckets",
        "re-roll per copy; true output is ~mult x and wall growth",
        "beyond ~mult isolates candidate generation (the embedding",
        "analogue of the token-disjoint corpus below). Parameters",
        "scale the way production must — knn_graph's bucket space",
        "2^planes tracks n (planes 4/8/12: constant per-bucket",
        "occupancy), semantic_dedup's cluster count k = 8*mult keeps",
        "the SemDeDup pair space Sum n_c^2 ~ n*(n/k) linear (the",
        "paper's ~100k clusters at web scale is this same rule);",
        "ann_ivf holds lists fixed as the contrast line (its",
        "candidate set is nprobe/lists of the corpus — linear by",
        "construction). Single-run wall, local[32], fresh /tmp scans.",
        "",
        "| operator | " + " | ".join(f"{m}x" for m in MULTS) + " |",
        "|---|" + "---|" * len(MULTS),
    ]
    for name, _ in ops:
        lines.append("| " + name + " | "
                     + " | ".join(cells[name][m] for m in MULTS) + " |")
    lines += [
        "",
        "semantic_dedup's rows ratio exceeds mult because \"scramble to",
        "~0\" has a noise floor: a sign-flip cosine at dim 64 is a",
        "zero-mean sum whose tail mass above the probe's 0.4 threshold",
        "is small but nonzero per pair, and the within-cluster pair",
        "space it is screened against grows ~linearly with n — so",
        "cross-copy coincidence pairs (real cosines >= 0.4 of the",
        "TRANSFORMED corpus, not false positives of the operator)",
        "come to dominate its output at 100x. Wall tracks that output",
        "(per-pair cost still FALLING at 100x), which is the",
        "sub-quadratic signal; knn_graph, whose top-k-per-vector",
        "output is pinned to exactly mult x rows, is the clean",
        "candidate-generation reading.",
        "",
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
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    splice(run())
    print("spliced into SCALING.md")
