#!/usr/bin/env python3
"""Scaling-curve probe: rerun the heaviest operators on corpus
multiples (documents unioned with id-shifted copies — duplicates the
near-dup cliques, so candidate structure scales realistically) and
report wall time vs input size. Near-linear growth is the evidence
that candidate generation stays bucketed — an all-pairs plan would
show quadratic blow-up between 1x and 4x.

Writes SCALING.md. Run: PYTHONPATH=. python tools/scale_probe.py
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from coinbase_data_pipeline_spark.operators import dedup as DD
from coinbase_data_pipeline_spark.session import get_spark
from coinbase_data_pipeline_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.1"
MULTIPLES = (1, 2, 4)


def corpus_times(spark, mult: int) -> dict[str, float]:
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    parts = [docs]
    for i in range(1, mult):
        parts.append(docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            # perturb the copy so it dedups against itself but not
            # trivially against every other copy (suffix token)
            F.concat("text", F.lit(f" copymark{i}")).alias("text"),
            "lang", "source", "n_chars"))
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.localCheckpoint(eager=True)

    # token_packing's salted prefix sum is deliberately NOT probed
    # here: at local corpus sizes (≤20k docs) both formulations are
    # sub-second and the salt reads as pure overhead — the single-
    # stratum serialization it removes only bites at ~1e8+ rows per
    # stratum. Its scale evidence is the plan-shape audit
    # (tests/test_plans.py::test_token_packing_salted_plan) plus the
    # salt-count invariance property test.
    emb = load_table(spark, SF_DIR, "embeddings")
    ne = emb.count()
    eparts = [emb.select("vec_id", "embedding")]
    for i in range(1, mult):
        # deterministic per-component perturbation: scaling alone
        # would leave cosine exactly 1 and blow up the top-k cliques
        eparts.append(emb.select(
            (F.col("vec_id") + i * ne).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, j: x + ((j % 7) - 3) * (0.001 * i))
            .alias("embedding")))
    ecorpus = eparts[0].select("vec_id",
                               F.col("embedding").cast("array<double>")
                               .alias("embedding"))
    for p in eparts[1:]:
        ecorpus = ecorpus.unionByName(p)
    ecorpus = ecorpus.localCheckpoint(eager=True)

    from coinbase_data_pipeline_spark.operators import ann as ANN
    from coinbase_data_pipeline_spark.operators import corpus as CP
    from coinbase_data_pipeline_spark.operators import sketches as SK
    from coinbase_data_pipeline_spark.operators import textstats as TS

    out: dict[str, float] = {}
    for entry in [
        ("dedup_minhash_lsh", lambda: DD.minhash_lsh_pairs(corpus)),
        ("dedup_ngram_jaccard", lambda: DD.ngram_jaccard_pairs(corpus)),
        ("dedup_simhash_pairs", lambda: DD.simhash_pairs(corpus)),
        ("dedup_components",
         lambda: DD.connected_components(DD.minhash_lsh_pairs(corpus))),
        ("dedup_containment", lambda: DD.containment_pairs(corpus)),
        ("dedup_tfidf_cosine", lambda: DD.tfidf_cosine_pairs(corpus)),
        ("knn_graph", lambda: ANN.knn_graph(ecorpus)),
        ("bpe_train", lambda: CP.bpe_train(corpus)),
        ("quality_classifier",
         lambda: TS.quality_classifier(corpus)[1]),
        # doc_pagerank's output is node-sized regardless of input, so
        # its volume signal is the EDGE count (the per-round message
        # shuffle volume) — wall should track edges, not nodes
        ("doc_pagerank", lambda: DD.doc_pagerank(corpus),
         F.sum("degree")),
        # graph_triangles: the probe corpus multiplies near-dup
        # CLIQUES, and the perturbed copies still cross-match at
        # jaccard 0.9, so cliques MERGE and triangle COUNT grows
        # ~cubically by construction (306M at 1x, ~2.4B at 2x, ~20B
        # at 4x). That makes this row a test that wall tracks OUTPUT
        # volume (the sum-of-triangles column, an exact enumerator's
        # Ω floor) rather than candidate space — the plan-quality
        # evidence stays the degree-ordered orientation (O(m^1.5)
        # wedge bound, operators/dedup.py). The 4x cell is capped
        # out: ~20B triangles is pure output volume, and enumerating
        # it teaches nothing the 2x cell's ~8x-output point doesn't.
        ("graph_triangles", lambda: DD.graph_triangles(corpus),
         F.sum("triangles"), 2),
        ("dedup_spans", lambda: DD.repeated_spans(corpus)),
        # pmi_collocations output is a fixed top-100, so its volume
        # signal is the surviving heavy-bigram mass (sum c_ab) — wall
        # should track the tokenize+count scan, i.e. input size
        ("pmi_collocations",
         lambda: TS.pmi_collocations(corpus, min_count=5, top_n=100),
         F.sum("c_ab")),
        # heavy_hitters_cms: hitter COUNT is ~input-invariant (shares
        # don't change when the corpus is replicated); the volume
        # signal is the hitters' total count mass, which scales with
        # input — wall should track the token scan + d×w grid, never
        # the vocabulary pair space
        ("heavy_hitters_cms", lambda: SK.cms_heavy_hitters(corpus),
         F.sum("n")),
    ]:
        name, fn = entry[0], entry[1]
        vol = entry[2] if len(entry) > 2 else None
        max_mult = entry[3] if len(entry) > 3 else max(MULTIPLES)
        if mult > max_mult:
            continue
        t0 = time.time()
        df = fn()
        # bench.py's materialization: a bare count() lets Catalyst
        # ELIMINATE non-duplicating left joins and unreferenced
        # projections (dedup_spans timed 0.2s under count() vs ~6s
        # real) — hashing every column forces full evaluation
        row = df.agg(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
                     (vol if vol is not None
                      else F.count(F.lit(1))).alias("vol")
                     ).collect()[0]
        out[name] = (round(time.time() - t0, 2), int(row["vol"]))
    return out


def main() -> None:
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {m: corpus_times(spark, m) for m in MULTIPLES}
    names = list(results[MULTIPLES[0]])
    lines = [
        "# SCALING — heavy-operator wall time vs corpus size",
        "",
        "Base corpus: sf0.1 documents (embeddings for knn_graph, with",
        "deterministic per-component perturbation so copies don't",
        "collapse into cosine-1 cliques); multiples built by unioning",
        "id-shifted, token-perturbed copies. The copies near-dup each",
        "other, so OUTPUT pairs grow ~14x at 4x input — wall time is",
        "therefore expected to track output (the exact-verify stage's",
        "irreducible per-pair work), and it does; growth beyond the",
        "output curve would indicate a candidate-generation blow-up.",
        "Because output growth (~14x) is close to the quadratic",
        "candidate space (16x), this curve alone cannot separate",
        "bucketed from all-pairs candidates — that evidence is (a) the",
        "plan audits (no CartesianProduct/BroadcastNestedLoopJoin",
        "anywhere in the family) and (b) BASELINE.md, where the",
        "all-pairs single-node oracle formulations blow a 60s cap at",
        "1x while these plans finish in seconds. local[32]; times",
        "include the count action; single-run (noisy - compare",
        "shapes, not single cells).",
        "Regenerate: `PYTHONPATH=. python tools/scale_probe.py`.",
        "",
        "The (volume) column is output rows, except doc_pagerank",
        "(total degree = 2x edges — wall is edge-bound, output is",
        "node-sized) and graph_triangles (total per-node triangle",
        "count = 3x triangles — the exact enumerator's output floor).",
        "",
        "| operator | " + " | ".join(f"{m}x sec (volume)"
                                     for m in MULTIPLES)
        + " | max/1x |",
        "|---|" + "---|" * (len(MULTIPLES) + 1),
    ]
    for name in names:
        cells = []
        for m in MULTIPLES:
            if name not in results[m]:
                cells.append("— (capped)")
                continue
            t, rows = results[m][name]
            cells.append(f"{t:.1f} ({rows:,})")
        probed = [m for m in MULTIPLES if name in results[m]]
        hi, lo = probed[-1], probed[0]
        ratio = results[hi][name][0] / results[lo][name][0]
        lines.append(f"| {name} | " + " | ".join(cells)
                     + f" | {ratio:.1f}x ({hi}x/{lo}x) |")
    with open("SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
