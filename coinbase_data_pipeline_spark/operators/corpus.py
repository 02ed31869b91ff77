"""Corpus-preparation operators for LLM training-data pipelines:
fixed-token chunking, context-window packing, deterministic stratified
sampling, and text normalization.

All four are pure pyspark.sql.functions expressions — JVM-side,
whole-stage-codegen, no UDFs — and each documents its exact DuckDB
twin so the catalog oracles mirror them expression-for-expression.

100 TB posture:
- chunking/normalization are per-row map work: no shuffle at all, the
  explode multiplies rows inside the same task (narrow dependency).
- packing is a SALTED two-pass prefix sum (range-shard the sorted
  key space, cumsum within shard, add tiny per-shard offsets) — no
  single-task per-stratum window; the pack assignment is integer
  math on the running total, so no driver-side loop.
- sampling is a pushed filter over a hash gate — no shuffle, no
  state, reproducible across runs/retries (hash60 of the doc id,
  never rand()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.text import hash60, tokens, word_shingles
from .spread import spread_scan


def doc_chunk(docs: DataFrame, size: int = 64, stride: int = 48,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sliding fixed-token chunks per document (size tokens, stride
    step → size-stride token overlap), the standard pre-tokenization
    split for long documents.

    Chunk count for n tokens: 1 + ceil((n - size) / stride) when
    n > size, else 1; docs with zero tokens are dropped (they have
    nothing to chunk and a 0-length sequence would emit a bogus
    descending range — see functions.text.word_shingles).

    DuckDB twin (1-based inclusive list slices both engines):
      toks[1 + c*stride : c*stride + size]
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    extra = F.ceil((n - F.lit(size)) / F.lit(float(stride)))
    n_chunks = (F.when(n > size, extra.cast("int") + F.lit(1))
                .otherwise(F.lit(1)))
    out = (docs
           .select(F.col(id_col), toks.alias("_toks"),
                   n.alias("n_tokens"), n_chunks.alias("_nc"))
           .filter(F.col("n_tokens") > 0)
           .select(id_col, "n_tokens", "_toks",
                   F.explode(F.sequence(F.lit(0), F.col("_nc") - 1))
                    .alias("chunk_id")))
    start = F.col("chunk_id") * stride + 1
    piece = F.slice(F.col("_toks"), start, size)
    return (out.select(
        id_col, "chunk_id", "n_tokens",
        F.size(piece).alias("chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text")))


def token_packing(docs: DataFrame, budget: int = 512,
                  text_col: str = "text", id_col: str = "doc_id",
                  stratum_col: str = "lang",
                  salts: int | None = None) -> DataFrame:
    """Concat-and-split context-window packing: documents are laid out
    back-to-back per stratum in id order, and the token stream is cut
    every `budget` tokens. Each doc is assigned the pack where it
    starts (pack_id) plus its offset inside that pack — the exact
    bookkeeping a sequence-packing data loader needs.

    SALTED two-pass prefix sum — a bare
    ``Window.partitionBy(stratum)`` cumsum serializes each stratum
    into one task, and a 100 TB mono-lingual corpus is ~one giant
    stratum. Instead:

    1. ``repartitionByRange(salts, stratum, id)`` splits the sorted
       (stratum, id) key space into contiguous range shards; the
       shard id (``spark_partition_id()``) is monotone in the sort
       order, so each (stratum, shard) group is a contiguous slice of
       the stratum's document sequence.
    2. The running total is computed WITHIN (stratum, shard) — every
       shard's window task runs in parallel.
    3. Per-shard token totals (a salts-row aggregate) get their own
       tiny cumulative window per stratum, and the resulting shard
       offsets broadcast-join back — global prefix = local prefix +
       shard offset.

    The output is bit-identical to the single-window formulation for
    ANY shard boundaries (tested property), so the unsalted cumsum
    stays the DuckDB oracle; assignment is BIGINT division of the
    running total, identical in DuckDB. Default salt count is 2×
    cluster parallelism (same sizing rationale as
    operators/dedup._dense_spread).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if salts is None:
        salts = 2 * docs.sparkSession.sparkContext.defaultParallelism
    tok_count = F.size(tokens(F.col(text_col))).cast("long")
    base = (docs.select(stratum_col, id_col, tok_count.alias("n_tokens"))
            .repartitionByRange(salts, F.col(stratum_col), F.col(id_col))
            .withColumn("_salt", F.spark_partition_id()))
    w_local = (Window.partitionBy(stratum_col, "_salt").orderBy(id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    local = base.withColumn(
        "_local", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0)))
    # per-(stratum, shard) totals: at most `salts` rows — the offset
    # window and the join back are both driver-trivial
    w_off = (Window.partitionBy(stratum_col).orderBy("_salt")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (base.groupBy(stratum_col, "_salt")
               .agg(F.sum("n_tokens").alias("_shard_total"))
               .withColumn("_offset",
                           F.coalesce(F.sum("_shard_total").over(w_off),
                                      F.lit(0)))
               .select(stratum_col, "_salt", "_offset"))
    before = F.col("_local") + F.col("_offset")
    return (local.join(F.broadcast(offsets), [stratum_col, "_salt"])
            .select(stratum_col, id_col, "n_tokens",
                    (before / budget).cast("long").alias("pack_id"),
                    (before % budget).alias("pack_offset")))


def stratified_sample(docs: DataFrame, rates: dict[str, float],
                      default_rate: float = 0.1,
                      stratum_col: str = "lang",
                      id_col: str = "doc_id",
                      seed: str = "sample") -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row when
    hash60(seed:id) mod 10000 falls under the stratum's rate. Unlike
    df.sample(), the decision is a pure function of the row id — stable
    across retries, executors and engines (the DuckDB oracle applies
    the same gate), which is what makes a 100 TB sampling job
    reproducible and resumable.
    """
    gate = hash60(F.col(id_col).cast("string"), seed) % 10000
    rate = None
    for k, v in sorted(rates.items()):
        branch = F.when(F.col(stratum_col) == k, F.lit(int(v * 10000)))
        rate = branch if rate is None else rate.when(
            F.col(stratum_col) == k, F.lit(int(v * 10000)))
    rate = (rate.otherwise(F.lit(int(default_rate * 10000)))
            if rate is not None else F.lit(int(default_rate * 10000)))
    return docs.filter(gate < rate)


def text_normalize(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Canonical text form: lowercase alpha tokens re-joined by single
    spaces (case/punctuation/whitespace-run insensitive), plus its
    hash60 fingerprint — the normalization stage exact dedup keys on.

    DuckDB twin: array_to_string(«tokens», ' ') and the shared
    sql_hash60 over it.
    """
    norm = F.array_join(tokens(F.col(text_col)), " ")
    return docs.select(
        id_col,
        norm.alias("norm_text"),
        hash60(norm, "norm").alias("norm_hash"))


def decontaminate(corpus: DataFrame, eval_docs: DataFrame, *,
                  n: int = 5, min_overlap: int = 2,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ≥
    `min_overlap` distinct word n-grams with an evaluation set — the
    standard guard against test-set leakage into training data.

    Plan: the eval side collapses to a DISTINCT n-gram set and is
    BROADCAST (eval suites are fixed-size — thousands of docs — no
    matter how big the corpus gets); the corpus side explodes its
    per-doc distinct n-grams, hits the broadcast join map-side, and
    aggregates per doc — exactly ONE shuffle, keyed by the corpus'
    own doc key. If an eval set ever outgrows broadcast, swap the
    join for a bloom-filter pre-pass + shuffle join; the operator
    shape is unchanged.
    """
    ev_grams = (eval_docs
                .select(F.explode(word_shingles(tokens(F.col(text_col)),
                                                n)).alias("gram"))
                .distinct())
    # tokenize+shingle is the dominant CPU; spread the corpus scan so
    # it doesn't serialize onto a single-row-group input partition
    doc_grams = spread_scan(corpus).select(
        F.col(id_col),
        F.explode(word_shingles(tokens(F.col(text_col)), n))
        .alias("gram"))
    # per-doc shingles are already distinct (word_shingles), so the
    # post-join count IS the distinct-overlap count
    hits = (doc_grams.join(F.broadcast(ev_grams), "gram")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("overlap_ngrams")))
    return (corpus.select(id_col)
            .join(hits, id_col, "left")
            .select(id_col,
                    F.coalesce("overlap_ngrams", F.lit(0))
                    .alias("overlap_ngrams"),
                    (F.coalesce("overlap_ngrams", F.lit(0))
                     >= min_overlap).alias("is_contaminated")))


# scrub patterns shared verbatim by the DuckDB oracle: restricted to
# the syntax subset Java regex and RE2 agree on (no lookarounds, no
# \b word boundaries — RE2 supports \b but with different corner
# semantics around string edges)
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_scrub(docs: DataFrame, *, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Redact emails / phone numbers / IPv4 addresses, reporting
    per-doc match counts and the scrubbed text (+ hash60 fingerprint
    so oracles can value-check the full redacted content cheaply).

    Pure regexp expressions — JVM-side, no shuffle, no UDF; order is
    email → phone → ip (the patterns are mutually non-overlapping,
    order only matters if a future pattern nests inside another).
    """
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(PII_EMAIL))
    scrubbed = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_phone = F.regexp_count(scrubbed, F.lit(PII_PHONE))
    scrubbed = F.regexp_replace(scrubbed, PII_PHONE, "<PHONE>")
    n_ip = F.regexp_count(scrubbed, F.lit(PII_IPV4))
    scrubbed = F.regexp_replace(scrubbed, PII_IPV4, "<IP>")
    return docs.select(
        id_col,
        n_email.cast("int").alias("n_emails"),
        n_phone.cast("int").alias("n_phones"),
        n_ip.cast("int").alias("n_ipv4"),
        scrubbed.alias("text_clean"),
        hash60(scrubbed, "pii").alias("clean_hash"))


def boilerplate_ngrams(docs: DataFrame, *, n: int = 5,
                       min_docs: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-document boilerplate fraction: the share of a doc's
    DISTINCT word n-grams that occur in at least `min_docs` documents
    corpus-wide — the cross-document repeated-content signal web
    pipelines use to strip headers/footers/templates (the
    RefinedWeb/C4 line-dedup idea at n-gram granularity, which works
    on text without line structure).

    Plan: explode per-doc distinct n-grams (narrow) and immediately
    fingerprint each gram to a hash60 LONG — everything downstream
    shuffles 8-byte keys instead of ~n-word strings (the dedup_spans
    recipe). A 60-bit collision would merge two grams' df counts —
    the oracle shares the same fingerprints, so parity is unaffected
    and the probability is vanishing at any corpus size that fits an
    engine. Document frequency comes from a COUNT OVER
    (PARTITION BY gram_h) window on the exploded grams, not a
    groupBy + join-back: the join-back formulation references the
    gram relation twice, and Spark re-executes the whole
    tokenize/shingle/hash stage (the query's dominant CPU cost) for
    each reference — the window computes df in the same shuffled
    pass that already holds every (gram, doc) row, so the corpus is
    tokenized ONCE and one exchange disappears (sf0.1 wall
    11.1s → ~2.5s). Then one groupBy(doc). No driver-side state;
    the gram dictionary is never collected or broadcast, so corpus
    size is unbounded — per-window state is a single running count.
    """
    grams = (spread_scan(docs).select(
        F.col(id_col),
        F.explode(word_shingles(tokens(F.col(text_col)), n))
        .alias("_gram"))
        .select(id_col, hash60(F.col("_gram"), "boiler").alias("gram_h")))
    # per-doc shingles are distinct (word_shingles) → count(docs) = df
    wdf = Window.partitionBy("gram_h")
    per_doc = (grams
               .withColumn("_df", F.count(F.lit(1)).over(wdf))
               .groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum((F.col("_df") >= min_docs).cast("long"))
                    .alias("dup_grams")))
    # UNROUNDED ratio: both engines divide the same two integers, so
    # the quotient double is bit-identical — rounding would only add
    # midpoint-rule divergence (power-of-two gram counts terminate on
    # exact 6dp midpoints)
    frac = (F.when(F.col("n_grams") > 0,
                   F.col("dup_grams").cast("double") / F.col("n_grams"))
            .otherwise(F.lit(0.0)))
    return (docs.select(id_col)
            .join(per_doc, id_col, "left")
            .select(id_col,
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
                    frac.alias("boilerplate_frac")))


def mixture_resample(docs: DataFrame, weights: dict[str, float], *,
                     stratum_col: str = "lang", id_col: str = "doc_id",
                     seed: str = "mix") -> DataFrame:
    """Reweight a corpus toward a target domain MIXTURE by
    subsample-only acceptance (the DoReMi-style static-mixture
    application step): per domain d with observed count n_d and target
    weight w_d, the acceptance rate is (w_d / n_d) scaled so the most
    over-demanded domain keeps everything — no domain is upsampled, so
    the output is a pure deterministic subset.

    Acceptance reuses the hash-gate contract of
    :func:`stratified_sample` (pure function of the doc id —
    reproducible across retries/executors/engines); rates derive from
    a one-row-per-domain count aggregate broadcast back, so the whole
    operator is one tiny stats shuffle + a map-side filter. Domains
    absent from `weights` are dropped (weight 0).
    """
    counts = (docs.filter(F.col(stratum_col).isin(list(weights)))
              .groupBy(stratum_col)
              .agg(F.count(F.lit(1)).alias("_n")))
    wcol = None
    for k, v in sorted(weights.items()):
        branch = (wcol.when if wcol is not None else F.when)(
            F.col(stratum_col) == k, F.lit(float(v)))
        wcol = branch
    demand = wcol.otherwise(F.lit(0.0)) / F.col("_n")
    rates = counts.select(stratum_col, demand.alias("_demand"))
    max_d = rates.agg(F.max("_demand").alias("_dmax"))
    rates = (rates.crossJoin(F.broadcast(max_d))
             .select(stratum_col,
                     F.floor(F.col("_demand") / F.col("_dmax")
                             * F.lit(1000000.0)).alias("_thresh")))
    gate = hash60(F.col(id_col).cast("string"), seed) % 1000000
    return (docs.join(F.broadcast(rates), stratum_col)
            .filter(gate < F.col("_thresh"))
            .drop("_thresh"))


def dsir_weights(docs: DataFrame, *, target_lang: str = "en",
                 buckets: int = 256, id_col: str = "doc_id",
                 text_col: str = "text",
                 lang_col: str = "lang") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by how target-like its hashed-unigram distribution is —
    log w(x) = Σ_b c_b(x) · (ln p_target(b) − ln p_raw(b)) over B
    hash buckets, Laplace-smoothed. Here the target distribution is
    the `target_lang` slice of the corpus itself and raw is the whole
    corpus; in production the target side is any small high-quality
    set fed through the same bucket hash.

    Plan: explode tokens → bucket by hash60%B (narrow) → one
    (doc, bucket) partial-count shuffle → the bucket stats table is B
    rows (target and raw counts aggregate map-side), broadcast back →
    one per-doc fold. Per-doc sums fold over BUCKET-SORTED structs
    (the perplexity_proxy contract) so float summation order is
    oracle-replicable; each term is 6dp-rounded before the fold so
    libm ln() ULP differences can never reach the hash.

    Zero-token docs surface with n_tokens 0 and log_weight 0.0 via
    the corpus left join (same contract as decontaminate).
    """
    bucketed = (docs
                .select(F.col(id_col), F.col(lang_col),
                        F.explode(tokens(F.col(text_col))).alias("tok"))
                .select(id_col, lang_col,
                        (hash60(F.col("tok"), "dsir") % buckets)
                        .alias("bucket")))
    doc_b = (bucketed.groupBy(id_col, "bucket")
             .agg(F.count(F.lit(1)).alias("cnt")))
    stats = (bucketed.groupBy("bucket")
             .agg(F.count(F.lit(1)).alias("cr"),
                  F.sum((F.col(lang_col) == target_lang).cast("long"))
                  .alias("ct")))
    totals = stats.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    lr = (F.log((F.col("ct") + F.lit(1.0))
                / (F.col("nt") + F.lit(float(buckets))))
          - F.log((F.col("cr") + F.lit(1.0))
                  / (F.col("nr") + F.lit(float(buckets)))))
    ratios = (stats.crossJoin(F.broadcast(totals))
              .select("bucket", lr.alias("lr")))
    terms = (doc_b.join(F.broadcast(ratios), "bucket")
             .select(F.col(id_col), "bucket", "cnt",
                     (F.round(F.col("cnt") * F.col("lr"), 6)
                      + F.lit(0.0)).alias("term")))
    ordered_sum = F.aggregate(
        F.transform(F.array_sort(F.collect_list(F.struct("bucket",
                                                         "term"))),
                    lambda s: s.getField("term")),
        F.lit(0.0), lambda acc, x: acc + x)
    agg = terms.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        (F.round(ordered_sum, 6) + F.lit(0.0)).alias("log_weight"))
    return (docs.select(id_col)
            .join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("log_weight", F.lit(0.0))
                    .alias("log_weight")))


def _bpe_apply_merge(syms, a, b):
    """Greedy left-to-right application of merge rule (a, b) to a
    symbol array: scan symbols, replacing each non-overlapping
    adjacent (a, b) with the concatenated symbol — the standard BPE
    merge step, as an array fold (accumulator = merged prefix; a pair
    just created can immediately participate in the NEXT position's
    comparison only via its new concatenated spelling, which is
    exactly BPE's non-overlap rule)."""
    merged = F.concat(a, b)

    def step(acc, x):
        do = (F.element_at(acc, -1) == a) & (x == b)
        return (F.when(do,
                       F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                F.array(merged)))
                .otherwise(F.concat(acc, F.array(x))))

    return F.aggregate(F.slice(syms, 2, F.size(syms) - 1),
                       F.slice(syms, 1, 1), step)


def bpe_train(docs: DataFrame, merges: int = 6, *,
              text_col: str = "text") -> DataFrame:
    """Distributed byte-pair-encoding merge training (Sennrich et al.
    2016): induce the first `merges` BPE merge rules from the corpus —
    per round, count adjacent symbol pairs over the DISTINCT-word
    vocabulary weighted by corpus frequency, pick the most frequent
    pair (ties → lexicographically smallest), and greedily rewrite
    every word's symbol sequence. Words start as character sequences
    with a '</w>' terminal. Returns the merge table
    (merge_rank, left_sym, right_sym, pair_count) — the trained
    tokenizer artifact.

    Scale: the corpus collapses ONCE to (distinct word, count) — the
    only corpus-sized shuffle; every Lloyd-style round then runs over
    the vocabulary relation (~1e8 rows for web scale, far smaller
    than the corpus). Per round: one narrow pair explode + one
    map-side-combining groupBy + a TakeOrdered(1) argmax; the winning
    rule broadcasts back and the rewrite is a row-local array fold.
    Rounds localCheckpoint (the connected_components recipe) so
    lineage stays flat and the two consumers of each round (next
    round's counts + the final merge table) don't recompute it.

    Everything is integer counts and string comparisons — no floats —
    so the whole iterative loop value-hashes against a CTE-for-CTE
    SQL oracle (catalog_corpus).
    """
    _, best_rows = _bpe_pipeline(docs, merges, text_col)
    out = best_rows[0]
    for b in best_rows[1:]:
        out = out.unionByName(b)
    return out


def _bpe_pipeline(docs: DataFrame, merges: int, text_col: str):
    """Shared BPE training loop: returns (final vocabulary relation
    (word, cnt, syms) with ALL `merges` rules applied, list of 1-row
    merge-rule frames). See :func:`bpe_train` for the contract."""
    chars = F.transform(F.sequence(F.lit(1), F.length("word")),
                        lambda i: F.col("word").substr(i, F.lit(1)))
    words = (docs.select(F.explode(tokens(F.col(text_col)))
                         .alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
             .select("word", "cnt",
                     F.concat(chars, F.array(F.lit("</w>")))
                     .alias("syms"))
             .localCheckpoint(eager=True))
    best_rows = []
    for r in range(1, merges + 1):
        idx = F.sequence(F.lit(1), F.size("syms") - 1)
        # guard fully-merged words: once a word collapses to ONE
        # symbol (e.g. 's' + '</w>' merged in an earlier round),
        # size-1 = 0 and Spark's sequence(1, 0) yields the DESCENDING
        # [1, 0] — element_at(syms, 0) then throws
        # INVALID_INDEX_OF_ZERO (found by tools/fuzz_parity.py; the
        # fixed testdata never fully merges a word in 6 rounds, a
        # real corpus with frequent short words does). A single-
        # symbol word has no adjacent pairs — emit none, exactly
        # what the oracle's generate_series(1, 0) = [] does.
        pairs_arr = F.when(
            F.size("syms") >= 2,
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + F.lit(1)).alias("b")))
        ).otherwise(F.array())
        pairs = (words.select("cnt", F.explode(pairs_arr).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count")))
        best = (pairs.orderBy(F.col("pair_count").desc(), "a", "b")
                .limit(1)
                .localCheckpoint(eager=True))
        best_rows.append(best.select(
            F.lit(r).alias("merge_rank"),
            F.col("a").alias("left_sym"), F.col("b").alias("right_sym"),
            "pair_count"))
        words = (words.crossJoin(F.broadcast(best))
                 .select("word", "cnt",
                         _bpe_apply_merge(F.col("syms"), F.col("a"),
                                          F.col("b")).alias("syms"))
                 .localCheckpoint(eager=True))
    return words, best_rows


def bpe_encode(docs: DataFrame, merges: int = 6, *,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Corpus encoded with the BPE rules :func:`bpe_train` induces:
    per document, the word count, the resulting BPE token count and
    the character mass — the compression bookkeeping a tokenizer
    pipeline reports (chars/token, tokens/word).

    The trained vocabulary (word → merged symbol sequence) is the
    BY-PRODUCT of the training loop's final rewrite, so encoding is
    ONE equi-join of the corpus' exploded words against it (AQE sizes
    the join — the vocabulary can be 1e8 rows at web scale, not
    always broadcastable) plus one per-doc aggregate. All-integer
    output — trivially hash-stable.
    """
    words, _ = _bpe_pipeline(docs, merges, text_col)
    vocab = words.select("word", F.size("syms").alias("_n_sym"))
    doc_words = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("word"))
    agg = (doc_words.join(vocab, "word")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_words"),
                F.sum("_n_sym").cast("long").alias("n_bpe_tokens"),
                F.sum(F.length("word")).cast("long").alias("n_chars")))
    return (docs.select(id_col)
            .join(agg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.coalesce("n_bpe_tokens", F.lit(0))
                    .alias("n_bpe_tokens"),
                    F.coalesce("n_chars", F.lit(0)).alias("n_chars")))


def dataset_manifest(docs: DataFrame, n_shards: int = 16, *,
                     id_col: str = "doc_id", text_col: str = "text",
                     seed: str = "shard") -> DataFrame:
    """Export shard plan for a corpus write: every document is
    assigned a shard by the deterministic hash gate (pure function of
    the doc id — stable across retries/engines, the
    stratified_sample contract), and the manifest reports per shard
    the doc count, token mass, char mass, id range and an
    ORDER-INDEPENDENT membership fingerprint (bit_xor of each
    member's id hash) — what a 100 TB training-data export needs to
    plan, verify and resume shard-parallel writes.

    One map-side-combining shuffle on the shard key (n_shards rows
    out); xor is commutative/associative, so the fingerprint needs no
    ordered fold and stays a plain JVM aggregate.
    """
    shard = (hash60(F.col(id_col).cast("string"), seed)
             % n_shards).alias("shard")
    base = docs.select(
        shard, F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("_nt"),
        F.length(text_col).cast("long").alias("_nc"),
        hash60(F.col(id_col).cast("string"), "member").alias("_mh"))
    return (base.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_nt").alias("total_tokens"),
                 F.sum("_nc").alias("total_chars"),
                 F.min(id_col).alias("min_doc_id"),
                 F.max(id_col).alias("max_doc_id"),
                 F.expr("bit_xor(_mh)").alias("members_hash")))


def dsir_select(docs: DataFrame, *, target_lang: str = "en",
                buckets: int = 256, quantile: float = 0.75,
                id_col: str = "doc_id", text_col: str = "text",
                lang_col: str = "lang") -> DataFrame:
    """The DSIR SELECTION step on top of :func:`dsir_weights`: keep
    the documents whose importance weight clears the corpus-wide
    `quantile` threshold — the deterministic counterpart of the
    paper's Gumbel-top-k resampling (no randomness: same corpus, same
    selection, any engine).

    The threshold is one exact-percentile aggregate over the
    6dp-gridded weights (linear interpolation of two gridded doubles
    — identical in both engines, the price_quantiles contract),
    broadcast back over the weight relation; the comparison therefore
    needs no further rounding.
    """
    w = dsir_weights(docs, target_lang=target_lang, buckets=buckets,
                     id_col=id_col, text_col=text_col,
                     lang_col=lang_col)
    w = w.join(docs.select(id_col, lang_col), id_col)
    thr = w.agg(F.percentile("log_weight", F.lit(quantile))
                .alias("_thr"))
    return (w.crossJoin(F.broadcast(thr))
            .select(id_col, lang_col, "n_tokens", "log_weight",
                    (F.col("log_weight") >= F.col("_thr"))
                    .alias("is_selected")))


def vocab_build(docs: DataFrame, vocab_size: int = 1000, *,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Frequency-ranked tokenizer vocabulary: the top `vocab_size`
    tokens by corpus term frequency, with token ids assigned by
    (tf DESC, token ASC) starting at 1 — id 0 is reserved for
    OOV/padding (see :func:`token_id_encode`). Also reports document
    frequency per entry.

    Plan: explode → (doc, token) partial counts → per-token (tf, df)
    aggregate → global top-V. The top-V select is orderBy + limit
    (TakeOrdered — a parallel partial top-k, no global sort); only
    the V surviving rows pass through the single-partition ranking
    window, which is how a global rank over a 100 TB corpus stays a
    driver-sized problem.
    """
    doc_tok = (docs.select(F.col(id_col),
                           F.explode(tokens(text_col)).alias("tok"))
               .groupBy(id_col, "tok")
               .agg(F.count(F.lit(1)).alias("cnt")))
    stats = doc_tok.groupBy("tok").agg(
        F.sum("cnt").alias("tf"),
        F.count(F.lit(1)).alias("df"))
    top = stats.orderBy(F.col("tf").desc(), "tok").limit(vocab_size)
    w = Window.orderBy(F.col("tf").desc(), "tok")
    return (top.withColumn("token_id", F.row_number().over(w)
                           .cast("long"))
            .select("token_id", F.col("tok").alias("token"), "tf", "df"))


def token_id_encode(docs: DataFrame, vocab: DataFrame, *,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Encode every document against a vocabulary: per doc, the token
    count, the OOV count and a 60-bit fingerprint of the full id
    sequence IN TOKEN ORDER (ids comma-joined then hashed — the
    engine-portable stand-in for shipping the raw id array, which the
    value-hash gate could not compare order-sensitively otherwise).

    Plan: posexplode keeps each token's position; the vocabulary is a
    dictionary equi-join (broadcast-sized by construction — top-V);
    per-doc reassembly sorts collected (pos, id) structs, so the
    sequence order is deterministic under any partitioning. Docs with
    zero tokens drop out (nothing to encode).
    """
    pos_tok = docs.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "tok"))
    enc = (pos_tok.join(F.broadcast(vocab.select("token_id",
                                                 F.col("token")
                                                 .alias("tok"))),
                        "tok", "left")
           .select(id_col, "pos",
                   F.coalesce("token_id", F.lit(0)).alias("tid")))
    ids_in_order = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tid"))),
        lambda s: s.getField("tid"))
    agg = enc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum((F.col("tid") == 0).cast("long")).alias("n_oov"),
        ids_in_order.alias("ids"))
    return agg.select(
        F.col(id_col), "n_tokens", "n_oov",
        hash60(F.array_join(F.transform("ids",
                                        lambda i: i.cast("string")),
                            ",")).alias("ids_hash"))


def fixed_k_sample(docs: DataFrame, k: int = 20, *,
                   id_col: str = "doc_id",
                   stratum_col: str = "lang") -> DataFrame:
    """EXACTLY-k deterministic uniform sample per stratum: the k
    smallest (hash60(id), id) rows of each stratum — the fixed-size
    complement to the rate-based stratified_sample (eval sets, human
    review batches and few-shot pools need exact counts, and
    hash-ordering makes the draw reproducible across runs, engines
    and retries; no rand(), no reservoir state).

    Scale shape: a bare per-stratum row_number window serializes each
    stratum into one task (the token_packing lesson). Instead the
    hash gate prefilters to ~k + 6·√k + 16 expected survivors per
    stratum (the k-th smallest of n uniform hashes concentrates at
    k/n; the margin puts the miss probability at Chernoff-tail
    negligible), and the window ranks only survivors. Exactness
    NEVER depends on the gate: a per-stratum conditional count
    checks how many survived, and any stratum with fewer than k
    survivors falls back to ranking all its rows. Output is the
    definition itself — the simple ungated window is the oracle.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = hash60(F.col(id_col).cast("string"), "ksample")
    base = docs.select(F.col(stratum_col), F.col(id_col), h.alias("_h"))
    margin = float(k + 6 * (k ** 0.5) + 16)
    # gate fraction of the 60-bit hash space; 2^60 per functions.text
    gate = (F.col("_h").cast("double")
            < F.least(F.lit(1.0), F.lit(margin) / F.col("_n"))
            * F.lit(float(1 << 60)))
    counts = (base.groupBy(stratum_col)
              .agg(F.count(F.lit(1)).alias("_n")))
    flagged = base.join(F.broadcast(counts), stratum_col)
    surv = (flagged.groupBy(stratum_col)
            .agg(F.sum(F.when(gate, 1).otherwise(0)).alias("_gn")))
    cand = (flagged.join(F.broadcast(surv), stratum_col)
            .filter((F.col("_gn") < k) | gate))
    w = Window.partitionBy(stratum_col).orderBy("_h", id_col)
    return (cand.withColumn("sample_rank",
                            F.row_number().over(w).cast("int"))
            .filter(F.col("sample_rank") <= k)
            .select(stratum_col, id_col, "sample_rank"))


def epoch_shuffle(docs: DataFrame, epoch: int, *,
                  id_col: str = "doc_id",
                  shards: int = 1024) -> DataFrame:
    """Deterministic per-epoch global shuffle order — the reference
    data loader's ``DataLoader(shuffle=True)`` re-shuffle
    (Crypto-TS-Model-master/src/train.py dataloader setup) as a
    relation: epoch_pos is the doc's 1-based position in a
    permutation that is a pure function of (id, epoch). The same
    epoch yields the same order on any engine, partitioning or
    retry (the reference's torch RNG draw is none of those), and a
    new epoch re-rolls the whole permutation — set_epoch as a column
    constant, completing the loader behaviors alongside
    curriculum_augment (steps 1-5) and curriculum_feature_dropout
    (step 6).

    Scale shape: sort key is hash60(id:e{epoch}) — uniform over the
    60-bit space, so :func:`..operators.ranking.exact_group_rank`'s
    level-1 equal-width bins are balanced BY CONSTRUCTION and the
    adaptive level-2 zoom is skipped (resolution2=1 — one fewer
    aggregate pass over the corpus; the skew machinery exists for
    value-ranked inputs, not hash keys).
    One (group, shard) exchange ranks everything; no unpartitioned
    window, no global sort. A trainer materializes epoch order by
    sorting each shard-sized slice on (epoch_pos) — or just reads
    shards in shard order, which IS the permutation order.
    """
    from .ranking import exact_group_rank

    key = F.concat(F.col(id_col).cast("string"), F.lit(f":e{int(epoch)}"))
    base = docs.select(
        F.col(id_col),
        hash60(key, "eshuf").alias("shuffle_key"),
        F.lit(1).alias("_g"))
    ranked = exact_group_rank(base, "_g", "shuffle_key", id_col,
                              shards=shards, resolution2=1,
                              out="epoch_pos")
    return ranked.select(id_col, "shuffle_key", "epoch_pos")
