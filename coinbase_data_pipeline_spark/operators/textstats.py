"""Text analysis: language ID, quality scoring, token counting,
document fingerprinting (SURVEY.md §2 extensions).

All pure pyspark.sql.functions expressions (JVM codegen, no UDFs);
each has an expression-for-expression DuckDB oracle twin. The
heuristics are the operator's *defined semantics* — deterministic and
engine-portable — not attempts to recover the synthetic `lang` label
(the testdata text is identical word salad for every lang value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens
from .spread import spread_scan

# tiny per-language stopword lists for the heuristic scorer
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "los", "es"],
    "fr": ["le", "la", "de", "et", "les", "des", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "den"],
}


def _lang_signals(text_col: str = "text"):
    """(pred_lang Column, per-language hit-count Columns) — the ONE
    implementation of the language heuristic, shared by the batch
    lang_id operator and the streaming ingest scorer."""
    toks = tokens(text_col)

    def _in(words):
        # closure factory: a 2-param lambda would be read by F.filter
        # as an (element, index) function
        arr = F.array(*[F.lit(w) for w in words])
        return lambda t: F.array_contains(arr, t)

    scores = {}
    for lang, words in LANG_STOPWORDS.items():
        scores[lang] = F.size(F.filter(toks, _in(words)))
    has_cjk = F.col(text_col).rlike("[\\u4e00-\\u9fff]")
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ("es", "fr", "de"):
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    pred = F.when(has_cjk, F.lit("zh")).otherwise(best)
    return pred, scores


def lang_pred(text_col: str = "text"):
    """The pred_lang expression alone (CJK → zh, else the stopword
    list with the most hits, ties → en)."""
    return _lang_signals(text_col)[0]


def lang_id(docs: DataFrame, *, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK characters → zh; otherwise the
    stopword list with the most hits wins; ties / no hits → en.
    Tie-break order is the fixed list en > es > fr > de."""
    pred, scores = _lang_signals(text_col)
    return spread_scan(docs).select(
        F.col(id_col), pred.alias("pred_lang"),
        *[scores[lang].alias(f"hits_{lang}") for lang in LANG_STOPWORDS])


def quality_columns(text_col: str = "text") -> dict:
    """Named quality expressions (UNROUNDED) — the ONE implementation
    of the quality heuristics, shared by the batch quality_score
    operator and the streaming ingest scorer."""
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    mean_tok_len = F.when(n_tokens > 0,
                          F.aggregate(toks, F.lit(0),
                                      lambda a, x: a + F.length(x))
                          .cast("double") / n_tokens).otherwise(F.lit(0.0))
    n_punct = F.size(F.split(t, "[.,;:!?]")) - 1
    punct_ratio = F.when(n_chars > 0,
                         n_punct.cast("double") / n_chars).otherwise(0.0)
    en = F.array(*[F.lit(w) for w in LANG_STOPWORDS["en"]])
    stop_ratio = F.when(n_tokens > 0,
                        F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
                        .cast("double") / n_tokens).otherwise(0.0)
    length_ok = ((n_chars >= 50) & (n_chars <= 10000)).cast("double")
    tok_len_ok = ((mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)) \
        .cast("double")
    score = (0.4 * length_ok + 0.3 * tok_len_ok
             + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0)))
    return {"n_chars": n_chars, "n_tokens": n_tokens,
            "mean_token_len": mean_tok_len, "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio, "quality": score}


def quality_score(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality heuristics with a
    blended 0-1 score (mirrors common pretraining-data filters)."""
    qc = quality_columns(text_col)
    return spread_scan(docs).select(
        F.col(id_col), qc["n_chars"].alias("n_chars"),
        qc["n_tokens"].alias("n_tokens"),
        F.round(qc["mean_token_len"], 6).alias("mean_token_len"),
        F.round(qc["punct_ratio"], 6).alias("punct_ratio"),
        F.round(qc["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(qc["quality"], 6).alias("quality"))


def source_cap(docs: DataFrame, k: int, *, id_col: str = "doc_id",
               source_col: str = "source",
               text_col: str = "text") -> DataFrame:
    """Per-source quality cap — domain balancing: keep each source's
    k highest-quality documents (the standard web-corpus move for
    stopping one crawl domain from dominating the mixture; the
    rate-based complement is mixture_resample, the uniform complement
    fixed_k_sample). Ranking key is the 6dp-rounded blended quality
    (engine-identical by construction — the oracled quality_score
    expression) with id tiebreak, so the kept set is deterministic
    across runs, engines and retries.

    Scale shape: ONE scan (quality computed inline, no self-join),
    then row_number + rank-filter, which Spark compiles to a PARTIAL
    WindowGroupLimit below the source exchange (plan-audited in
    tests/test_plans.py): every map task pre-prunes to its local
    top-k per source before shuffling, so a mega-source ships
    O(k · map_partitions) rows — never its full row count — and the
    final per-source sort ranks survivors only. fixed_k_sample's
    hash-gate prefilter doesn't transfer here (quality is not
    uniform); the group-limit pushdown gives the same bound without
    a prefilter."""
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError("k must be positive")
    qc = quality_columns(text_col)
    base = spread_scan(docs).select(
        F.col(source_col), F.col(id_col),
        (F.round(qc["quality"], 6) + F.lit(0.0)).alias("quality"))
    w = Window.partitionBy(source_col).orderBy(
        F.col("quality").desc(), F.col(id_col))
    return (base.withColumn("src_rank",
                            F.row_number().over(w).cast("int"))
            .filter(F.col("src_rank") <= k)
            .select(source_col, id_col, "quality", "src_rank"))


def token_count_cols(text_col: str = "text"):
    """(ws_tokens, bpe_tokens) expressions — shared by the batch
    token_count operator and the streaming ingest scorer."""
    t = F.col(text_col)
    ws = F.size(F.filter(F.split(t, "\\s+"), lambda x: F.length(x) > 0))
    bpe = F.size(F.regexp_extract_all(
        F.lower(t), F.lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), F.lit(0)))
    return ws, bpe


def token_count(docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword proxy count
    (runs of letters / single digits / single other non-space)."""
    ws, bpe = token_count_cols(text_col)
    return spread_scan(docs).select(F.col(id_col),
                       ws.alias("ws_tokens"),
                       bpe.alias("bpe_tokens"))


def ngram_doc_frequency(docs: DataFrame, top_n: int = 20, *,
                        text_col: str = "text", n: int = 2) -> DataFrame:
    """Corpus-level top-N word n-grams by DOCUMENT frequency (count of
    docs containing the n-gram — dedupe-robust, unlike raw term
    frequency). n-grams are adjacent words of the ORIGINAL token
    sequence (order-defined in any engine), distinct within each doc.
    explode → count — the word-count plan with map-side partial
    aggregation; the top-N is a single global sort of the (tiny)
    distinct-ngram aggregate."""
    from ..functions.text import word_shingles

    grams = word_shingles(tokens(text_col), n)
    exploded = docs.select(F.explode(grams).alias("ngram"))
    counts = exploded.groupBy("ngram").agg(
        F.count(F.lit(1)).alias("doc_freq"))
    return (counts.orderBy(F.col("doc_freq").desc(), F.col("ngram"))
            .limit(top_n))


def tfidf_top_terms(docs: DataFrame, top_n: int = 3, *,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-N TF-IDF terms per document.

    tf = term count within the doc (full token list), idf =
    ln(N / doc_freq) with doc_freq = #docs containing the term.
    Plan: one explode → (doc, term) counts → per-term doc_freq
    aggregate joined back (term dictionary is vastly smaller than the
    corpus → broadcast) → per-doc top-N window. Ties break on term
    text for determinism.
    """
    from pyspark.sql import Window

    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("_n_docs"))
    terms = docs.select(F.col(id_col),
                        F.explode(tokens(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("doc_freq"))
    scored = (tf.join(F.broadcast(df_), "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("tfidf",
                          F.round(F.col("tf")
                                  * F.log(F.col("_n_docs")
                                          / F.col("doc_freq")), 6)
                          + F.lit(0.0)))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_n)
            .select(id_col, "term",
                    F.col("tf").alias("term_count"), "tfidf",
                    F.col("rank").cast("int").alias("rank")))


def doc_fingerprint(docs: DataFrame, *, id_col: str = "doc_id",
                    text_col: str = "text", gram: int = 8,
                    stride: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over character 8-grams
    sampled every `stride` chars (+ doc length). Deterministic,
    shuffle-free, engine-portable."""
    t = F.col(text_col)
    starts = F.sequence(F.lit(1),
                        F.greatest(F.length(t) - (gram - 1), F.lit(1)),
                        F.lit(stride))
    grams = F.transform(starts, lambda i: F.md5(t.substr(i, F.lit(gram))))
    return docs.select(F.col(id_col),
                       F.array_min(grams).alias("fingerprint"),
                       F.length(t).alias("n_chars"))


def repetition_score(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Token-level repetition metrics per document — the standard
    boilerplate/template detector in training-data curation (heavily
    repeated tokens → low-information doc): total and distinct token
    counts, duplicate-token ratio (1 - distinct/total) and the share
    of the single most frequent token.

    Plan: explode → (doc, token) partial-count → per-doc aggregate;
    two map-side-combining shuffles keyed by doc id, no per-doc
    quadratic expression work. Docs with zero alpha tokens drop out
    (nothing to score) — identical in the oracle.
    """
    tok = (docs.select(F.col(id_col),
                       F.explode(tokens(text_col)).alias("tok"))
           .groupBy(id_col, "tok")
           .agg(F.count(F.lit(1)).alias("cnt")))
    out = tok.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("_top"))
    dup = 1.0 - F.col("n_distinct") / F.col("n_tokens")
    top = F.col("_top") / F.col("n_tokens")
    return out.select(
        id_col, "n_tokens", "n_distinct",
        (F.round(dup, 6) + F.lit(0.0)).alias("dup_ratio"),
        (F.round(top, 6) + F.lit(0.0)).alias("top_token_share"))


# Gopher rule-filter constants (Rae et al. 2021, Appendix A —
# MassiveWeb heuristics). The stopword rule uses the paper's 8-word
# list; line-based rules (ellipsis-line ratio, bullet ratio) are N/A
# for this corpus schema (documents carry no line structure) and are
# intentionally omitted rather than faked.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOPWORDS = 2


def gopher_quality(docs: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021): per-doc quality
    signals + one boolean per rule + the conjunction `keep`.

    Signals (whitespace words, not alpha tokens — the paper counts
    words as written): word count in [50, 100k]; mean word length in
    [3, 10]; symbol-to-word ratio ('#' and '...') <= 0.1; >= 80% of
    words contain an alphabetic character; >= 2 distinct stopwords
    from the paper's 8-word list.

    Pure expression work — zero shuffles, whole-stage codegen; the
    scan reads only (doc_id, text). Empty/whitespace-only docs yield
    word_count 0 and fail the word-count rule (ratios NULL).
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, "\\s+"), lambda x: F.length(x) > 0)
    wc = F.size(words)
    mean_len = F.when(wc > 0,
                      F.aggregate(words, F.lit(0),
                                  lambda a, x: a + F.length(x))
                      .cast("double") / wc)
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(t)
                  - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = F.when(wc > 0, (n_hash + n_ellipsis) / wc)
    alpha_words = F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
    alpha_frac = F.when(wc > 0, alpha_words.cast("double") / wc)
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(
        F.array_distinct(F.transform(words, F.lower)), stop_arr))
    r_wc = (wc >= GOPHER_MIN_WORDS) & (wc <= GOPHER_MAX_WORDS)
    r_len = ((mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
             & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN))
    r_sym = symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO
    r_alpha = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    r_stop = n_stop >= GOPHER_MIN_STOPWORDS
    keep = (r_wc & F.coalesce(r_len, F.lit(False))
            & F.coalesce(r_sym, F.lit(False))
            & F.coalesce(r_alpha, F.lit(False)) & r_stop)
    return docs.select(
        F.col(id_col), wc.alias("word_count"),
        (F.round(mean_len, 6) + F.lit(0.0)).alias("mean_word_len"),
        (F.round(symbol_ratio, 6) + F.lit(0.0)).alias("symbol_ratio"),
        (F.round(alpha_frac, 6) + F.lit(0.0)).alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        r_wc.alias("rule_word_count"),
        F.coalesce(r_len, F.lit(False)).alias("rule_mean_word_len"),
        F.coalesce(r_sym, F.lit(False)).alias("rule_symbol_ratio"),
        F.coalesce(r_alpha, F.lit(False)).alias("rule_alpha_frac"),
        r_stop.alias("rule_stopwords"),
        keep.alias("keep"))


def perplexity_proxy(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Self-trained unigram-LM perplexity per document — the shape of
    the CCNet/Gopher LM-based quality filter with the corpus itself
    as the language model: p(t) = (tf(t) + 1) / (N + V) (Laplace),
    avg_nll = mean over token occurrences of -ln p(t), perplexity =
    exp(avg_nll). High perplexity → tokens rare in this corpus →
    off-distribution / junk candidate.

    Plan: explode → (doc, token) counts → token-frequency dictionary
    join (dictionary is vocabulary-sized — tfidf's broadcast shape) →
    per-doc ordered fold. The per-doc sum runs over (token, term)
    structs SORTED BY TOKEN, not a groupBy SUM of doubles, so the
    summation order is engine-replicable and results value-hash
    (partition-order float sums never are). Scalars N and V travel as
    one broadcast aggregate row — no collect.
    """
    tok = (docs.select(F.col(id_col),
                       F.explode(tokens(text_col)).alias("tok"))
           .groupBy(id_col, "tok")
           .agg(F.count(F.lit(1)).alias("cnt")))
    tf = tok.groupBy("tok").agg(F.sum("cnt").alias("tf"))
    corpus = tf.agg(F.sum("tf").alias("n_corpus"),
                    F.count(F.lit(1)).alias("v_corpus"))
    nll = -F.log((F.col("tf") + F.lit(1.0))
                 / (F.col("n_corpus") + F.col("v_corpus")))
    terms = (tok.join(tf, "tok")
             .crossJoin(F.broadcast(corpus))
             .select(F.col(id_col), "tok", "cnt",
                     (F.round(F.col("cnt") * nll, 6) + F.lit(0.0))
                     .alias("term")))
    ordered_sum = F.aggregate(
        F.transform(F.array_sort(F.collect_list(F.struct("tok", "term"))),
                    lambda s: s.getField("term")),
        F.lit(0.0), lambda acc, x: acc + x)
    agg = terms.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        ordered_sum.alias("nll_sum"))
    q = F.col("nll_sum") / F.col("n_tokens")
    return agg.select(
        F.col(id_col), "n_tokens",
        (F.round(q, 6) + F.lit(0.0)).alias("avg_nll"),
        (F.round(F.exp(q), 6) + F.lit(0.0)).alias("perplexity"))


def _ordered_fold(order_col: str, term_col: str):
    """Sum `term_col` doubles in `order_col` order via a sorted-struct
    fold — the engine-replicable alternative to a partition-order
    groupBy SUM (the perplexity/pagerank contract)."""
    return F.aggregate(
        F.transform(F.array_sort(F.collect_list(
            F.struct(order_col, term_col))),
            lambda s: s.getField(term_col)),
        F.lit(0.0), lambda acc, x: acc + x)


def quality_classifier(docs: DataFrame, *, target_lang: str = "en",
                       buckets: int = 64, iterations: int = 3,
                       lr: float = 0.5, shards: int = 256,
                       id_col: str = "doc_id", text_col: str = "text",
                       lang_col: str = "lang"):
    """Distributed full-batch logistic regression over hashed
    term-frequency features — the fastText-style quality-classifier
    shape (target = the `target_lang` slice standing in for curated
    positives; in production the label column is any curated set fed
    through the same feature hash).

    Per doc: x_b = cnt_b / n_tokens over `buckets` hash buckets plus a
    bias feature (bucket -1, x = 1). `iterations` rounds of
    w += lr/N · Xᵀ(y − σ(Xw)), every weight 6dp-rounded per round.
    Returns (weights, scores): the trained weight vector
    (bucket, weight) and per-doc (p, predicted) under it.

    Determinism at scale — every float crossing an engine boundary is
    either a ratio of identical values or 6dp-rounded, and every sum
    folds in a defined order. The per-doc dot product folds over
    bucket-sorted structs (bounded: ≤ buckets+1 terms). The GRADIENT
    sum per bucket spans the whole corpus, so a single sorted fold
    would collect N-row arrays; instead it reduces through a TWO-LEVEL
    deterministic sum tree: docs shard by doc_id % `shards`, terms
    fold doc-ordered within a shard (6dp partial), shard partials fold
    shard-ordered — bounded arrays at every level, same answer on any
    partitioning, CTE-mirrorable. σ() is libm exp, so p rounds to 6dp
    before the residual (the perplexity ln() rule).

    Plan per round: features ⨝ broadcast weights (buckets+1 rows) →
    per-doc fold (one doc-keyed shuffle) → residual joins back on the
    corpus key (co-partitioned) → (bucket, shard) partial →
    bucket-level fold (tiny). Features checkpoint once; rounds extend
    lazily off that flat base.
    """
    from ..functions.text import hash60

    tok = (docs.select(F.col(id_col),
                       F.explode(tokens(F.col(text_col))).alias("tok"))
           .select(id_col, (hash60(F.col("tok"), "qcls") % buckets)
                   .alias("bucket"))
           .groupBy(id_col, "bucket")
           .agg(F.count(F.lit(1)).alias("cnt")))
    n_tok = tok.groupBy(id_col).agg(F.sum("cnt").alias("n"))
    labels = docs.select(
        F.col(id_col),
        (F.col(lang_col) == target_lang).cast("double").alias("y"))
    feats = (tok.join(n_tok, id_col)
             .select(id_col, "bucket",
                     (F.col("cnt").cast("double") / F.col("n"))
                     .alias("x"))
             .unionByName(docs.select(F.col(id_col),
                                      F.lit(-1).alias("bucket"),
                                      F.lit(1.0).alias("x")))
             .join(labels, id_col)
             .localCheckpoint(eager=True))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = (feats.select("bucket").distinct()
         .select("bucket", F.lit(0.0).alias("w")))
    for _ in range(iterations):
        z = (feats.join(F.broadcast(w), "bucket")
             .select(id_col, "y",
                     (F.col("x") * F.col("w")).alias("term"),
                     "bucket")
             .groupBy(id_col, "y")
             .agg(_ordered_fold("bucket", "term").alias("z")))
        resid = z.select(
            F.col(id_col),
            (F.col("y")
             - (F.round(F.lit(1.0)
                        / (F.lit(1.0) + F.exp(-F.col("z"))), 6)
                + F.lit(0.0))).alias("err"))
        partial = (feats.join(resid, id_col)
                   .select("bucket",
                           (F.col(id_col) % shards).alias("shard"),
                           F.col(id_col),
                           (F.col("x") * F.col("err")).alias("term"))
                   .groupBy("bucket", "shard")
                   .agg((F.round(_ordered_fold(id_col, "term"), 6)
                         + F.lit(0.0)).alias("part")))
        grad = (partial.groupBy("bucket")
                .agg(_ordered_fold("shard", "part").alias("g")))
        w = (w.join(grad, "bucket", "left")
             .crossJoin(F.broadcast(n_docs))
             .select("bucket",
                     (F.round(F.col("w")
                              + F.lit(lr) * F.coalesce("g", F.lit(0.0))
                              / F.col("n_docs"), 6)
                      + F.lit(0.0)).alias("w"))
             .localCheckpoint(eager=True))
    z = (feats.join(F.broadcast(w), "bucket")
         .select(id_col, "y", (F.col("x") * F.col("w")).alias("term"),
                 "bucket")
         .groupBy(id_col, "y")
         .agg(_ordered_fold("bucket", "term").alias("z")))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6) \
        + F.lit(0.0)
    scores = z.select(F.col(id_col), F.col("y").cast("int").alias("y"),
                      p.alias("p"), (p >= 0.5).alias("predicted"))
    weights = w.select("bucket", F.col("w").alias("weight"))
    return weights, scores


def token_entropy(docs: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Within-document token-distribution Shannon entropy — the
    gibberish/degenerate-text detector complementary to
    perplexity_proxy (which scores a doc against the CORPUS
    distribution; this scores the doc against ITSELF). Near-zero
    entropy → one token repeated (degenerate); entropy near
    ln(distinct) → flat distribution.

    H = ln(n) - (1/n) * sum_t c_t ln c_t over per-doc token counts;
    norm_entropy = H / ln(distinct_tokens) in [0, 1] (0 when a doc
    has <= 1 distinct token). The sum_t c_t ln c_t folds over
    token-SORTED structs with 6dp-rounded terms (the perplexity
    contract), so results value-hash cross-engine.

    Plan: explode → one (doc, token) count shuffle (map-side
    combining) → one per-doc aggregate. No joins, no dictionary —
    entropy needs only the doc's own counts.
    """
    tok = (docs.select(F.col(id_col),
                       F.explode(tokens(text_col)).alias("tok"))
           .groupBy(id_col, "tok")
           .agg(F.count(F.lit(1)).alias("cnt")))
    terms = tok.select(
        F.col(id_col), "tok", "cnt",
        (F.round(F.col("cnt") * F.log(F.col("cnt").cast("double")), 6)
         + F.lit(0.0)).alias("term"))
    agg = terms.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("distinct_tokens"),
        _ordered_fold("tok", "term").alias("clogc"))
    h = (F.log(F.col("n_tokens").cast("double"))
         - F.col("clogc") / F.col("n_tokens"))
    hr = F.round(h, 6) + F.lit(0.0)
    norm = F.when(F.col("distinct_tokens") > 1,
                  F.round(hr / F.log(F.col("distinct_tokens")
                                     .cast("double")), 6) + F.lit(0.0)) \
            .otherwise(F.lit(0.0))
    out = agg.select(
        F.col(id_col), F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("distinct_tokens").cast("long").alias("distinct_tokens"),
        hr.alias("entropy"), norm.alias("norm_entropy"))
    return (docs.select(id_col).join(out, id_col, "left")
            .select(id_col,
                    F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                    F.coalesce("distinct_tokens", F.lit(0))
                     .alias("distinct_tokens"),
                    F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
                    F.coalesce("norm_entropy", F.lit(0.0))
                     .alias("norm_entropy")))


def bm25_search(docs: DataFrame, queries: DataFrame, *, k1: float = 1.2,
                b: float = 0.75, top_n: int = 10,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """BM25 ranked retrieval over the corpus for a (small) query set —
    the lexical-search capability that sits beside the ANN family:
    score(q, d) = Σ_t idf(t) · tf(t,d)·(k1+1) /
                          (tf(t,d) + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)); top_n docs per query
    by (score DESC, doc_id).

    `queries` is (query_id, query_text) and is broadcast — the query
    side is human-sized, the corpus side is not.

    Floats: tf/df/dl/N are engine-identical integers, avgdl an
    unrounded ratio of integer aggregates, idf libm-ln of identical
    doubles; each term score rounds to 6dp and the per-(query, doc)
    sum folds in TERM order (bounded by query length) — the
    perplexity float contract, so results value-hash.

    Plan: one (doc, token) count shuffle; df is a vocabulary-sized
    aggregate restricted to query terms; scoring joins are equi-joins
    on token with the tiny query-term side broadcast; the final top-n
    is a per-query window over only the matched docs.
    """
    from pyspark.sql import Window

    qterms = (queries.select("query_id",
                             F.explode(F.array_distinct(
                                 tokens(F.col("query_text"))))
                             .alias("tok")))
    doc_tok = (docs.select(F.col(id_col),
                           F.explode(tokens(text_col)).alias("tok"))
               .groupBy(id_col, "tok")
               .agg(F.count(F.lit(1)).alias("tf")))
    dl = doc_tok.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    corpus = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    avg = (dl.agg(F.sum("dl").alias("_tot"), F.count(F.lit(1)).alias("_n"))
           .select((F.col("_tot").cast("double") / F.col("_n"))
                   .alias("avgdl")))
    # df restricted to query terms: vocabulary-sized aggregate,
    # query-side broadcast
    dfreq = (doc_tok.join(F.broadcast(qterms.select("tok").distinct()),
                          "tok")
             .groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1 - b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")))
    term = F.round(idf * F.col("tf") * F.lit(k1 + 1) / denom, 6) \
        + F.lit(0.0)
    scored = (doc_tok
              .join(F.broadcast(qterms), "tok")
              .join(F.broadcast(dfreq), "tok")
              .join(dl, id_col)
              .crossJoin(F.broadcast(corpus))
              .crossJoin(F.broadcast(avg))
              .select("query_id", F.col(id_col), "tok",
                      term.alias("term")))
    agg = (scored.groupBy("query_id", id_col)
           .agg(_ordered_fold("tok", "term").alias("score"),
                F.count(F.lit(1)).alias("n_matched_terms")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col))
    return (agg.select("query_id", id_col,
                       (F.round(F.col("score"), 6) + F.lit(0.0))
                       .alias("score"),
                       "n_matched_terms")
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= top_n))


def pmi_collocations(docs: DataFrame, *, text_col: str = "text",
                     min_count: int = 5, top_n: int = 100) -> DataFrame:
    """Corpus collocations: adjacent-token pairs ranked by pointwise
    mutual information — the statistic that separates genuinely bound
    phrases ("machine learning") from merely frequent neighbours
    ("of the"). A corpus-analysis staple next to ngram_doc_frequency
    (which ranks by raw frequency).

    pmi(a,b) = ln( p(ab) / (p(a)·p(b)) ) with p(ab) = c_ab / M over
    bigram occurrences and p(a) = c_a / N over token occurrences.
    Rare accidental pairs (the PMI pathology) are cut by `min_count`.

    Plan shape at 100 TB: two explode→groupBy counts (both map-side
    combining, keyed on the token/bigram string); the unigram table is
    the VOCABULARY — corpus-independent small — so both join-backs
    broadcast; the two corpus totals are single-row broadcast
    cross-joins; the final top-N sorts only the min_count-surviving
    bigram aggregate. The probe side never shuffles by doc.
    """
    from .spread import spread_scan

    # tokenize ONCE: three consumers below (unigram counts, bigram
    # counts, corpus totals) would otherwise each re-run the tokenize
    # scan (the boilerplate_ngrams posting-list lesson)
    base = (spread_scan(docs).select(tokens(text_col).alias("toks"))
            .localCheckpoint(eager=True))
    idx = F.when(F.size("toks") >= 2,
                 F.sequence(F.lit(1), F.size("toks") - 1)) \
           .otherwise(F.array().cast("array<int>"))
    bi = base.select(F.explode(
        F.transform(idx, lambda i: F.struct(
            F.element_at("toks", i).alias("a"),
            F.element_at("toks", (i + 1).cast("int")).alias("b"))))
        .alias("p")).select("p.a", "p.b")
    uni = (base.select(F.explode("toks").alias("tok"))
           .groupBy("tok").agg(F.count(F.lit(1)).alias("c")))
    # totals from the token-array lengths directly — exactly equal to
    # summing the count tables, without re-reading them
    totals = base.agg(
        F.sum(F.size("toks")).cast("double").alias("n_tokens"),
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0)))
         .cast("double").alias("n_bigrams"))
    c_ab = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    joined = (c_ab.filter(F.col("c_ab") >= min_count)
              .join(F.broadcast(uni.select(F.col("tok").alias("a"),
                                           F.col("c").alias("c_a"))), "a")
              .join(F.broadcast(uni.select(F.col("tok").alias("b"),
                                           F.col("c").alias("c_b"))), "b")
              .crossJoin(F.broadcast(totals)))
    # mirrored term-for-term in the SQL twin: identical IEEE expression
    # tree -> identical doubles
    pmi = F.log((F.col("c_ab").cast("double") / F.col("n_bigrams"))
                / ((F.col("c_a").cast("double") / F.col("n_tokens"))
                   * (F.col("c_b").cast("double") / F.col("n_tokens"))))
    return (joined.select("a", "b", "c_ab", "c_a", "c_b",
                          (F.round(pmi, 6) + F.lit(0.0)).alias("pmi"))
            .orderBy(F.col("pmi").desc(), "a", "b")
            .limit(top_n))
