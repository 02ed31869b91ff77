"""Catalog part 7: corpus-preparation operators for training-data
pipelines — chunking, context-window packing, deterministic stratified
sampling, text normalization, corpus composition stats. Same contract
as catalog.py; operators live in operators/corpus.py.

Every oracle reuses the engine-identical token/hash60 family from
functions/text.py, so the DuckDB SQL mirrors the Spark expressions
token-for-token (the parity gate checks values, not just counts).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import sql_hash60
from ..operators import corpus as CP
from ..sources.tables import load_table
from .catalog_ext import SQL_TOKS_ALL

# ------------------------------------------------------------------ chunking

CHUNK_SIZE, CHUNK_STRIDE = 64, 48


def q_doc_chunk(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return CP.doc_chunk(docs, size=CHUNK_SIZE, stride=CHUNK_STRIDE)


SQL_DOC_CHUNK = f"""
WITH toked AS (
  SELECT doc_id, {SQL_TOKS_ALL} AS toks FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n_tokens,
         CASE WHEN len(toks) > {CHUNK_SIZE}
              THEN CAST(ceil((len(toks) - {CHUNK_SIZE})
                             / {float(CHUNK_STRIDE)}) AS INT) + 1
              ELSE 1 END AS nc
  FROM toked WHERE len(toks) > 0
), exploded AS (
  SELECT doc_id, n_tokens, toks,
         unnest(generate_series(0, nc - 1)) AS chunk_id
  FROM sized
)
SELECT doc_id, chunk_id, n_tokens,
       len(toks[chunk_id * {CHUNK_STRIDE} + 1
                : chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}])
         AS chunk_tokens,
       array_to_string(toks[chunk_id * {CHUNK_STRIDE} + 1
                            : chunk_id * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' ')
         AS chunk_text
FROM exploded
"""


# ------------------------------------------------------------------- packing

PACK_BUDGET = 512


def q_token_packing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return CP.token_packing(docs, budget=PACK_BUDGET)


SQL_TOKEN_PACKING = f"""
WITH counted AS (
  SELECT lang, doc_id, CAST(len({SQL_TOKS_ALL}) AS BIGINT) AS n_tokens
  FROM documents
), running AS (
  SELECT lang, doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS before
  FROM counted
)
SELECT lang, doc_id, n_tokens,
       CAST(before // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(before % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM running
"""


# ------------------------------------------------------------------ sampling

SAMPLE_RATES = {"en": 0.5, "de": 0.3, "fr": 0.3, "es": 0.3, "zh": 0.2}
SAMPLE_DEFAULT = 0.1


def q_stratified_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return CP.stratified_sample(
        docs.select("doc_id", "lang", "source", "n_chars"),
        SAMPLE_RATES, default_rate=SAMPLE_DEFAULT)


_RATE_CASES = "\n".join(
    f"           WHEN lang = '{k}' THEN {int(v * 10000)}"
    for k, v in sorted(SAMPLE_RATES.items()))

SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {sql_hash60("CAST(doc_id AS VARCHAR)", "sample")} % 10000
      < CASE
{_RATE_CASES}
           ELSE {int(SAMPLE_DEFAULT * 10000)} END
"""


# ------------------------------------------------------------- normalization

def q_text_normalize(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return CP.text_normalize(docs)


SQL_TEXT_NORMALIZE = f"""
WITH normed AS (
  -- COALESCE: DuckDB's array_to_string([]) is NULL where Spark's
  -- array_join([]) is '' — a token-less doc (empty/whitespace/
  -- non-alpha text) must normalize to the empty string on both
  -- engines (found by tools/fuzz_parity.py; the fixed testdata has
  -- no token-less docs)
  SELECT doc_id, coalesce(array_to_string({SQL_TOKS_ALL}, ' '), '')
           AS norm_text
  FROM documents
)
SELECT doc_id, norm_text,
       {sql_hash60('norm_text', 'norm')} AS norm_hash
FROM normed
"""


# -------------------------------------------------------------- corpus stats

def q_corpus_stats(spark, sf_dir):
    """Per (lang, source) composition report — the mix table a data
    curator balances against: doc count, token mass, char spread.
    One partial-aggregating shuffle; sums stay BIGINT on both engines
    (the oracle casts DuckDB's HUGEINT sum back down)."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokens
    return (docs
            .select("lang", "source", "n_chars",
                    F.size(tokens(F.col("text"))).alias("_nt"))
            .groupBy("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("_nt").cast("long")).alias("total_tokens"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars")))


SQL_CORPUS_STATS = f"""
SELECT lang, source, count(*) AS n_docs,
       CAST(sum(len({SQL_TOKS_ALL})) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
"""


# ---------------------------------------------------------- decontamination

DECON_N, DECON_MIN_OVERLAP, EVAL_MOD = 5, 2, 97


def q_decontaminate(spark, sf_dir):
    """Test-set leakage guard: docs with doc_id % 97 == 0 stand in for
    the benchmark suite; every corpus doc is scored by distinct shared
    5-grams against it (eval n-gram set broadcast, one shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % EVAL_MOD == 0)
    return CP.decontaminate(docs, ev, n=DECON_N,
                            min_overlap=DECON_MIN_OVERLAP)


_SQL_GRAM = (f"list_distinct(list_transform("
             f"generate_series(1, greatest(len(toks) - {DECON_N - 1}, 0)),"
             f" i -> array_to_string(toks[i:i+{DECON_N - 1}], ' ')))")

SQL_DECONTAMINATE = f"""
WITH toked AS (
  SELECT doc_id, {SQL_TOKS_ALL} AS toks FROM documents
), grams AS (
  SELECT doc_id, unnest({_SQL_GRAM}) AS gram FROM toked
), ev AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % {EVAL_MOD} = 0
), hits AS (
  SELECT doc_id, count(*) AS overlap_ngrams
  FROM grams JOIN ev USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.overlap_ngrams, 0) AS BIGINT) AS overlap_ngrams,
       coalesce(h.overlap_ngrams, 0) >= {DECON_MIN_OVERLAP}
         AS is_contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


# ------------------------------------------------------ boilerplate grams

BOILER_N, BOILER_MIN_DOCS = 5, 3


def q_boilerplate_ngrams(spark, sf_dir):
    """Cross-document repeated-content signal: per doc, the fraction
    of its distinct 5-grams occurring in >= 3 documents corpus-wide
    (header/footer/template detection — the line-dedup idea for text
    without line structure). Explode → df groupBy → gram join → doc
    groupBy; no broadcast dictionary, corpus size unbounded."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.boilerplate_ngrams(docs, n=BOILER_N,
                                 min_docs=BOILER_MIN_DOCS)


_SQL_BGRAM = (f"list_distinct(list_transform("
              f"generate_series(1, greatest(len(toks) - {BOILER_N - 1}, 0)),"
              f" i -> array_to_string(toks[i:i+{BOILER_N - 1}], ' ')))")

SQL_BOILERPLATE = f"""
WITH toked AS (
  SELECT doc_id, {SQL_TOKS_ALL} AS toks FROM documents
), grams AS (
  SELECT doc_id, {sql_hash60('gram', 'boiler')} AS gram_h
  FROM (SELECT doc_id, unnest({_SQL_BGRAM}) AS gram FROM toked)
), dfq AS (
  SELECT gram_h, count(*) AS df FROM grams GROUP BY gram_h
), per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN dfq.df >= {BOILER_MIN_DOCS} THEN 1 ELSE 0 END)
           AS dup_grams
  FROM grams g JOIN dfq USING (gram_h) GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.dup_grams, 0) AS BIGINT) AS dup_grams,
       CASE WHEN coalesce(p.n_grams, 0) > 0
            THEN CAST(p.dup_grams AS DOUBLE) / p.n_grams
            ELSE 0.0 END AS boilerplate_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# -------------------------------------------------------------- PII scrub

def q_pii_scrub(spark, sf_dir):
    """Regex PII redaction. The synthetic corpus carries no PII, so the
    query plants deterministic markers first (email per doc, phone on
    doc_id%3==0, IPv4 on doc_id%5==0) — the scrub path, counts and
    redacted-text fingerprint are then value-checked end to end."""
    docs = load_table(spark, sf_dir, "documents")
    salted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.format_string(" user%d@example.com", F.col("doc_id")),
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit(" call 415-555-0123")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0,
                   F.format_string(" host 10.0.0.%d",
                                   F.col("doc_id") % 255))
            .otherwise(F.lit(""))))
    return CP.pii_scrub(salted)


def _sql_pii() -> str:
    from ..operators.corpus import PII_EMAIL, PII_IPV4, PII_PHONE
    salted = ("text || ' user' || doc_id || '@example.com'"
              " || CASE WHEN doc_id % 3 = 0 THEN ' call 415-555-0123'"
              " ELSE '' END"
              " || CASE WHEN doc_id % 5 = 0"
              " THEN ' host 10.0.0.' || (doc_id % 255) ELSE '' END")
    s1 = f"regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g')"
    s2 = f"regexp_replace({s1}, '{PII_PHONE}', '<PHONE>', 'g')"
    s3 = f"regexp_replace({s2}, '{PII_IPV4}', '<IP>', 'g')"
    return f"""
WITH salted AS (
  SELECT doc_id, {salted} AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS INT)
         AS n_emails,
       CAST(len(regexp_extract_all({s1}, '{PII_PHONE}')) AS INT)
         AS n_phones,
       CAST(len(regexp_extract_all({s2}, '{PII_IPV4}')) AS INT)
         AS n_ipv4,
       {s3} AS text_clean,
       {sql_hash60(s3, "pii")} AS clean_hash
FROM salted
"""


SQL_PII_SCRUB = _sql_pii()


# ------------------------------------------------------------ mixture resample

MIX_WEIGHTS = {"en": 0.3, "de": 0.25, "fr": 0.25, "es": 0.2}


def q_mixture_resample(spark, sf_dir):
    """Static target-mixture application: en is overrepresented in the
    corpus, so it subsamples hardest; the scarcest-per-weight domain
    keeps everything; zh (weight 0) is dropped."""
    docs = load_table(spark, sf_dir, "documents")
    out = CP.mixture_resample(docs, MIX_WEIGHTS)
    return out.select("doc_id", "text", "lang", "source", "n_chars")


_W_CASE = " ".join(f"WHEN '{k}' THEN {v!r}"
                   for k, v in sorted(MIX_WEIGHTS.items()))
_W_IN = ", ".join(f"'{k}'" for k in sorted(MIX_WEIGHTS))

SQL_MIXTURE_RESAMPLE = f"""
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents
  WHERE lang IN ({_W_IN}) GROUP BY lang
), rates AS (
  SELECT lang, (CASE lang {_W_CASE} END) / n AS demand FROM counts
), thr AS (
  SELECT lang,
         CAST(floor(demand / (SELECT max(demand) FROM rates)
                    * 1000000.0) AS BIGINT) AS thresh
  FROM rates
)
SELECT doc_id, text, lang, source, n_chars
FROM documents JOIN thr USING (lang)
WHERE {sql_hash60("CAST(doc_id AS VARCHAR)", "mix")} % 1000000 < thresh
"""


# ------------------------------------------------------------- gopher rules


def q_gopher_quality(spark, sf_dir):
    """Gopher-style rule filter (Rae et al. 2021 MassiveWeb
    heuristics) over the documents table: per-doc signals, one
    boolean per rule, conjunction `keep`. Pure expression work —
    zero shuffles; the scan reads only (doc_id, text)."""
    from ..operators import textstats as TS

    docs = load_table(spark, sf_dir, "documents")
    return TS.gopher_quality(docs)


_GOPHER_STOP_SQL = ", ".join(
    f"'{w}'" for w in ["the", "be", "to", "of", "and", "that", "have",
                       "with"])

SQL_GOPHER_QUALITY = f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\\s+'),
                     x -> len(x) > 0) AS words
  FROM documents
), m AS (
  SELECT doc_id, len(words) AS wc,
         CASE WHEN len(words) > 0 THEN
           CAST(list_sum(list_transform(words, x -> len(x))) AS DOUBLE)
             / len(words) END AS mean_len,
         CASE WHEN len(words) > 0 THEN
           (len(text) - len(replace(text, '#', ''))
            + (len(text) - len(replace(text, '...', ''))) / 3)
             / len(words) END AS symbol_ratio,
         CASE WHEN len(words) > 0 THEN
           CAST(len(list_filter(words,
                                x -> regexp_matches(x, '[A-Za-z]')))
                AS DOUBLE) / len(words) END AS alpha_frac,
         len(list_intersect(
               list_distinct(list_transform(words, x -> lower(x))),
               [{_GOPHER_STOP_SQL}])) AS n_stop
  FROM w
)
SELECT doc_id, wc AS word_count,
       ROUND(mean_len, 6) + 0 AS mean_word_len,
       ROUND(symbol_ratio, 6) + 0 AS symbol_ratio,
       ROUND(alpha_frac, 6) + 0 AS alpha_frac,
       n_stop AS n_stopwords,
       (wc >= 50 AND wc <= 100000) AS rule_word_count,
       coalesce(mean_len >= 3.0 AND mean_len <= 10.0, FALSE)
         AS rule_mean_word_len,
       coalesce(symbol_ratio <= 0.1, FALSE) AS rule_symbol_ratio,
       coalesce(alpha_frac >= 0.8, FALSE) AS rule_alpha_frac,
       (n_stop >= 2) AS rule_stopwords,
       ((wc >= 50 AND wc <= 100000)
        AND coalesce(mean_len >= 3.0 AND mean_len <= 10.0, FALSE)
        AND coalesce(symbol_ratio <= 0.1, FALSE)
        AND coalesce(alpha_frac >= 0.8, FALSE)
        AND n_stop >= 2) AS keep
FROM m
"""


# ------------------------------------------------------------- perplexity


def q_perplexity_proxy(spark, sf_dir):
    """Unigram-LM perplexity quality signal (CCNet/Gopher shape, the
    corpus as its own LM). Per-doc sums fold over token-sorted
    structs so the float summation order is oracle-replicable."""
    from ..operators import textstats as TS

    docs = load_table(spark, sf_dir, "documents")
    return TS.perplexity_proxy(docs)


SQL_PERPLEXITY = f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKS_ALL}) AS tok FROM documents
), doc_tok AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
), tf AS (
  SELECT tok, CAST(sum(cnt) AS BIGINT) AS tf FROM doc_tok GROUP BY tok
), corpus AS (
  SELECT CAST(sum(tf) AS BIGINT) AS n_corpus,
         CAST(count(*) AS BIGINT) AS v_corpus
  FROM tf
), terms AS (
  SELECT dt.doc_id, dt.tok, dt.cnt,
         round(dt.cnt * -ln((tf.tf + 1.0) / (c.n_corpus + c.v_corpus)),
               6) + 0 AS term
  FROM doc_tok dt JOIN tf USING (tok) CROSS JOIN corpus c
), agg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         list_sum(list(term ORDER BY tok)) AS nll_sum
  FROM terms GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(nll_sum / n_tokens, 6) + 0 AS avg_nll,
       round(exp(nll_sum / n_tokens), 6) + 0 AS perplexity
FROM agg
"""


# ------------------------------------------------------------------ DSIR

DSIR_BUCKETS, DSIR_TARGET = 256, "en"


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights: per-doc hashed-unigram log-likelihood
    ratio target-vs-raw (target = the corpus' en slice standing in for
    a high-quality set). Bucket stats broadcast; per-doc sums fold in
    bucket order so the floats value-hash."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.dsir_weights(docs, target_lang=DSIR_TARGET,
                           buckets=DSIR_BUCKETS)


SQL_DSIR_WEIGHTS = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({SQL_TOKS_ALL}) AS tok FROM documents
), bucketed AS (
  SELECT doc_id, lang,
         {sql_hash60('tok', 'dsir')} % {DSIR_BUCKETS} AS bucket
  FROM toks
), doc_b AS (
  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY 1, 2
), stats AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS cr,
         CAST(sum(CASE WHEN lang = '{DSIR_TARGET}' THEN 1 ELSE 0 END)
              AS BIGINT) AS ct
  FROM bucketed GROUP BY bucket
), totals AS (
  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
  FROM stats
), ratios AS (
  SELECT bucket,
         ln((ct + 1.0) / (nt + {float(DSIR_BUCKETS)}))
           - ln((cr + 1.0) / (nr + {float(DSIR_BUCKETS)})) AS lr
  FROM stats CROSS JOIN totals
), terms AS (
  SELECT d.doc_id, d.bucket, d.cnt, round(d.cnt * r.lr, 6) + 0 AS term
  FROM doc_b d JOIN ratios r USING (bucket)
), agg AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         round(list_sum(list(term ORDER BY bucket)), 6) + 0
           AS log_weight
  FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       coalesce(a.log_weight, 0.0) AS log_weight
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# -------------------------------------------------------------------- BPE

BPE_MERGES = 6


def q_bpe_train(spark, sf_dir):
    """Distributed BPE merge training: the first 6 merge rules induced
    from the corpus (pair counts over the distinct-word vocabulary,
    lexicographic tie-break, greedy rewrite per round). Integer counts
    and string folds only — the iterative loop value-hashes against a
    round-for-round CTE oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.bpe_train(docs, merges=BPE_MERGES)


def _sql_bpe_chain(merges: int = BPE_MERGES) -> str:
    # round-for-round CTE twin of operators/corpus._bpe_pipeline:
    # pairsN counts adjacent symbols over wordsN, bestN is the
    # deterministic argmax, words{N+1} applies the merge via the same
    # greedy left-to-right fold (string accumulator — list_reduce
    # requires acc type = element type; symbols never contain spaces,
    # so the space-join/split round trip is lossless). Emits
    # words1..words{merges+1} and best1..best{merges}.
    parts = [f"""
WITH words1 AS MATERIALIZED (
  SELECT word, cnt,
         list_transform(generate_series(1, len(word)), i -> word[i:i])
           || ['</w>'] AS syms
  FROM (SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({SQL_TOKS_ALL}) AS word FROM documents)
        GROUP BY word)
)"""]
    for r in range(1, merges + 1):
        parts.append(f""", pairs{r} AS MATERIALIZED (
  SELECT syms[t.i] AS a, syms[t.i + 1] AS b,
         CAST(sum(cnt) AS BIGINT) AS pair_count
  FROM words{r}, unnest(generate_series(1, len(syms) - 1)) AS t(i)
  GROUP BY 1, 2
), best{r} AS MATERIALIZED (
  SELECT {r} AS merge_rank, a, b, pair_count FROM pairs{r}
  ORDER BY pair_count DESC, a, b LIMIT 1
), words{r + 1} AS MATERIALIZED (
  SELECT word, cnt, str_split(list_reduce(syms, (acc, x) -> CASE
      WHEN (CASE WHEN strpos(reverse(acc), ' ') = 0 THEN acc
                 ELSE right(acc, strpos(reverse(acc), ' ') - 1) END)
             = best{r}.a
           AND x = best{r}.b
      THEN left(acc, len(acc) - len(best{r}.a)) || best{r}.a || best{r}.b
      ELSE acc || ' ' || x END), ' ') AS syms
  FROM words{r} CROSS JOIN best{r}
)""")
    return "".join(parts)


def _sql_bpe_train(merges: int = BPE_MERGES) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT merge_rank, a AS left_sym, b AS right_sym, pair_count"
        f" FROM best{r}" for r in range(1, merges + 1))
    return _sql_bpe_chain(merges) + "\n" + union


SQL_BPE_TRAIN = _sql_bpe_train()


def q_bpe_encode(spark, sf_dir):
    """Corpus encoded with the induced BPE rules: per doc, word /
    BPE-token / char counts (the compression bookkeeping). One
    vocabulary equi-join + one per-doc aggregate past training."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.bpe_encode(docs, merges=BPE_MERGES)


def _sql_bpe_encode(merges: int = BPE_MERGES) -> str:
    return _sql_bpe_chain(merges) + f"""
, vocab AS (
  SELECT word, len(syms) AS n_sym FROM words{merges + 1}
), doc_words AS (
  SELECT doc_id, unnest({SQL_TOKS_ALL}) AS word FROM documents
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens,
         CAST(sum(len(word)) AS BIGINT) AS n_chars
  FROM doc_words JOIN vocab USING (word) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
       CAST(coalesce(a.n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
       CAST(coalesce(a.n_chars, 0) AS BIGINT) AS n_chars
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


SQL_BPE_ENCODE = _sql_bpe_encode()


DSIR_QUANTILE = 0.75


def q_dsir_select(spark, sf_dir):
    """DSIR selection: docs whose importance weight clears the corpus
    p75 — the deterministic stand-in for Gumbel-top-k resampling."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.dsir_select(docs, target_lang=DSIR_TARGET,
                          buckets=DSIR_BUCKETS, quantile=DSIR_QUANTILE)


SQL_DSIR_SELECT = f"""
WITH w AS ({SQL_DSIR_WEIGHTS.strip()}
), j AS (
  SELECT w.doc_id, d.lang, w.n_tokens, w.log_weight
  FROM w JOIN documents d USING (doc_id)
), thr AS (
  SELECT quantile_cont(log_weight, {DSIR_QUANTILE}) AS t FROM j
)
SELECT doc_id, lang, n_tokens, log_weight,
       log_weight >= thr.t AS is_selected
FROM j CROSS JOIN thr
"""


# ------------------------------------------------------------- classifier

QCLS_BUCKETS, QCLS_ITERS, QCLS_LR, QCLS_SHARDS = 64, 3, 0.5, 256


def q_quality_classifier(spark, sf_dir):
    """Distributed full-batch logistic regression (fastText-style
    quality classifier over hashed term frequencies): the trained
    weight vector after 3 deterministic GD rounds."""
    from ..operators.textstats import quality_classifier
    docs = load_table(spark, sf_dir, "documents")
    weights, _ = quality_classifier(
        docs, buckets=QCLS_BUCKETS, iterations=QCLS_ITERS,
        lr=QCLS_LR, shards=QCLS_SHARDS)
    return weights


def q_quality_classifier_scores(spark, sf_dir):
    """Per-doc probability + decision under the trained classifier."""
    from ..operators.textstats import quality_classifier
    docs = load_table(spark, sf_dir, "documents")
    _, scores = quality_classifier(
        docs, buckets=QCLS_BUCKETS, iterations=QCLS_ITERS,
        lr=QCLS_LR, shards=QCLS_SHARDS)
    return scores


def _sql_qcls_chain(buckets: int = QCLS_BUCKETS,
                    iterations: int = QCLS_ITERS, lr: float = QCLS_LR,
                    shards: int = QCLS_SHARDS,
                    target: str = "en") -> str:
    # CTE-for-CTE twin of operators/textstats.quality_classifier:
    # wN is the weight vector after round N; every float matches the
    # Spark side's rounding and fold-order contract (bucket-ordered
    # per-doc dot products, doc-ordered then shard-ordered two-level
    # gradient sums, 6dp sigmoid).
    parts = [f"""
WITH tok AS MATERIALIZED (
  SELECT doc_id, {sql_hash60('tok', 'qcls')} % {buckets} AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT doc_id, unnest({SQL_TOKS_ALL}) AS tok FROM documents)
  GROUP BY 1, 2
), ntok AS (
  SELECT doc_id, sum(cnt) AS n FROM tok GROUP BY doc_id
), labels AS (
  SELECT doc_id, CASE WHEN lang = '{target}' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
), feats AS MATERIALIZED (
  SELECT t.doc_id, t.bucket, CAST(t.cnt AS DOUBLE) / ntok.n AS x, l.y
  FROM tok t JOIN ntok USING (doc_id)
             JOIN labels l ON l.doc_id = t.doc_id
  UNION ALL
  SELECT d.doc_id, -1, 1.0, l.y
  FROM documents d JOIN labels l USING (doc_id)
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), w0 AS MATERIALIZED (
  SELECT DISTINCT bucket, 0.0 AS w FROM feats
)"""]
    for r in range(1, iterations + 1):
        parts.append(f""", z{r} AS MATERIALIZED (
  SELECT f.doc_id, f.y,
         list_sum(list(f.x * w.w ORDER BY f.bucket)) AS z
  FROM feats f JOIN w{r - 1} w USING (bucket)
  GROUP BY f.doc_id, f.y
), resid{r} AS MATERIALIZED (
  SELECT doc_id, y - (round(1.0 / (1.0 + exp(-z)), 6) + 0) AS err
  FROM z{r}
), part{r} AS MATERIALIZED (
  SELECT f.bucket, f.doc_id % {shards} AS shard,
         round(list_sum(list(f.x * r.err ORDER BY f.doc_id)), 6) + 0
           AS part
  FROM feats f JOIN resid{r} r USING (doc_id)
  GROUP BY 1, 2
), grad{r} AS MATERIALIZED (
  SELECT bucket, list_sum(list(part ORDER BY shard)) AS g
  FROM part{r} GROUP BY bucket
), w{r} AS MATERIALIZED (
  SELECT w.bucket,
         round(w.w + {lr} * coalesce(g.g, 0.0) / nd.n_docs, 6) + 0 AS w
  FROM w{r - 1} w LEFT JOIN grad{r} g USING (bucket) CROSS JOIN nd
)""")
    return "".join(parts)


SQL_QUALITY_CLASSIFIER = _sql_qcls_chain() + f"""
SELECT bucket, w AS weight FROM w{QCLS_ITERS}
"""

SQL_QUALITY_CLASSIFIER_SCORES = _sql_qcls_chain() + f"""
, zf AS (
  SELECT f.doc_id, f.y,
         list_sum(list(f.x * w.w ORDER BY f.bucket)) AS z
  FROM feats f JOIN w{QCLS_ITERS} w USING (bucket)
  GROUP BY f.doc_id, f.y
)
SELECT doc_id, CAST(y AS INT) AS y,
       round(1.0 / (1.0 + exp(-z)), 6) + 0 AS p,
       (round(1.0 / (1.0 + exp(-z)), 6) + 0) >= 0.5 AS predicted
FROM zf
"""


# --------------------------------------------------------------- manifest

MANIFEST_SHARDS = 16


def q_dataset_manifest(spark, sf_dir):
    """Export shard plan: deterministic hash-gate shard assignment +
    per-shard doc/token/char mass, id range and an order-independent
    xor membership fingerprint — the plan/verify/resume table for a
    shard-parallel corpus write."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.dataset_manifest(docs, MANIFEST_SHARDS)


SQL_DATASET_MANIFEST = f"""
WITH base AS (
  SELECT {sql_hash60("CAST(doc_id AS VARCHAR)", "shard")}
           % {MANIFEST_SHARDS} AS shard,
         doc_id,
         CAST(len({SQL_TOKS_ALL}) AS BIGINT) AS nt,
         CAST(len(text) AS BIGINT) AS nc,
         {sql_hash60("CAST(doc_id AS VARCHAR)", "member")} AS mh
  FROM documents
)
SELECT shard, count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       CAST(sum(nc) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
       bit_xor(mh) AS members_hash
FROM base GROUP BY shard
"""


# ------------------------------------------------------------- vocabulary

VOCAB_SIZE = 1000


def q_vocab_build(spark, sf_dir):
    """Frequency-ranked tokenizer vocabulary (top-V tokens, ids by
    (tf DESC, token), id 0 reserved for OOV)."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.vocab_build(docs, VOCAB_SIZE)


SQL_VOCAB_BUILD = f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKS_ALL}) AS tok FROM documents
), doc_tok AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
), stats AS (
  SELECT tok, CAST(sum(cnt) AS BIGINT) AS tf,
         CAST(count(*) AS BIGINT) AS df
  FROM doc_tok GROUP BY tok
)
SELECT CAST(row_number() OVER (ORDER BY tf DESC, tok) AS BIGINT)
         AS token_id,
       tok AS token, tf, df
FROM stats
ORDER BY tf DESC, tok
LIMIT {VOCAB_SIZE}
"""


def q_token_id_encode(spark, sf_dir):
    """Corpus encoded against the induced vocabulary: per doc, token
    and OOV counts plus an order-sensitive 60-bit fingerprint of the
    id sequence."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = CP.vocab_build(docs, VOCAB_SIZE)
    return CP.token_id_encode(docs, vocab)


SQL_TOKEN_ID_ENCODE = f"""
WITH toks AS (
  SELECT doc_id, t.i - 1 AS pos, arr[t.i] AS tok
  FROM (SELECT doc_id, {SQL_TOKS_ALL} AS arr FROM documents),
       unnest(generate_series(1, len(arr))) AS t(i)
), vocab AS (
  SELECT token_id, token FROM ({SQL_VOCAB_BUILD.strip()}) v
), enc AS (
  SELECT toks.doc_id, toks.pos,
         coalesce(vocab.token_id, 0) AS tid
  FROM toks LEFT JOIN vocab ON vocab.token = toks.tok
), agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
         array_to_string(list(CAST(tid AS VARCHAR) ORDER BY pos), ',')
           AS seq
  FROM enc GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_oov,
       {sql_hash60('seq')} AS ids_hash
FROM agg
"""


# ----------------------------------------------------------- repeated spans

SPAN_K, SPAN_MIN_DOCS = 5, 2


def q_dedup_spans(spark, sf_dir):
    """Exact substring-duplication audit: per doc, how many token
    positions sit inside a 5-token window that appears verbatim in
    >= 2 documents (the exact-substring dedup signal at fixed window
    width — catches copy-pasted passages Jaccard-level dedup
    dilutes away). Candidate generation is a hash equi-join on the
    window fingerprint; coverage is a per-doc integer lag window."""
    from ..operators.dedup import repeated_spans
    docs = load_table(spark, sf_dir, "documents")
    return repeated_spans(docs, k=SPAN_K, min_docs=SPAN_MIN_DOCS)


SQL_DEDUP_SPANS = f"""
WITH toked AS (
  SELECT doc_id, {SQL_TOKS_ALL} AS toks FROM documents
), sized AS (
  SELECT doc_id, toks, len(toks) AS n_tokens FROM toked
), pos AS (
  SELECT doc_id, t.i AS pos,
         {sql_hash60(f"array_to_string(toks[t.i:t.i+{SPAN_K - 1}], ' ')",
                     'span')} AS gram_h
  FROM sized,
       unnest(generate_series(1, greatest(n_tokens - {SPAN_K - 1}, 0)))
         AS t(i)
), dup AS (
  SELECT gram_h FROM (
    SELECT gram_h, count(DISTINCT doc_id) AS df FROM pos GROUP BY gram_h)
  WHERE df >= {SPAN_MIN_DOCS}
), hits AS (
  SELECT p.doc_id, p.pos FROM pos p JOIN dup USING (gram_h)
), cov AS (
  SELECT doc_id,
         coalesce(least({SPAN_K},
                        pos - lag(pos) OVER (PARTITION BY doc_id
                                             ORDER BY pos)),
                  {SPAN_K}) AS covered
  FROM hits
), agg AS (
  SELECT doc_id, count(*) AS n_dup_spans, sum(covered) AS dup_tokens
  FROM cov GROUP BY doc_id
)
SELECT s.doc_id, s.n_tokens,
       CAST(coalesce(a.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CASE WHEN s.n_tokens > 0
            THEN CAST(coalesce(a.dup_tokens, 0) AS DOUBLE) / s.n_tokens
            ELSE 0.0 END AS dup_frac
FROM sized s LEFT JOIN agg a USING (doc_id)
"""


# ------------------------------------------------------------ token entropy

def q_token_entropy(spark, sf_dir):
    """Within-doc token-distribution entropy (degenerate-text
    detector): H = ln(n) - (1/n)·Σ c·ln c, plus the ln(distinct)-
    normalized variant. Terms fold token-sorted (perplexity's float
    contract)."""
    from ..operators.textstats import token_entropy
    docs = load_table(spark, sf_dir, "documents")
    return token_entropy(docs)


SQL_TOKEN_ENTROPY = f"""
WITH toks AS (
  SELECT doc_id, unnest({SQL_TOKS_ALL}) AS tok FROM documents
), doc_tok AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
), terms AS (
  SELECT doc_id, tok, cnt,
         round(cnt * ln(CAST(cnt AS DOUBLE)), 6) + 0 AS term
  FROM doc_tok
), agg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS distinct_tokens,
         list_sum(list(term ORDER BY tok)) AS clogc
  FROM terms GROUP BY doc_id
), scored AS (
  SELECT doc_id, n_tokens, distinct_tokens,
         round(ln(CAST(n_tokens AS DOUBLE)) - clogc / n_tokens, 6) + 0
           AS entropy
  FROM agg
)
SELECT d.doc_id,
       CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(s.distinct_tokens, 0) AS BIGINT) AS distinct_tokens,
       coalesce(s.entropy, 0.0) AS entropy,
       CASE WHEN s.distinct_tokens > 1
            THEN round(s.entropy
                       / ln(CAST(s.distinct_tokens AS DOUBLE)), 6) + 0
            ELSE 0.0 END AS norm_entropy
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


# ------------------------------------------------------------ fixed-k sample

FK_SAMPLE_K = 20


def q_fixed_k_sample(spark, sf_dir):
    """Exactly-k deterministic uniform sample per language (the
    fixed-size eval/review draw): k smallest (hash60(id), id) per
    stratum; hash-gate prefilter bounds the ranking window to ~O(k)
    rows per stratum with an exact fallback. The ungated definition
    is the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.fixed_k_sample(docs, FK_SAMPLE_K)


SQL_FIXED_K_SAMPLE = f"""
WITH base AS (
  SELECT lang, doc_id,
         {sql_hash60("CAST(doc_id AS VARCHAR)", "ksample")} AS h
  FROM documents
), ranked AS (
  SELECT lang, doc_id,
         CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
              AS INT) AS sample_rank
  FROM base
)
SELECT lang, doc_id, sample_rank FROM ranked
WHERE sample_rank <= {FK_SAMPLE_K}
"""


# ------------------------------------------------------------------- BM25

BM25_K1, BM25_B, BM25_TOP = 1.2, 0.75, 10
BM25_QUERIES = [(1, "table scan merge join"),
                (2, "stream window batch"),
                (3, "spark hash key sort")]


def q_bm25_search(spark, sf_dir):
    """BM25 lexical retrieval: top-10 docs per query for a fixed
    3-query set over the corpus — the keyword-search twin of the ANN
    family (same corpus, term statistics instead of embeddings)."""
    from ..operators.textstats import bm25_search
    docs = load_table(spark, sf_dir, "documents")
    q = spark.createDataFrame(BM25_QUERIES, ["query_id", "query_text"])
    return bm25_search(docs, q, k1=BM25_K1, b=BM25_B, top_n=BM25_TOP)


def _sql_bm25() -> str:
    vals = ", ".join(f"({i}, '{t}')" for i, t in BM25_QUERIES)
    qtoks = ("list_filter(regexp_split_to_array(lower(query_text),"
             " '[^a-z]+'), x -> len(x) > 0)")
    return f"""
WITH q(query_id, query_text) AS (VALUES {vals}),
qterms AS (
  SELECT query_id, unnest(list_distinct({qtoks})) AS tok FROM q
), doc_tok AS (
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({SQL_TOKS_ALL}) AS tok FROM documents)
  GROUP BY 1, 2
), dl AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM doc_tok
  GROUP BY doc_id
), corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), avgd AS (
  SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
), dfreq AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM doc_tok
  WHERE tok IN (SELECT DISTINCT tok FROM qterms) GROUP BY tok
), terms AS (
  SELECT qt.query_id, dt.doc_id, dt.tok,
         round(ln(1 + (c.n_docs - f.df + 0.5) / (f.df + 0.5))
               * dt.tf * {BM25_K1 + 1}
               / (dt.tf + {BM25_K1} * (1 - {BM25_B}
                                       + {BM25_B} * dl.dl / a.avgdl)),
               6) + 0 AS term
  FROM doc_tok dt
  JOIN qterms qt USING (tok)
  JOIN dfreq f USING (tok)
  JOIN dl ON dl.doc_id = dt.doc_id
  CROSS JOIN corpus c CROSS JOIN avgd a
), agg AS (
  SELECT query_id, doc_id,
         round(list_sum(list(term ORDER BY tok)), 6) + 0 AS score,
         CAST(count(*) AS BIGINT) AS n_matched_terms
  FROM terms GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id, score, n_matched_terms,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, doc_id) AS INT)
           AS rank
  FROM agg
)
SELECT * FROM ranked WHERE rank <= {BM25_TOP}
"""


SQL_BM25_SEARCH = _sql_bm25()


# ------------------------------------------------------------- collocations

PMI_MIN_COUNT = 5
PMI_TOP = 100


def q_pmi_collocations(spark, sf_dir):
    """Adjacent-token collocations ranked by pointwise mutual
    information (operators/textstats.py:pmi_collocations) — the
    phrase-mining statistic next to ngram_doc_frequency's raw counts.
    Tokenize once (localCheckpoint), two map-side-combining counts,
    vocabulary-sized broadcast join-backs, top-100 over the surviving
    bigram aggregate only."""
    from ..operators.textstats import pmi_collocations

    docs = load_table(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=PMI_MIN_COUNT,
                            top_n=PMI_TOP)


SQL_PMI_COLLOCATIONS = f"""
WITH toked AS (
  SELECT {SQL_TOKS_ALL} AS toks FROM documents
), uni AS (
  SELECT t.tok AS tok, CAST(count(*) AS BIGINT) AS c
  FROM toked, unnest(toks) AS t(tok) GROUP BY 1
), tot AS (
  SELECT CAST(sum(len(toks)) AS DOUBLE) AS n_tokens,
         CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n_bigrams
  FROM toked
), bi AS (
  SELECT toks[t.i] AS a, toks[t.i + 1] AS b
  FROM toked,
       unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS t(i)
), cab AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab FROM bi GROUP BY 1, 2
)
SELECT cab.a, cab.b, c_ab, ua.c AS c_a, ub.c AS c_b,
       ROUND(ln((CAST(c_ab AS DOUBLE) / n_bigrams)
                / ((CAST(ua.c AS DOUBLE) / n_tokens)
                   * (CAST(ub.c AS DOUBLE) / n_tokens))), 6) + 0 AS pmi
FROM cab
JOIN uni ua ON ua.tok = cab.a
JOIN uni ub ON ub.tok = cab.b
CROSS JOIN tot
WHERE c_ab >= {PMI_MIN_COUNT}
ORDER BY pmi DESC, cab.a, cab.b
LIMIT {PMI_TOP}
"""


CMS_D, CMS_W, CMS_MIN_SHARE = 4, 4096, 0.002


def q_heavy_hitters_cms(spark, sf_dir):
    """Count-min-sketch heavy hitters: tokens whose CMS estimate is
    ≥ 0.2% of the token stream, exact count alongside so the sketch's
    one-sided error is visible (operators/sketches.py). The sketch is
    a fixed 4×4096 counter grid — map-side-combinable, mergeable
    cell-wise, broadcastable — sized so the collision noise floor
    (N/w ≈ 0.024% of tokens) sits 8× under the report threshold; at
    100 TB the exact-count column drops and the grid is the only
    state that ever shuffles."""
    from ..operators.sketches import cms_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    return cms_heavy_hitters(docs, d=CMS_D, w=CMS_W,
                             min_share=CMS_MIN_SHARE)


SQL_HEAVY_HITTERS_CMS = f"""
WITH toks AS (
  SELECT t.tok AS tok
  FROM (SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                           x -> len(x) > 0) AS l FROM documents),
       unnest(l) AS t(tok)
), counts AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok
), cand AS (
  SELECT tok, n, r.r AS r,
         ('0x' || substr(md5('cms' || CAST(r.r AS VARCHAR) || ':' || tok),
                         1, 15))::BIGINT % {CMS_W} AS c
  FROM counts, (SELECT unnest([0, 1, 2, 3]) AS r) r
), cells AS (
  SELECT r, c, CAST(sum(n) AS BIGINT) AS cellsum
  FROM cand GROUP BY r, c
), est AS (
  SELECT cand.tok, cand.n, min(cellsum) AS cms_est
  FROM cand JOIN cells USING (r, c) GROUP BY cand.tok, cand.n
), total AS (
  SELECT CAST(sum(n) AS BIGINT) AS total FROM counts
)
SELECT tok, n, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - n AS BIGINT) AS overestimate
FROM est, total
WHERE cms_est >= {CMS_MIN_SHARE!r} * CAST(total AS DOUBLE)
"""


# ----------------------------------------------------------------- registry



EPOCH_SHUFFLE_EPOCH = 2


def q_epoch_shuffle(spark, sf_dir):
    """The data loader's per-epoch shuffle as a relation (train.py's
    DataLoader(shuffle=True) re-shuffle, made deterministic): global
    permutation position per doc for EPOCH_SHUFFLE_EPOCH, via the
    distributed exact ranker on a uniform hash key (balanced shards
    by construction — no unpartitioned window, no global sort).
    Completes the loader family: curriculum_augment (steps 1-5),
    curriculum_dropout (step 6), epoch_shuffle (the batch order)."""
    docs = load_table(spark, sf_dir, "documents")
    return CP.epoch_shuffle(docs, EPOCH_SHUFFLE_EPOCH)


SQL_EPOCH_SHUFFLE = f"""
WITH h AS (
  SELECT doc_id,
         {sql_hash60(f"CAST(doc_id AS VARCHAR) || ':e{EPOCH_SHUFFLE_EPOCH}'", "eshuf")} AS shuffle_key
  FROM documents
)
SELECT doc_id, shuffle_key,
       CAST(row_number() OVER (ORDER BY shuffle_key, doc_id)
            AS BIGINT) AS epoch_pos
FROM h
"""


SPARK_QUERIES_CORPUS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_chunk": q_doc_chunk,
    "token_packing": q_token_packing,
    "stratified_sample": q_stratified_sample,
    "text_normalize": q_text_normalize,
    "corpus_stats": q_corpus_stats,
    "decontaminate": q_decontaminate,
    "boilerplate_ngrams": q_boilerplate_ngrams,
    "pii_scrub": q_pii_scrub,
    "mixture_resample": q_mixture_resample,
    "gopher_quality": q_gopher_quality,
    "perplexity_proxy": q_perplexity_proxy,
    "dsir_weights": q_dsir_weights,
    "dsir_select": q_dsir_select,
    "dataset_manifest": q_dataset_manifest,
    "bpe_train": q_bpe_train,
    "bpe_encode": q_bpe_encode,
    "quality_classifier": q_quality_classifier,
    "quality_classifier_scores": q_quality_classifier_scores,
    "vocab_build": q_vocab_build,
    "token_id_encode": q_token_id_encode,
    "dedup_spans": q_dedup_spans,
    "token_entropy": q_token_entropy,
    "bm25_search": q_bm25_search,
    "fixed_k_sample": q_fixed_k_sample,
    "epoch_shuffle": q_epoch_shuffle,
    "pmi_collocations": q_pmi_collocations,
    "heavy_hitters_cms": q_heavy_hitters_cms,
}

ORACLE_SQL_CORPUS: dict[str, str] = {
    "doc_chunk": SQL_DOC_CHUNK,
    "token_packing": SQL_TOKEN_PACKING,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "text_normalize": SQL_TEXT_NORMALIZE,
    "corpus_stats": SQL_CORPUS_STATS,
    "decontaminate": SQL_DECONTAMINATE,
    "boilerplate_ngrams": SQL_BOILERPLATE,
    "pii_scrub": SQL_PII_SCRUB,
    "mixture_resample": SQL_MIXTURE_RESAMPLE,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "perplexity_proxy": SQL_PERPLEXITY,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "dsir_select": SQL_DSIR_SELECT,
    "dataset_manifest": SQL_DATASET_MANIFEST,
    "bpe_train": SQL_BPE_TRAIN,
    "bpe_encode": SQL_BPE_ENCODE,
    "quality_classifier": SQL_QUALITY_CLASSIFIER,
    "quality_classifier_scores": SQL_QUALITY_CLASSIFIER_SCORES,
    "vocab_build": SQL_VOCAB_BUILD,
    "token_id_encode": SQL_TOKEN_ID_ENCODE,
    "dedup_spans": SQL_DEDUP_SPANS,
    "token_entropy": SQL_TOKEN_ENTROPY,
    "bm25_search": SQL_BM25_SEARCH,
    "fixed_k_sample": SQL_FIXED_K_SAMPLE,
    "epoch_shuffle": SQL_EPOCH_SHUFFLE,
    "pmi_collocations": SQL_PMI_COLLOCATIONS,
    "heavy_hitters_cms": SQL_HEAVY_HITTERS_CMS,
}
