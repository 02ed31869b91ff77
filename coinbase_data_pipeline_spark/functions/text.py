"""Columnar text primitives shared by the dedup / text-analysis
operators. Pure pyspark.sql.functions — JVM-side, codegen-friendly.

Each helper documents its exact DuckDB equivalent so the catalog's
oracle SQL can mirror it expression-for-expression (cross-engine
parity is part of the operators' defined semantics).

The 60-bit hash family is built on md5 (available in both engines):
``hash60(s) = int(md5(s)[:15], 16)`` — 15 hex digits = 60 bits, fits a
signed 64-bit int. Seeded variants prepend "«seed»:" to the input.
DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(text: Column | str) -> Column:
    """Lowercased alpha tokens.

    DuckDB: list_filter(regexp_split_to_array(lower(t), '[^a-z]+'),
                        x -> len(x) > 0)
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(col), "[^a-z]+"),
                    lambda x: F.length(x) > 0)


def token_set(text: Column | str) -> Column:
    """Distinct tokens (set semantics for Jaccard)."""
    return F.array_distinct(tokens(text))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), distinct. Fewer than n
    tokens → empty list (guarded: Spark's sequence(1, 0) would yield
    the DESCENDING [1, 0], unlike DuckDB's empty generate_series, and
    slice(_, 0, n) throws).

    DuckDB: list_distinct(list_transform(
        generate_series(1, greatest(len(toks) - {n-1}, 0)),
        i -> array_to_string(toks[i:i+{n-1}], ' ')))
    """
    last = F.size(toks) - (n - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)) \
           .otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))


def hash60(col: Column, seed: str = "") -> Column:
    """Deterministic 60-bit hash shared with DuckDB (see module doc)."""
    s = F.concat(F.lit(f"{seed}:"), col) if seed else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str, seed: str = "") -> str:
    """The DuckDB twin of :func:`hash60`, as a SQL fragment."""
    inner = f"'{seed}:' || {expr}" if seed else expr
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"


def minhash_signature(toks: Column, k: int = 16) -> Column:
    """MinHash signature: array of k minima of seeded hash60 over the
    token set. An empty token list yields an all-NULL signature —
    callers must exclude empty docs from LSH banding (an all-NULL
    signature would put every empty doc in one bucket; see
    dedup.minhash_lsh_pairs).

    DuckDB per element i:
      list_min(list_transform(toks, t -> «sql_hash60('t', f's{i}')»))
    """
    def _seeded(i: int):
        # single-arg closure: a 2-arg lambda would be treated by
        # F.transform as an (element, index) function
        return lambda t: hash60(t, f"s{i}")

    sig = [F.array_min(F.transform(toks, _seeded(i))) for i in range(k)]
    return F.array(*sig)
