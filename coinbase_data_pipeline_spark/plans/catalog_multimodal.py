"""Catalog part 8: multimodal binary-column pipeline, oracle-paired.

The decode path is the real one — opaque ``binary`` payloads streamed
through Arrow-batched ``mapInPandas`` (operators/multimodal.py); only
the MEDIA comes from the deterministic synthesizer, whose metadata is
pure integer arithmetic on (doc_id, n_chars). That makes the full
encode → binary → decode round-trip hash-checkable by a DuckDB oracle
that never touches the bytes: if the wire format, header parsing, or
batch plumbing corrupts anything, the arithmetic mirror catches it.

Reference parity: the reference pipeline has no media path; this is
part of the mandated LLM-training-data extension surface (SURVEY.md
§2 multimodal rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as MM
from ..sources.tables import load_table


def _media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return MM.synthesize_corpus_media(docs)


def q_multimodal_meta(spark, sf_dir):
    """Typed metadata for every media payload: encode on one side of a
    shuffle-free mapInPandas pair, decode on the other."""
    meta = MM.decode_metadata(_media(spark, sf_dir))
    return meta.select(
        "media_id", "kind",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_frames").cast("int").alias("n_frames"),
        F.col("sample_rate").cast("int").alias("sample_rate"),
        F.col("n_samples").cast("int").alias("n_samples"),
        F.col("n_bytes").cast("long").alias("n_bytes"))


SQL_MULTIMODAL_META = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
            ELSE 'audio' END AS kind,
       CAST(CASE doc_id % 3 WHEN 0 THEN n_chars % 16 + 1
                 WHEN 1 THEN n_chars % 8 + 1 END AS INT) AS width,
       CAST(CASE doc_id % 3 WHEN 0 THEN doc_id % 16 + 1
                 WHEN 1 THEN doc_id % 8 + 1 END AS INT) AS height,
       CAST(CASE doc_id % 3 WHEN 1 THEN doc_id % 4 + 1
            END AS INT) AS n_frames,
       CAST(CASE doc_id % 3 WHEN 2 THEN 8000 + doc_id % 4 * 4000
            END AS INT) AS sample_rate,
       CAST(CASE doc_id % 3 WHEN 2 THEN n_chars % 64 + 1
            END AS INT) AS n_samples,
       CAST(CASE doc_id % 3
            WHEN 0 THEN 12 + (n_chars % 16 + 1) * (doc_id % 16 + 1)
            WHEN 1 THEN 16 + (doc_id % 4 + 1) * (n_chars % 8 + 1)
                          * (doc_id % 8 + 1)
            ELSE 12 + n_chars % 64 + 1 END AS BIGINT) AS n_bytes
FROM documents
"""


def q_multimodal_frames(spark, sf_dir):
    """Every-2nd-frame sampling of the video payloads, each frame
    re-encoded standalone: per frame its index and byte size."""
    frames = MM.frame_sample(_media(spark, sf_dir), every_n=2)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length("frame").cast("long").alias("frame_bytes"))


SQL_MULTIMODAL_FRAMES = """
WITH vids AS (
  SELECT doc_id AS media_id,
         doc_id % 4 + 1 AS nf,
         n_chars % 8 + 1 AS w,
         doc_id % 8 + 1 AS h
  FROM documents WHERE doc_id % 3 = 1
)
SELECT media_id,
       CAST(unnest(generate_series(0, nf - 1, 2)) AS INT) AS frame_idx,
       CAST(12 + w * h AS BIGINT) AS frame_bytes
FROM vids
"""


SPARK_QUERIES_MULTIMODAL = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frames": q_multimodal_frames,
}

ORACLE_SQL_MULTIMODAL = {
    "multimodal_meta": SQL_MULTIMODAL_META,
    "multimodal_frames": SQL_MULTIMODAL_FRAMES,
}
