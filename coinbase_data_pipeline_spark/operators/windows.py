"""Sliding sequence-window extraction.

Reference parity: CryptoDataset.__getitem__ (Crypto-TS-Model-master/
src/data_loader.py:166-172) — per product, windows of seq_len trailing
observations (x) and pred_len leading closes (y). The reference builds
them lazily per training step; the engine materializes them as a
distributed table, which is what a Spark training pipeline
(e.g. Petastorm/TorchDistributor feed) would consume.

Spark-first: collect_list over bounded row frames — same single
per-key shuffle as the rest of the feature family. Output sequences
are encoded as comma-joined scaled-integer strings (price * 1e6 as
bigint) so results are hash-comparable across engines independent of
float formatting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sliding_windows(candles: DataFrame, *, key: str = "product_id",
                    ts: str = "bucket_start", price: str = "close",
                    seq_len: int = 24, pred_len: int = 6) -> DataFrame:
    """Rows where a full (seq_len, pred_len) window exists:
    x = the seq_len prices ending at this row (inclusive),
    y = the pred_len prices after this row."""
    scaled = F.col("_p6")
    base = candles.withColumn(
        "_p6", F.round(F.col(price) * 1e6).cast("long"))
    wx = (Window.partitionBy(key).orderBy(ts)
          .rowsBetween(-(seq_len - 1), 0))
    wy = Window.partitionBy(key).orderBy(ts).rowsBetween(1, pred_len)
    out = (base
           .withColumn("_x", F.collect_list(scaled).over(wx))
           .withColumn("_y", F.collect_list(scaled).over(wy))
           .filter((F.size("_x") == seq_len) & (F.size("_y") == pred_len)))
    to_str = lambda c: F.concat_ws(  # noqa: E731
        ",", F.transform(F.col(c), lambda x: x.cast("string")))
    return out.select(
        key, ts,
        to_str("_x").alias("x_sig"),
        to_str("_y").alias("y_sig"),
    )
