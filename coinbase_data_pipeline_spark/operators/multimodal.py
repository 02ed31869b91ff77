"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed via Arrow-batched ``mapInPandas``.

SURVEY.md §2 extension (training-data pipeline surface). The real
codecs (PIL/ffmpeg/librosa) are not in this container, so decode is
STUBBED behind a deterministic fake wire format — but everything
Spark-side is real and load-bearing: binary columns, metadata schema,
mapInPandas batch shape, partition-parallel decode, explode of video
frames into rows.

Fake wire format (big-endian u32 fields):
- image: ``IMG1`` | width | height | width*height grayscale bytes
- video: ``VID1`` | n_frames | width | height | frames (each w*h bytes)
- audio: ``AUD1`` | sample_rate | n_samples | n_samples u8 samples

Scale notes: mapInPandas streams Arrow batches — payload bytes never
hit the Python driver; one task decodes one partition's batch stream.
Repartition upstream by size (``spark.sql.files.maxPartitionBytes``)
so one partition's payloads fit executor memory.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

MAGIC = {b"IMG1": "image", b"VID1": "video", b"AUD1": "audio"}

META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("n_bytes", LongType()),
])


# ---------------------------------------------------------- fake encoders
# (test/data-gen helpers — a real deployment ingests actual media bytes)

def encode_image(width: int, height: int, pixels: bytes) -> bytes:
    assert len(pixels) == width * height
    return b"IMG1" + struct.pack(">II", width, height) + pixels


def encode_video(width: int, height: int, frames: list[bytes]) -> bytes:
    assert all(len(f) == width * height for f in frames)
    return (b"VID1" + struct.pack(">III", len(frames), width, height)
            + b"".join(frames))


def encode_audio(sample_rate: int, samples: bytes) -> bytes:
    return b"AUD1" + struct.pack(">II", sample_rate, len(samples)) + samples


def _parse_header(payload: bytes) -> dict:
    kind = MAGIC.get(payload[:4])
    out = {"kind": kind, "width": None, "height": None, "n_frames": None,
           "sample_rate": None, "n_samples": None,
           "n_bytes": len(payload)}
    if kind == "image":
        out["width"], out["height"] = struct.unpack(">II", payload[4:12])
    elif kind == "video":
        out["n_frames"], out["width"], out["height"] = struct.unpack(
            ">III", payload[4:16])
    elif kind == "audio":
        out["sample_rate"], out["n_samples"] = struct.unpack(
            ">II", payload[4:12])
    return out


def real_decode(payload: bytes):  # pragma: no cover - env-gated
    """Decode actual media bytes (JPEG/WAV/MP4). STUB: the codec
    libraries are not installed in this environment."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg/librosa; this "
            "environment ships none — use the deterministic fake "
            "format (encode_image/encode_video/encode_audio)") from e
    raise NotImplementedError("wire real decoder here")


# ------------------------------------------------------------- operators

def decode_metadata(df: DataFrame, *, id_col: str = "media_id",
                    payload_col: str = "payload") -> DataFrame:
    """payload → typed metadata row (one per media item)."""

    def _decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rows.append({"media_id": mid, **_parse_header(bytes(payload))})
            import pandas as pd
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA])

    return df.mapInPandas(_decode, schema=META_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def image_resize(df: DataFrame, target_w: int, target_h: int, *,
                 id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Nearest-neighbor resize of fake-format images (real math on the
    fake codec; non-images pass through untouched with NULL dims)."""
    import numpy as np

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                if payload[:4] != b"IMG1":
                    rows.append({"media_id": mid, "payload": payload,
                                 "width": None, "height": None})
                    continue
                w, h = struct.unpack(">II", payload[4:12])
                px = np.frombuffer(payload[12:], dtype=np.uint8)
                px = px.reshape(h, w)
                yi = (np.arange(target_h) * h // target_h)
                xi = (np.arange(target_w) * w // target_w)
                out = px[np.ix_(yi, xi)].tobytes()
                rows.append({"media_id": mid,
                             "payload": encode_image(target_w, target_h, out),
                             "width": target_w, "height": target_h})
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA])

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def frame_sample(df: DataFrame, every_n: int = 2, *,
                 id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Explode fake-format videos into every-Nth-frame rows, each frame
    re-encoded as a standalone image payload."""

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload)
                if payload[:4] != b"VID1":
                    continue
                n, w, h = struct.unpack(">III", payload[4:16])
                fsize = w * h
                for i in range(0, n, every_n):
                    frame = payload[16 + i * fsize:16 + (i + 1) * fsize]
                    rows.append({"media_id": mid, "frame_idx": i,
                                 "frame": encode_image(w, h, frame)})
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA])

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
])


def synthesize_corpus_media(docs: DataFrame, *, id_col: str = "doc_id",
                            size_col: str = "n_chars") -> DataFrame:
    """Deterministic fake-media table derived from a document corpus —
    the distributed twin of the encode_* helpers, so the full
    binary-column pipeline (encode → opaque payload → mapInPandas
    decode) can run, and be ORACLE-CHECKED, on the stock testdata:
    every metadata field is pure integer arithmetic on
    (doc_id, n_chars), which plain SQL reproduces without touching
    the bytes.

    kind = doc_id % 3 → image | video | audio;
    image: w = n_chars%16+1, h = doc_id%16+1, pixel i = (doc_id+i)%256
    video: frames = doc_id%4+1, w = n_chars%8+1, h = doc_id%8+1
    audio: rate = 8000 + doc_id%4 * 4000, samples = n_chars%64+1
    """

    def _synth(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for did, n_chars in zip(pdf[id_col], pdf[size_col]):
                did, n_chars = int(did), int(n_chars)
                kind = did % 3
                if kind == 0:
                    w, h = n_chars % 16 + 1, did % 16 + 1
                    px = bytes((did + i) % 256 for i in range(w * h))
                    payload = encode_image(w, h, px)
                elif kind == 1:
                    nf, w, h = did % 4 + 1, n_chars % 8 + 1, did % 8 + 1
                    frames = [bytes((did + f + i) % 256
                                    for i in range(w * h))
                              for f in range(nf)]
                    payload = encode_video(w, h, frames)
                else:
                    rate, ns = 8000 + did % 4 * 4000, n_chars % 64 + 1
                    payload = encode_audio(
                        rate, bytes((did + i) % 256 for i in range(ns)))
                rows.append({"media_id": did, "payload": payload})
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA])

    return docs.select(id_col, size_col).mapInPandas(
        _synth, schema=MEDIA_SCHEMA)
