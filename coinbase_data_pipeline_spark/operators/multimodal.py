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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG filter-type byte per scanline (spec §9): 0 none, 1 sub, 2 up,
# 3 average, 4 Paeth.


def _png_unfilter(raw: bytes, width: int, height: int,
                  bpp: int) -> bytearray:
    """Reverse PNG scanline filtering — the spec algorithm, stdlib
    only."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:                                  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:                                # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:                                # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:                                # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (
                    b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype}")
        out += line
        prev = line
    return out


def _decode_png(payload: bytes) -> dict:
    """Real PNG decode, stdlib only (zlib inflate + spec unfiltering):
    8-bit greyscale / RGB / RGBA, non-interlaced — the formats a
    training-data scrape overwhelmingly contains. Color collapses to
    integer BT.601 luma so downstream raster ops see one channel."""
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, height, depth, color = 8, None, None, None, None
    idat = b""
    while pos < len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length                     # len + type + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, ilace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or ilace != 0 or color not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace="
                    f"{ilace}: only 8-bit gray/RGB/RGBA progressive-"
                    "free PNGs decode stdlib-side; install PIL for "
                    "the rest")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    bpp = {0: 1, 2: 3, 6: 4}[color]
    px = _png_unfilter(zlib.decompress(idat), width, height, bpp)
    if bpp > 1:                                 # integer BT.601 luma
        px = bytes((299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]
                    + 500) // 1000
                   for i in range(0, len(px), bpp))
    return {"kind": "image", "width": width, "height": height,
            "pixels": bytes(px)}


def _decode_wav(payload: bytes) -> dict:
    """Real WAV/PCM decode via the stdlib ``wave`` module; samples
    collapse to u8 (16-bit PCM keeps the high byte, offset to
    unsigned) to match the internal audio raster."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        rate = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        frames = w.readframes(n)
    if sw == 1:
        samples = frames[::ch]
    elif sw == 2:
        # little-endian s16 -> high byte + 128 (u8 midrise)
        samples = bytes((frames[i * 2 * ch + 1] + 128) & 0xFF
                        for i in range(n))
    else:
        raise NotImplementedError(f"WAV sample width {sw}")
    return {"kind": "audio", "sample_rate": rate,
            "samples": bytes(samples)}


def real_decode(payload: bytes) -> dict:
    """Decode ACTUAL media bytes into the raster dict the internal
    operators consume — the production seam between scraped bytes and
    the IMG1/AUD1/VID1 pipeline.

    Stdlib-real today: PNG (zlib inflate + spec unfiltering,
    :func:`_decode_png`) and WAV PCM (:func:`_decode_wav`) — both
    exercised by pytest on genuine files built in-test. Formats that
    need a codec library (JPEG, MP4, OGG, …) fall through to PIL when
    installed, else raise NotImplementedError naming the dependency —
    the only env-gated branch left.
    """
    if payload[:8] == PNG_MAGIC:
        return _decode_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _decode_wav(payload)
    try:
        import PIL.Image
    except ImportError as e:
        raise NotImplementedError(
            "non-PNG/WAV media decode requires PIL/ffmpeg/librosa; "
            "this environment ships none — PNG and WAV decode "
            "stdlib-side, or use the deterministic fake format "
            "(encode_image/encode_video/encode_audio)") from e
    import io  # pragma: no cover - env-gated (PIL absent here)
    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    return {"kind": "image", "width": img.width, "height": img.height,
            "pixels": img.tobytes()}


def ingest_media(df: DataFrame, *, id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Transcode REAL media bytes (PNG/WAV/...) into the internal
    raster wire format, partition-parallel — the ingest edge of the
    multimodal pipeline: after this one mapInPandas pass, every
    downstream operator (decode_metadata, image_resize, frame_sample)
    runs unchanged on scraped-from-the-web inputs.

    Scale: decode cost is per-payload CPU inside the Arrow batch
    stream; bytes never visit the driver. Partition by size upstream
    exactly as for :func:`decode_metadata`."""

    def _ingest(batches: Iterator) -> Iterator:
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                d = real_decode(bytes(payload))
                if d["kind"] == "image":
                    enc = encode_image(d["width"], d["height"],
                                       d["pixels"])
                else:
                    enc = encode_audio(d["sample_rate"], d["samples"])
                rows.append({"media_id": mid, "payload": enc})
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(
        _ingest, schema=MEDIA_SCHEMA)


def assemble_video(frames: DataFrame, *, id_col: str = "media_id",
                   idx_col: str = "frame_idx",
                   payload_col: str = "payload") -> DataFrame:
    """Assemble per-frame REAL images (e.g. a PNG sequence — the form
    frame dumps arrive in when no container codec is available) into
    one internal VID1 payload per media id: real_decode each frame,
    order by frame index, concatenate. The inverse seam of
    :func:`frame_sample`; applyInPandas groups one video's frames
    into one task."""

    def _assemble(pdf):
        import pandas as pd
        pdf = pdf.sort_values(idx_col)
        decoded = [real_decode(bytes(p)) for p in pdf[payload_col]]
        # a non-image payload (e.g. WAV bytes in the frame set) must
        # fail with a diagnosable error naming the frame, not a
        # KeyError('width') from the dimension reads below
        for d, (mid, idx) in zip(decoded,
                                 zip(pdf[id_col], pdf[idx_col])):
            if d["kind"] != "image":
                raise ValueError(
                    f"frame {idx} of media {mid} decoded as "
                    f"{d['kind']!r}, not an image")
        w, h = decoded[0]["width"], decoded[0]["height"]
        if any(d["width"] != w or d["height"] != h for d in decoded):
            raise ValueError("frame dimensions differ within a video")
        payload = encode_video(w, h, [d["pixels"] for d in decoded])
        return pd.DataFrame(
            [{"media_id": pdf[id_col].iloc[0], "payload": payload}],
            columns=[f.name for f in MEDIA_SCHEMA])

    return (frames.select(id_col, idx_col, payload_col)
            .groupBy(id_col).applyInPandas(_assemble,
                                           schema=MEDIA_SCHEMA))


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
