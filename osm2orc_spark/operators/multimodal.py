"""Multimodal (binary-column) operators.

Images/audio/video are carried as opaque ``binary`` columns plus typed
metadata. No media libraries ship in this container, but two decoders
are REAL regardless: PNG (pure numpy + stdlib zlib — signature, chunk
walk with CRC checks, scanline unfiltering for all five filter types)
and WAV/PCM (stdlib RIFF chunk parse + numpy sample stats). Formats
needing codec libraries (JPEG/MP3/video) fall back to a deterministic
fake so the pipeline stays testable end-to-end; the Spark-side plumbing
is identical either way: BinaryType columns, Arrow-batched
``mapInPandas`` with bytes in/out, multi-row-out frame sampling, and
explicit output schemas.

The oracle-checked queries synthesize the blob from ``documents.text``
(``encode(text, 'utf-8')``) so DuckDB can replay the deterministic fake
decode with pure arithmetic on byte lengths.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of corpus size; blob columns never pass through the
driver. Real decoders drop into ``_decode_meta_batch`` unchanged. Frame
sampling emits rows proportional to media length — partition on a
content hash upstream if per-file sizes are heavily skewed.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2orc_spark.registry import register
from osm2orc_spark.tables import load

FRAME_STRIDE = 100  # bytes per synthetic "frame"

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel
# decoder cap on the reconstructed pixel buffer (128 MiB ~ a 6500x6500
# RGBA frame): a bomb PNG claiming absurd IHDR dims is refused before
# its IDAT stream is ever inflated
_PNG_RAW_MAX = 128 * 1024 * 1024


def decode_png(blob: bytes) -> dict:
    """REAL PNG decode with numpy + stdlib zlib (no PIL needed).

    Supports the common web subset: 8-bit depth, gray/RGB/gray-alpha/RGBA,
    non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth),
    with per-chunk CRC verification. Returns width/height/channels, the
    reconstructed pixel array, and per-channel means.
    """
    if blob[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, bytearray()
    width = height = bit_depth = color_type = interlace = None
    while pos + 12 <= len(blob):
        ln = int.from_bytes(blob[pos : pos + 4], "big")
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(blob[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, interlace = data[8], data[9], data[12]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if width is None or bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError("unsupported PNG variant (need 8-bit non-interlaced non-palette)")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    # bound BEFORE inflating: the expected pixel-buffer size follows from
    # IHDR alone, so a bomb PNG (tiny IDAT, huge claimed dims) is refused
    # without expanding it into memory
    if not width or not height:
        # PNG requires nonzero dims; rejecting here also keeps expected>0
        # below — d.decompress(data, 0) would mean UNLIMITED, silently
        # bypassing the bomb cap
        raise ValueError("zero-dimension PNG")
    expected = height * (stride + 1)
    if expected > _PNG_RAW_MAX:
        raise ValueError(
            f"PNG pixel buffer {expected} bytes exceeds the decoder cap "
            f"({_PNG_RAW_MAX}): refusing"
        )
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected)
    if not d.eof or len(raw) != expected:
        raise ValueError("IDAT length mismatch")
    img = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rpos = 0
    for y in range(height):
        ftype = raw[rpos]
        row = np.frombuffer(raw, np.uint8, stride, rpos + 1).copy()
        rpos += 1 + stride
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up: uint8 addition wraps mod 256 natively
            rec = row + prev
        elif ftype == 1:  # Sub: left-neighbor dependency, per-byte chain
            rec = row
            for x in range(channels, stride):
                rec[x] = (int(rec[x]) + int(rec[x - channels])) & 0xFF
        elif ftype == 3:  # Average
            rec = row
            for x in range(stride):
                left = int(rec[x - channels]) if x >= channels else 0
                rec[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = row
            for x in range(stride):
                a = int(rec[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        img[y] = rec
        prev = rec
    pixels = img.reshape(height, width, channels)
    return {
        "width": width,
        "height": height,
        "format": "png",
        "channels": channels,
        "pixels": pixels,
        "channel_means": [float(pixels[..., c].mean()) for c in range(channels)],
    }


def decode_wav(blob: bytes) -> dict:
    """REAL WAV/PCM decode via stdlib RIFF chunk walk + numpy stats.

    Returns channels, sample rate, bit depth, frame count, duration, and
    int16 RMS — the fields an audio curation filter keys on."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        ln = int.from_bytes(blob[pos + 4 : pos + 8], "little")
        body = blob[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            # the chunk header declares its byte length — a short body is
            # a truncated file and must be LOUD, not a silently-shorter
            # sample stream (quiet data loss in an audio pipeline)
            raise ValueError(
                f"truncated {cid!r} chunk: {len(body)}/{ln} bytes"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are 2-byte aligned
    # A file truncated INSIDE a chunk header leaves 1-7 trailing bytes the
    # walk cannot parse — as loud as a truncated body (r13 advice; pos may
    # legitimately overshoot len(blob) by 1 when the final odd chunk's pad
    # byte is absent at EOF, so only pos < len(blob) is an error).
    if pos < len(blob):
        raise ValueError(
            f"trailing partial chunk header: {len(blob) - pos} bytes after "
            "last complete chunk"
        )
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = len(samples) // channels
    rms = float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))) if len(samples) else 0.0
    return {
        "channels": channels,
        "sample_rate": sample_rate,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sample_rate if sample_rate else 0,
        "rms": rms,
    }


def decode_jpeg_header(blob: bytes) -> dict:
    """REAL JPEG dimension decode via the marker walk (pure stdlib).

    Dimensions live in the SOF segment header, so no entropy decoding or
    codec library is needed: scan SOI, skip each marker segment by its
    big-endian length, stop at any SOFn (C0-CF except the non-frame
    markers C4/C8/CC) and read precision/height/width/components. This
    is exactly what image curation needs for aspect/size filters —
    full pixel decode stays behind a codec library."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # The spec allows any number of 0xFF fill (padding) bytes before a
        # marker; real encoders emit them. Skip to the last 0xFF of the run.
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(blob):
            break
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            pos += 2
            continue
        if pos + 4 > len(blob):
            break
        ln = int.from_bytes(blob[pos + 2 : pos + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            seg = blob[pos + 4 : pos + 2 + ln]
            return {
                "height": int.from_bytes(seg[1:3], "big"),
                "width": int.from_bytes(seg[3:5], "big"),
                "components": seg[5],
                "progressive": marker == 0xC2,
            }
        if marker == 0xD9:  # EOI before any SOF
            break
        pos += 2 + ln
    raise ValueError("no SOF marker found")


def decode_image(blob: bytes) -> dict:
    """Image decode: REAL for PNG (decode_png — pure numpy/zlib) and for
    JPEG dimensions (decode_jpeg_header — stdlib marker walk);
    deterministic fake for everything else (full JPEG pixel decode needs
    a codec library; none ships in this container). The fake keys off
    blob length so the DuckDB oracle can replay it with pure
    arithmetic."""
    if blob[:8] == PNG_SIG:
        m = decode_png(blob)
        return {"width": m["width"], "height": m["height"], "format": "png"}
    if blob[:2] == b"\xff\xd8":
        m = decode_jpeg_header(blob)
        return {"width": m["width"], "height": m["height"], "format": "jpeg"}
    n = len(blob)
    return {
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "format": ("raw", "png", "jpeg")[n % 3],
    }


def _decode_meta_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: bytes -> metadata, one row per blob."""
    for pdf in batches:
        metas = [decode_image(b) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "byte_len": [len(b) for b in pdf["blob"]],
                "width": [m["width"] for m in metas],
                "height": [m["height"] for m in metas],
                "format": [m["format"] for m in metas],
            }
        )


@register(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(strlen(text) % 640 + 1 AS BIGINT) AS width,
           CAST((strlen(text) * 7) % 480 + 1 AS BIGINT) AS height,
           CASE strlen(text) % 3 WHEN 0 THEN 'raw' WHEN 1 THEN 'png' ELSE 'jpeg' END AS format
    FROM documents
    """,
    doc="Binary-column decode via Arrow-batched mapInPandas: blob bytes in, "
    "typed metadata out. The decode body is a deterministic stub (no media "
    "libs in-container); the Spark plumbing — BinaryType column, batch "
    "iterator, explicit output schema — is the real production shape.",
    tags=("multimodal",),
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return docs.mapInPandas(
        _decode_meta_batch,
        schema="doc_id bigint, byte_len bigint, width bigint, height bigint, format string",
    )


RESIZE_TARGET = 256  # bytes in the synthetic "resized" representation


def resize_image(blob: bytes) -> bytes:
    """Real resize — requires PIL/opencv, absent here; the deterministic
    stand-in truncates to RESIZE_TARGET bytes (a real thumbnailer returns
    a new smaller encoded blob the same way: bytes in, fewer bytes out)."""
    return blob[:RESIZE_TARGET]


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: blob in -> (smaller) blob out, 1:1 rows. The
    output carries the REAL binary column so downstream stages (storage,
    further decode) see production-shaped data."""
    for pdf in batches:
        resized = [resize_image(b) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "orig_len": [len(b) for b in pdf["blob"]],
                "resized": resized,
            }
        )


@register(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS orig_len,
           CAST(LEAST(strlen(text), {RESIZE_TARGET}) AS BIGINT) AS resized_len,
           md5(substr(text, 1, {RESIZE_TARGET})) AS resized_md5
    FROM documents
    """,
    doc="Binary resize via mapInPandas: blob in, smaller blob out (stub "
    "truncates to 256 bytes; a real thumbnailer is the same 1:1 bytes-to-"
    "bytes shape). The result keeps a genuine BinaryType column through "
    "the plan; the oracle compares its md5 + lengths since raw blob "
    "representations differ across engine result surfaces. Documents are "
    "ASCII so DuckDB's char-substr equals the byte-truncation.",
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    resized = docs.mapInPandas(
        _resize_batch, schema="doc_id bigint, orig_len bigint, resized binary"
    )
    return resized.select(
        "doc_id",
        "orig_len",
        F.length("resized").cast("bigint").alias("resized_len"),
        F.md5("resized").alias("resized_md5"),
    )


def _frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with multi-row output: sample frame offsets."""
    for pdf in batches:
        out_doc, out_idx, out_off = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            n = len(blob)
            for idx in range(0, (n - 1) // FRAME_STRIDE + 1):
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_off.append(idx * FRAME_STRIDE)
        yield pd.DataFrame(
            {"doc_id": out_doc, "frame_idx": out_idx, "byte_offset": out_off}
        )


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(unnest(generate_series(0, (strlen(text) - 1) // {FRAME_STRIDE})) AS BIGINT) AS frame_idx,
           CAST(unnest(generate_series(0, (strlen(text) - 1) // {FRAME_STRIDE})) * {FRAME_STRIDE} AS BIGINT) AS byte_offset
    FROM documents
    """,
    doc="Frame sampling over a synthetic video blob: mapInPandas emitting "
    "multiple rows per input (frame_idx, byte_offset every 100 bytes). "
    "Exercises the 1-to-N batch shape a real frame extractor uses.",
    tags=("multimodal",),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return docs.mapInPandas(
        _frame_sample_batch,
        schema="doc_id bigint, frame_idx bigint, byte_offset bigint",
    )


AUDIO_CHUNK = 256  # bytes per chunk of the synthetic waveform
AUDIO_SAMPLE_RATE = 16000
AUDIO_BYTES_PER_SAMPLE = 2  # int16 PCM


def _audio_chunk_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: slice each blob into fixed-size chunks and
    compute per-chunk features (here: length, digest, PCM duration).
    Unlike frame sampling this actually materializes the chunk bytes —
    the shape a real feature extractor (fbank, spectrogram) uses."""
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "chunk_idx": [], "chunk_len": [], "chunk_md5": [], "duration_ms": []}
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            n = len(blob)
            for idx in range(0, (n - 1) // AUDIO_CHUNK + 1):
                chunk = blob[idx * AUDIO_CHUNK : (idx + 1) * AUDIO_CHUNK]
                out["doc_id"].append(doc_id)
                out["chunk_idx"].append(idx)
                out["chunk_len"].append(len(chunk))
                out["chunk_md5"].append(hashlib.md5(chunk).hexdigest())
                out["duration_ms"].append(
                    (len(chunk) // AUDIO_BYTES_PER_SAMPLE) * 1000 // AUDIO_SAMPLE_RATE
                )
        yield pd.DataFrame(out)


@register(
    "multimodal_audio_chunks",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, text,
             unnest(generate_series(0, (strlen(text) - 1) // {AUDIO_CHUNK})) AS chunk_idx
      FROM documents
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(least({AUDIO_CHUNK}, strlen(text) - chunk_idx * {AUDIO_CHUNK}) AS BIGINT) AS chunk_len,
           md5(substr(text, chunk_idx * {AUDIO_CHUNK} + 1, {AUDIO_CHUNK})) AS chunk_md5,
           CAST((least({AUDIO_CHUNK}, strlen(text) - chunk_idx * {AUDIO_CHUNK}) // {AUDIO_BYTES_PER_SAMPLE})
                * 1000 // {AUDIO_SAMPLE_RATE} AS BIGINT) AS duration_ms
    FROM c
    """,
    doc=f"Audio chunking over a synthetic int16-PCM blob: {AUDIO_CHUNK}-byte "
    "chunks, each with its byte length, md5 digest of the actual sliced "
    "bytes, and integer-exact PCM duration at 16 kHz. Completes the "
    "image/video/audio triad: decode-meta is 1-to-1 metadata, "
    "frame-sample is 1-to-N offsets, this is 1-to-N with materialized "
    "chunk payloads — the memory-relevant case (Arrow batches bound the "
    "per-task footprint regardless of blob size).",
    tags=("multimodal",),
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("blob")
    )
    return docs.mapInPandas(
        _audio_chunk_batch,
        schema="doc_id bigint, chunk_idx bigint, chunk_len bigint, chunk_md5 string, duration_ms bigint",
    )
