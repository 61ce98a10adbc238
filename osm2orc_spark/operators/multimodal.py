"""Multimodal (binary-column) operators.

Images/audio/video are carried as opaque ``binary`` columns plus typed
metadata. Since no media libraries ship in this container, the actual
decoders are stubbed (``decode_image`` raises or falls back to a
deterministic fake), but the Spark-side plumbing is real and tested:
BinaryType columns, Arrow-batched ``mapInPandas`` with bytes in/out,
multi-row-out frame sampling, and explicit output schemas.

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

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2orc_spark.registry import register
from osm2orc_spark.tables import load

FRAME_STRIDE = 100  # bytes per synthetic "frame"


def decode_image(blob: bytes) -> dict:
    """Real image decode — requires PIL/opencv, absent in this container.

    Deterministic fake keeps the pipeline testable; swap the body for
    ``PIL.Image.open(io.BytesIO(blob))`` in production.
    """
    try:
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real decoder wiring reserved for image-capable env")
    except ImportError:
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
