"""Golden tests for the REAL multimodal decoders (no media libs needed):
PNG via pure numpy+zlib and WAV/PCM via stdlib RIFF parsing."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from osm2orc_spark.operators.multimodal import (
    PNG_SIG,
    decode_image,
    decode_png,
    decode_wav,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Forward PNG filter (the encoder side) — the inverse of the
    decoder's unfilter, applied byte-exactly per the PNG spec."""
    out = bytearray([ftype])
    for x in range(len(row)):
        a = int(row[x - bpp]) if x >= bpp else 0
        b = int(prev[x])
        c = int(prev[x - bpp]) if x >= bpp else 0
        raw = int(row[x])
        if ftype == 0:
            v = raw
        elif ftype == 1:
            v = raw - a
        elif ftype == 2:
            v = raw - b
        elif ftype == 3:
            v = raw - ((a + b) >> 1)
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = raw - pred
        out.append(v & 0xFF)
    return bytes(out)


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder for test goldens: 8-bit gray/RGB/RGBA, one
    explicit filter type per scanline."""
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = pixels.reshape(h, w * ch).astype(np.uint8)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        raw += _filter_row(filters[y], flat[y], prev, ch)
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _demo_pixels(h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


class TestPngDecode:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_roundtrip_filter0(self, ch):
        px = _demo_pixels(5, 7, ch)
        m = decode_png(encode_png(px))
        assert (m["width"], m["height"], m["channels"]) == (7, 5, ch)
        assert np.array_equal(m["pixels"], px)

    @pytest.mark.parametrize("ftype", [1, 2, 3, 4])
    def test_roundtrip_each_filter(self, ftype):
        px = _demo_pixels(6, 4, 3)
        m = decode_png(encode_png(px, filters=[ftype] * 6))
        assert np.array_equal(m["pixels"], px)

    def test_roundtrip_mixed_filters(self):
        px = _demo_pixels(5, 9, 4)
        m = decode_png(encode_png(px, filters=[0, 1, 2, 3, 4]))
        assert np.array_equal(m["pixels"], px)
        assert m["format"] == "png"
        assert m["channel_means"] == [float(px[..., c].mean()) for c in range(4)]

    def test_bad_crc_rejected(self):
        blob = bytearray(encode_png(_demo_pixels(2, 2, 3)))
        blob[-5] ^= 0xFF  # corrupt IEND CRC
        with pytest.raises(ValueError, match="bad CRC"):
            decode_png(bytes(blob))

    def test_decode_image_dispatches_real_png(self):
        px = _demo_pixels(3, 11, 3)
        meta = decode_image(encode_png(px))
        assert meta == {"width": 11, "height": 3, "format": "png"}

    def test_decode_image_fake_for_non_png(self):
        meta = decode_image(b"abcdef")  # n=6: 6%640+1, 42%480+1, 6%3
        assert meta == {"width": 7, "height": 43, "format": "raw"}


class TestWavDecode:
    def test_roundtrip_stdlib_writer(self):
        rng = np.random.default_rng(7)
        samples = rng.integers(-3000, 3000, size=1600 * 2, dtype=np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(samples.tobytes())
        m = decode_wav(buf.getvalue())
        assert m["channels"] == 2
        assert m["sample_rate"] == 16000
        assert m["bits"] == 16
        assert m["n_frames"] == 1600
        assert m["duration_ms"] == 100
        assert m["rms"] == pytest.approx(
            float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
        )

    def test_not_wav_rejected(self):
        with pytest.raises(ValueError, match="not a WAV"):
            decode_wav(b"\x00" * 64)


def test_real_png_through_mapinpandas(spark):
    """The decode-meta kernel reports REAL dimensions for PNG blobs in a
    genuine BinaryType column through mapInPandas."""
    from osm2orc_spark.operators.multimodal import _decode_meta_batch

    blobs = [
        (1, bytearray(encode_png(_demo_pixels(4, 6, 3)))),
        (2, bytearray(encode_png(_demo_pixels(2, 9, 1), filters=[4, 2]))),
        (3, bytearray(b"not-an-image")),
    ]
    df = spark.createDataFrame(blobs, "doc_id bigint, blob binary")
    out = {
        r["doc_id"]: r
        for r in df.mapInPandas(
            _decode_meta_batch,
            schema="doc_id bigint, byte_len bigint, width bigint, height bigint, format string",
        ).collect()
    }
    assert (out[1]["width"], out[1]["height"], out[1]["format"]) == (6, 4, "png")
    assert (out[2]["width"], out[2]["height"], out[2]["format"]) == (9, 2, "png")
    assert out[3]["format"] == "raw"  # len 12 -> fake path


class TestJpegHeader:
    @staticmethod
    def _jpeg(width, height, progressive=False, components=3):
        """Minimal structurally-valid JPEG header stream: SOI, APP0, DQT
        (skipped segments), then SOF0/SOF2 with the frame dimensions."""
        sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        dqt = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x00" + b"\x01" * 64
        sof_body = (
            b"\x08"
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + bytes([components])
            + b"\x01\x22\x00" * components
        )
        sof = sof_marker + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
        return b"\xff\xd8" + app0 + dqt + sof

    def test_sof0_dims(self):
        from osm2orc_spark.operators.multimodal import decode_jpeg_header

        m = decode_jpeg_header(self._jpeg(640, 480))
        assert (m["width"], m["height"], m["components"], m["progressive"]) == (
            640, 480, 3, False,
        )

    def test_sof2_progressive(self):
        from osm2orc_spark.operators.multimodal import decode_jpeg_header

        m = decode_jpeg_header(self._jpeg(123, 45, progressive=True, components=1))
        assert (m["width"], m["height"], m["progressive"]) == (123, 45, True)

    def test_decode_image_dispatches_jpeg(self):
        from osm2orc_spark.operators.multimodal import decode_image

        m = decode_image(self._jpeg(32, 16))
        assert (m["width"], m["height"], m["format"]) == (32, 16, "jpeg")

    def test_not_jpeg_rejected(self):
        import pytest

        from osm2orc_spark.operators.multimodal import decode_jpeg_header

        with pytest.raises(ValueError, match="not a JPEG"):
            decode_jpeg_header(b"\x00\x01rubbish")

    def test_missing_sof_rejected(self):
        import pytest

        from osm2orc_spark.operators.multimodal import decode_jpeg_header

        # SOI + APP0 only, then EOI: structurally fine, no frame header
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
        with pytest.raises(ValueError, match="no SOF"):
            decode_jpeg_header(b"\xff\xd8" + app0 + b"\xff\xd9")

    def test_fill_bytes_before_markers(self):
        """JPEG permits runs of 0xFF fill (padding) bytes before any
        marker; real camera encoders emit them. The walk must skip the
        run, not reject it as misalignment."""
        from osm2orc_spark.operators.multimodal import decode_jpeg_header

        blob = self._jpeg(640, 480)
        # inject a fill run between SOI and the first marker segment
        padded = blob[:2] + b"\xff\xff\xff" + blob[2:]
        m = decode_jpeg_header(padded)
        assert (m["width"], m["height"]) == (640, 480)


class TestPngHostileInputs:
    """Bomb/truncation guards (r13): the expected pixel-buffer size
    follows from IHDR alone, so a bomb PNG (tiny IDAT, absurd claimed
    dims) is refused BEFORE its stream is inflated into memory, and a
    stream that ends short of the expected size stays a loud error."""

    def test_bomb_png_refused_before_inflate(self):
        ihdr = struct.pack(">IIBBBBB", 50_000, 50_000, 8, 6, 0, 0, 0)
        bomb = (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 100))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="decoder cap"):
            decode_png(bomb)

    def test_short_idat_stream_loud(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0)
        short = (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="IDAT length mismatch"):
            decode_png(short)


def test_truncated_wav_data_chunk_loud():
    """A data chunk shorter than its declared length is a truncated file
    and must raise, never decode as a silently-shorter sample stream."""
    import io as _io
    import wave as _wave

    buf = _io.BytesIO()
    w = _wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16_000)
    w.writeframes(np.zeros(16_000, dtype="<i2").tobytes())
    w.close()
    data = buf.getvalue()
    from osm2orc_spark.operators.multimodal import decode_wav

    assert decode_wav(data)["n_frames"] == 16_000  # intact file unchanged
    with pytest.raises(ValueError, match="truncated b'data' chunk"):
        decode_wav(data[: len(data) // 2])


def test_wav_trailing_partial_chunk_header_loud():
    """A file truncated INSIDE a chunk header leaves 1-7 trailing bytes
    the walk silently skipped before r14 — header-level truncation must
    be as loud as body-level truncation (r13 advice)."""
    import io as _io
    import wave as _wave

    buf = _io.BytesIO()
    w = _wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8_000)
    w.writeframes(np.zeros(800, dtype="<i2").tobytes())
    w.close()
    data = buf.getvalue()
    from osm2orc_spark.operators.multimodal import decode_wav

    assert decode_wav(data)["n_frames"] == 800  # intact file unchanged
    for extra in (1, 3, 7):
        with pytest.raises(ValueError, match="trailing partial chunk header"):
            decode_wav(data + b"LIST"[:extra])


def test_zero_dimension_png_rejected_before_inflate():
    """height=0 would make the bounded-inflate cap 0, which zlib treats
    as UNLIMITED — the bomb-guard bypass found in review. Zero dims are
    invalid PNG and must be rejected before any decompression."""
    for w, h in ((1, 0), (0, 1), (0, 0)):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        blob = (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * (1024 * 1024)))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="zero-dimension"):
            decode_png(blob)
