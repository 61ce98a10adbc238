"""Pure-Python OSM PBF codec: blob framing + osmformat decode/encode.

Replaces the reference's osm4j-pbf dependency (reference build.gradle:27-28,
used via PbfIterator in standalone/OsmPbf2Orc.java:118-120) with a
self-contained implementation of the public OSM PBF spec
(wiki.openstreetmap.org/wiki/PBF_Format):

- file framing: [int4 BE header-len][BlobHeader][Blob], repeated
- BlobHeader {1:type, 2:indexdata, 3:datasize}
- Blob {1:raw, 2:raw_size, 3:zlib_data}
- HeaderBlock {1:bbox{1:left,2:right,3:top,4:bottom sint64 nanodeg}}
- PrimitiveBlock {1:stringtable{1:bytes*}, 2:group*, 17:granularity=100,
  18:date_granularity=1000, 19:lat_offset, 20:lon_offset}
- PrimitiveGroup {1:Node*, 2:DenseNodes, 3:Way*, 4:Relation*}
- DenseNodes {1:id sint64 packed delta, 5:DenseInfo, 8:lat, 9:lon packed
  delta, 10:keys_vals interleaved (0 terminates a node)}
- DenseInfo {1:version, 2:timestamp delta, 3:changeset delta, 4:uid delta,
  5:user_sid delta, 6:visible}
- Way {1:id, 2:keys, 3:vals, 4:Info, 8:refs sint64 packed delta}
- Relation {1:id, 2:keys, 3:vals, 4:Info, 8:roles_sid, 9:memids sint64
  packed delta, 10:types enum(0=node,1=way,2=relation)}
- Info {1:version, 2:timestamp, 3:changeset, 4:uid, 5:user_sid, 6:visible}

The encoder exists for test fixtures (the reference has no writer either;
its validation was manual runs on real extracts — SURVEY.md §5).

Coordinates decode via INTEGER nanodegree arithmetic into decimal
strings, so DECIMAL(9,7)/(10,7) casts downstream are exact and never
route through a double (mirrors the cell-exactness rule of SURVEY §2B/B4;
the reference's double path is reproduced bit-for-bit for 7-decimal
values, which is everything the default granularity=100 can encode).
"""

from __future__ import annotations

import os
import struct
import zlib
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np

NANO = 10**9

# Shared read-only empty tag dict for untagged dense nodes (downstream is
# Arrow conversion / the row adapter, neither mutates cell values).
_EMPTY_TAGS: dict[str, str] = {}

# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fieldno, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 1:
            val = struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield fieldno, wire, val


def _decode_string_table(buf: bytes) -> list[str]:
    """Specialized StringTable decode: every entry is field 1 / wire 2
    (key byte 0x0A), so a tight slice loop replaces the generic _fields
    generator — this table is decoded once per block but holds every
    tag key/value and user name, so it dominates non-dense decode time.
    Falls back to the generic walker on any unexpected key byte."""
    out: list[str] = []
    pos, n = 0, len(buf)
    # ASCII fast path: decode the whole table once and slice the str --
    # byte offsets equal char offsets, so every per-string bytes-slice +
    # .decode() pair collapses into one str slice. (isascii/decode are
    # single C calls over the buffer; tag keys/values and user names are
    # overwhelmingly ASCII in practice.)
    big = buf.decode("ascii") if buf.isascii() else None
    while pos < n:
        if buf[pos] != 0x0A:  # not a plain StringTable -> generic path
            return [
                bytes(v).decode("utf-8") for f, _, v in _fields(buf) if f == 1
            ]
        pos += 1
        ln = buf[pos]
        pos += 1
        if ln >= 0x80:  # rare: string >= 128 bytes
            ln &= 0x7F
            shift = 7
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if b < 0x80:
                    break
                shift += 7
        end = pos + ln
        out.append(big[pos:end] if big is not None else buf[pos:end].decode("utf-8"))
        pos = end
    return out


def _packed_varints(buf: bytes) -> list[int]:
    # varint read inlined (single-byte fast path): this loop runs per
    # way/relation packed field, where values are predominantly < 128.
    out: list[int] = []
    append = out.append
    pos, n = 0, len(buf)
    while pos < n:
        b = buf[pos]
        pos += 1
        if b < 0x80:
            append(b)
            continue
        v = b & 0x7F
        shift = 7
        while True:
            b = buf[pos]
            pos += 1
            v |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        append(v)
    return out


def _packed_varints_np_offsets(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized packed-varint decode -> (uint64 values, int64 byte
    positions of each varint's first byte).

    Continuation bits mark varint boundaries, each byte's 7 payload bits
    are shifted into place by its offset within the varint, and a
    segmented sum (reduceat) folds the bytes of each varint together.
    64-bit wraparound matches two's-complement varint semantics (a
    10-byte varint's top bits drop)."""
    a = np.frombuffer(buf, dtype=np.uint8)
    if a.size == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    starts = np.empty(a.size, dtype=bool)
    starts[0] = True
    np.less(a[:-1], 0x80, out=starts[1:])  # byte after a non-continuation byte
    start_idx = np.flatnonzero(starts)
    # offset of every byte within its own varint: position minus the
    # position of its varint's first byte
    group_start = np.repeat(start_idx, np.diff(start_idx, append=a.size))
    shifts = ((np.arange(a.size, dtype=np.int64) - group_start) * 7).astype(
        np.uint64
    )
    vals = (a & 0x7F).astype(np.uint64) << shifts
    return np.add.reduceat(vals, start_idx), start_idx


def _packed_varints_np(buf: bytes) -> np.ndarray:
    """Vectorized packed-varint decode -> uint64 array (the per-byte
    Python loop is the single hottest spot in block decode)."""
    return _packed_varints_np_offsets(buf)[0]


# Below this buffer size the scalar loop beats numpy's fixed per-call cost
# (~10µs of array setup): way/relation keys/vals/refs/roles are typically a
# handful of varints, while DenseNodes fields are tens of KB.
_NP_CUTOVER = 192


def _packed_varints_list(buf: bytes) -> list[int]:
    """Packed varint field -> Python ints, sized-based scalar/numpy pick."""
    if len(buf) < _NP_CUTOVER:
        return _packed_varints(buf)
    return _packed_varints_np(buf).tolist()


def _packed_svarints_list(buf: bytes, delta: bool = False) -> list[int]:
    """Packed zigzag-sint64 field -> Python ints, optionally prefix-summed
    (the PBF delta encoding for ids/coords/refs/memids/DenseInfo)."""
    if len(buf) < _NP_CUTOVER:
        out: list[int] = []
        append = out.append
        pos = 0
        acc = 0
        n = len(buf)
        while pos < n:
            b = buf[pos]
            pos += 1
            if b < 0x80:
                v = b
            else:
                v = b & 0x7F
                shift = 7
                while True:
                    b = buf[pos]
                    pos += 1
                    v |= (b & 0x7F) << shift
                    if b < 0x80:
                        break
                    shift += 7
            s = (v >> 1) ^ -(v & 1)
            if delta:
                acc += s
                append(acc)
            else:
                append(s)
        return out
    v = _packed_varints_np(buf)
    s = (v >> np.uint64(1)).astype(np.int64) ^ -(
        (v & np.uint64(1)).astype(np.int64)
    )
    if delta:
        s = np.cumsum(s)
    return s.tolist()


def _coord_nanos(off: int, granularity: int, raws: list[int]) -> list[int]:
    """Exact nanodegree values for a whole dense block at once (one
    vectorized multiply-add).  Coordinates stay INTEGERS through the
    columnar core — the Arrow batch builder turns them into
    decimal128(38,9) unscaled values with zero per-item Python work
    (see nano_to_decimal128).  The old per-coord decimal f-string cost
    ~530 ns each and was 17%% of block decode time."""
    return (off + granularity * np.asarray(raws, dtype=np.int64)).tolist()


def _tag(out: bytearray, fieldno: int, wire: int) -> None:
    _write_varint(out, (fieldno << 3) | wire)


def _emit_bytes(out: bytearray, fieldno: int, data: bytes) -> None:
    _tag(out, fieldno, 2)
    _write_varint(out, len(data))
    out.extend(data)


def _emit_varint(out: bytearray, fieldno: int, v: int) -> None:
    _tag(out, fieldno, 0)
    _write_varint(out, v)


def _emit_packed(out: bytearray, fieldno: int, vals: list[int], zigzag: bool = False) -> None:
    body = bytearray()
    for v in vals:
        _write_varint(body, _zigzag_encode(v) if zigzag else v)
    _emit_bytes(out, fieldno, bytes(body))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


@dataclass
class BlobRef:
    """Location of one data blob inside a PBF file (the parallel split unit)."""

    path: str
    offset: int  # file offset of the Blob message body
    size: int
    kind: str  # 'OSMHeader' | 'OSMData'


# PBF spec hard limits (https://wiki.openstreetmap.org/wiki/PBF_Format):
# BlobHeader must be < 64 KiB, Blob must be < 32 MiB.  Enforcing them
# turns structural corruption (truncated files, garbage length words)
# into LOUD errors instead of a silently-empty or silently-partial scan
# — at planet scale a quiet drop of trailing blobs is unrecoverable
# data loss, so every task must fail visibly instead.
_BLOBHEADER_MAX = 64 * 1024
_BLOB_MAX = 32 * 1024 * 1024


def _checked_blob_header(header: bytes, header_len: int, where: str) -> tuple[str, int]:
    if not 0 < header_len < _BLOBHEADER_MAX:
        raise ValueError(
            f"BlobHeader length {header_len} outside (0, 64KiB) at {where} — not a PBF file?"
        )
    if len(header) != header_len:
        raise ValueError(f"truncated BlobHeader at {where}: {len(header)}/{header_len} bytes")
    kind, datasize = "", 0
    for fieldno, _, val in _fields(header):
        if fieldno == 1:
            kind = bytes(val).decode("utf-8")
        elif fieldno == 3:
            datasize = val
    if not kind:
        raise ValueError(f"BlobHeader without a type string at {where}")
    if not 0 < datasize < _BLOB_MAX:
        raise ValueError(f"Blob datasize {datasize} outside (0, 32MiB) at {where}")
    return kind, datasize


def scan_blob_index(path: str) -> list[BlobRef]:
    """Driver-side index scan: reads only the 4-byte lengths and
    BlobHeaders (a few hundred bytes per ~8 MB blob), never blob payloads.
    This is what makes PBF ingestion embarrassingly parallel: each BlobRef
    becomes an independent task that seeks straight to its payload.
    Structural corruption (truncated length/header/body) raises ValueError
    — see _checked_blob_header."""
    refs: list[BlobRef] = []
    filesize = os.path.getsize(path)
    with open(path, "rb") as f:
        while True:
            at = f.tell()
            lenbuf = f.read(4)
            if not lenbuf:
                break  # clean EOF on a blob boundary
            if len(lenbuf) < 4:
                raise ValueError(f"truncated blob length word at offset {at} of {path}")
            header_len = struct.unpack(">i", lenbuf)[0]
            header = f.read(max(header_len, 0))
            kind, datasize = _checked_blob_header(header, header_len, f"offset {at} of {path}")
            offset = f.tell()
            if offset + datasize > filesize:
                raise ValueError(
                    f"Blob at offset {at} of {path} extends past EOF "
                    f"({offset + datasize} > {filesize}): truncated file"
                )
            refs.append(BlobRef(path, offset, datasize, kind))
            f.seek(offset + datasize)
    return refs


def _bounded_inflate(data: bytes) -> bytes:
    """zlib-decompress with the spec's 32 MiB uncompressed hard limit —
    a zip-bomb blob fails loudly instead of exhausting task memory."""
    d = zlib.decompressobj()
    raw = d.decompress(data, _BLOB_MAX)
    # eof False == the stream did not END within the cap: either a bomb
    # (output cap hit with input left) or a truncated stream (input
    # exhausted mid-stream — zlib.decompress raised here; decompressobj
    # does not, so check explicitly)
    if not d.eof:
        raise ValueError(
            f"Blob zlib stream did not terminate within the spec's 32MiB "
            f"hard limit ({len(raw)} bytes out, "
            f"{len(d.unconsumed_tail)} in unconsumed): bomb or truncated"
        )
    return raw


def read_blob(ref: BlobRef) -> bytes:
    """Fetch + decompress one blob's payload (ranged read)."""
    with open(ref.path, "rb") as f:
        f.seek(ref.offset)
        blob = f.read(ref.size)
    if len(blob) != ref.size:
        raise ValueError(
            f"short read at offset {ref.offset} of {ref.path}: "
            f"{len(blob)}/{ref.size} bytes — file truncated since indexing?"
        )
    return _decompress_blob(blob)


def _decompress_blob(blob: bytes) -> bytes:
    raw = None
    for fieldno, _, val in _fields(blob):
        if fieldno == 1:
            raw = bytes(val)
        elif fieldno == 3:
            raw = _bounded_inflate(bytes(val))
        elif fieldno in (4, 5, 6, 7):
            raise ValueError("unsupported PBF compression (only raw/zlib)")
    if raw is None:
        raise ValueError("empty Blob")
    return raw


def iter_blobs_from_bytes(data: bytes):
    """Yield (kind, decompressed_payload) for every blob in an in-memory
    PBF file — the streaming-source twin of scan_blob_index+read_blob,
    for paths where the whole file arrives as one binary value.  Applies
    the same structural checks (truncation is a LOUD ValueError, never a
    silently-shorter stream)."""
    pos = 0
    n = len(data)
    while pos < n:
        at = pos  # blob start (the length word), for located errors
        if pos + 4 > n:
            raise ValueError(f"truncated blob length word at offset {at}")
        header_len = struct.unpack(">i", data[pos : pos + 4])[0]
        pos += 4
        header = data[pos : pos + max(header_len, 0)]
        pos += max(header_len, 0)
        kind, datasize = _checked_blob_header(header, header_len, f"offset {at}")
        if pos + datasize > n:
            raise ValueError(
                f"Blob at offset {at} extends past end of stream "
                f"({pos + datasize} > {n}): truncated file"
            )
        yield kind, _decompress_blob(data[pos : pos + datasize])
        pos += datasize


def decode_header_block(data: bytes) -> dict:
    """HeaderBlock -> {'bounds': (left, bottom, right, top) degrees} | {}.

    The bounds tuple ordering matches the reference's ORC user-metadata
    string "left, bottom, right, top" (OsmPbf2Orc.java:122-125)."""
    out: dict = {}
    for fieldno, _, val in _fields(data):
        if fieldno == 1:
            bbox = {}
            for f2, _, v2 in _fields(bytes(val)):
                bbox[f2] = _zigzag_decode(v2)
            if bbox:
                out["bounds"] = (
                    bbox.get(1, 0) / NANO,
                    bbox.get(4, 0) / NANO,
                    bbox.get(2, 0) / NANO,
                    bbox.get(3, 0) / NANO,
                )
    return out


def _nano_to_decimal_str(nano: int) -> str:
    """Exact nanodegrees -> decimal-degree string (no float involved)."""
    sign = "-" if nano < 0 else ""
    a = abs(nano)
    return f"{sign}{a // NANO}.{a % NANO:09d}"


# (version, timestamp, changeset, uid, user, visible)
_INFO_DEFAULT = (-1, None, None, None, None, True)


def _decode_info_generic(buf: bytes, strings: list[str]) -> tuple:
    version, timestamp, changeset, uid, user, visible = _INFO_DEFAULT
    for fieldno, _, val in _fields(buf):
        if fieldno == 1:
            version = val
        elif fieldno == 2:
            timestamp = val
        elif fieldno == 3:
            changeset = val
        elif fieldno == 4:
            uid = val
        elif fieldno == 5:
            user = strings[val]
        elif fieldno == 6:
            visible = bool(val)
    return (version, timestamp, changeset, uid, user, visible)


def _decode_info(buf: bytes, strings: list[str]) -> tuple:
    """Info message -> (version, timestamp, changeset, uid, user, visible).

    Specialized tight loop: Info defines only varint fields 1-6, so every
    field is a single-byte key followed by one varint — the generic
    _fields generator (one resume per field, ~one third of way/relation
    decode time) is skipped entirely. Any unexpected key byte falls back
    to the generic walker."""
    version, timestamp, changeset, uid, user, visible = _INFO_DEFAULT
    pos, n = 0, len(buf)
    while pos < n:
        key = buf[pos]
        pos += 1
        if key >= 0x80 or key & 7:  # multi-byte key or non-varint wire
            return _decode_info_generic(buf, strings)
        v, pos = _read_varint(buf, pos)
        f = key >> 3
        if f == 1:
            version = v
        elif f == 2:
            timestamp = v
        elif f == 3:
            changeset = v
        elif f == 4:
            uid = v
        elif f == 5:
            user = strings[v]
        elif f == 6:
            visible = bool(v)
    return (version, timestamp, changeset, uid, user, visible)


ENTITY_COLUMNS = (
    "id",
    "type",
    "tags",
    "lat",
    "lon",
    "nds",
    "members",
    "changeset",
    "timestamp_ms",
    "uid",
    "user",
    "version",
    "visible",
)


def decode_primitive_block(data: bytes) -> Iterator[dict]:
    """PrimitiveBlock -> entity dicts (uniform row shape for all 3 kinds).

    Row-adapter over the columnar core: {'id','type','tags','lat','lon',
    'nds','members','changeset','timestamp_ms','uid','user','version',
    'visible'} with lat/lon as exact decimal strings (or None) — the
    human/test-facing view; the columnar core keeps coordinates as
    nanodegree ints (the Spark path never materializes coord strings)."""
    cols = decode_primitive_block_columns(data)
    for row in zip(*(cols[k] for k in ENTITY_COLUMNS)):
        d = dict(zip(ENTITY_COLUMNS, row))
        if d["lat"] is not None:
            d["lat"] = _nano_to_decimal_str(d["lat"])
        if d["lon"] is not None:
            d["lon"] = _nano_to_decimal_str(d["lon"])
        yield d


# ---------------------------------------------------------------------------
# Arrow-native decode: the Spark ingest path.
#
# decode_primitive_block_columns materializes every tag key/value/user as a
# Python str and every tagged entity's tags as a Python dict — measured 35%
# (string table) + ~25% (group walk incl. tag assembly) of block decode,
# and the object churn is what caps parallel decode scaling (a pure-CPU
# loop scales ~23x across a 32-process pool on the same host; this codec
# saturated at ~3.8x).  The arrow path keeps everything columnar: the
# string table becomes ONE pa.StringArray built zero-copy from an
# offsets walk, packed fields stay numpy end-to-end, and tag maps / user
# columns are C-side `take` gathers of string-table indices — no
# per-entity Python object is ever created.  Any block that violates a
# fast-path assumption (plain non-dense Node messages, a non-compliant
# zero string-table sid used as a value, an odd dangling key) falls back
# to the dict path + columns_to_batch for that block, so the output is
# identical by construction.  One documented asymmetry: a spec-invalid
# DUPLICATE tag key within a single entity would be deduped (last wins)
# by the dict path but preserved by the dense fast path's MapArray; the
# OSM spec forbids it and no writer emits it.
# ---------------------------------------------------------------------------

_MEMBER_TYPE_NAMES = {0: "node", 1: "way", 2: "relation"}


def planet_arrow_schema():
    """The planet raw schema as a pure-pyarrow schema (no pyspark import;
    pinned equal to to_arrow_schema(PLANET_RAW_SCHEMA) by a test)."""
    import pyarrow as pa

    return pa.schema(
        [
            pa.field("id", pa.int64()),
            pa.field("type", pa.string()),
            pa.field("tags", pa.map_(pa.string(), pa.string())),
            pa.field("lat", pa.decimal128(38, 9)),
            pa.field("lon", pa.decimal128(38, 9)),
            pa.field("nds", pa.list_(pa.int64())),
            pa.field(
                "members",
                pa.list_(
                    pa.struct(
                        [
                            pa.field("type", pa.string()),
                            pa.field("ref", pa.int64()),
                            pa.field("role", pa.string()),
                        ]
                    )
                ),
            ),
            pa.field("changeset", pa.int64()),
            pa.field("timestamp_ms", pa.int64()),
            pa.field("uid", pa.int64()),
            pa.field("user", pa.string()),
            pa.field("version", pa.int64()),
            pa.field("visible", pa.bool_()),
        ]
    )


def nano_to_decimal128(vals: list["int | None"]):
    """Nanodegree ints (or None) -> pyarrow decimal128(38, 9) array.

    The decimal's unscaled value IS the nanodegree count, so the
    conversion is exact by construction (no float, no string): widen
    each int64 to a little-endian two's-complement int128 by pairing it
    with its sign extension, and hand both words to
    Array.from_buffers.  Validity is reused from the int64 ingest
    (pa.array handles None at C speed)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ints = pa.array(vals, type=pa.int64())
    lo = pc.fill_null(ints, 0).to_numpy()
    return _nano_np_to_decimal128(lo, validity=ints.buffers()[0])


def _nano_np_to_decimal128(nano: np.ndarray, validity=None):
    """int64 nanodegree numpy array -> decimal128(38,9) (see above)."""
    import pyarrow as pa

    n = len(nano)
    words = np.empty(2 * n, dtype=np.int64)
    words[0::2] = nano  # low word (little-endian host assumed: x86/arm64)
    words[1::2] = nano >> 63  # sign extension = high word
    return pa.Array.from_buffers(
        pa.decimal128(38, 9), n, [validity, pa.py_buffer(words.tobytes())]
    )


def columns_to_batch(cols: dict, arrow_schema):
    """Dict-contract column lists -> RecordBatch via per-field pa.array +
    RecordBatch.from_arrays — measured 3.5x cheaper than from_pydict
    (4.8 vs 16.9 ms/blob), whose dict path re-validates and re-chunks
    every column."""
    import pyarrow as pa

    arrays = [
        nano_to_decimal128(cols[f.name])
        if f.name in ("lat", "lon")
        else pa.array(cols[f.name], type=f.type)
        for f in arrow_schema
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)


class _ArrowFallback(Exception):
    """Internal: this block needs the dict-path decode (rare shapes)."""


def _decode_string_table_arrow(buf: bytes):
    """StringTable -> pa.StringArray with ZERO per-string Python objects:
    a minimal offsets walk (ints only — no slicing, no str creation),
    then numpy range-mask compaction of the payload bytes and a
    zero-copy StringArray.from_buffers.  One bytes().decode('utf-8')
    pass validates encoding (the dict path's per-string decode would
    have raised on invalid UTF-8).  Returns None when the buffer is not
    a plain StringTable (caller falls back)."""
    import pyarrow as pa

    n = len(buf)
    if n == 0:
        return pa.array([], type=pa.string())
    # Minimal 2-ops-per-entry walk collecting ONLY entry starts — the
    # sequential length-prefix chain is the one irreducibly serial part,
    # so the loop carries ZERO checks.  This is sound: key bytes and
    # length bytes are re-validated VECTORIZED below, and any violation
    # that would make the walk misparse (a multi-byte length varint,
    # i.e. a string >= 128 bytes, or a non-0x0A key) necessarily sits at
    # some collected start position, where (a[s]==0x0A) / (a[s+1]<0x80)
    # catches it and bails to the dict path.
    starts: list[int] = []
    append = starts.append
    pos = 0
    try:
        while pos < n:
            append(pos)
            pos += 2 + buf[pos + 1]
    except IndexError:
        return None
    a = np.frombuffer(buf, dtype=np.uint8)
    s = np.asarray(starts, dtype=np.int64)
    if pos != n or not (a[s] == 0x0A).all() or not (a[s + 1] < 0x80).all():
        return None
    # UTF-8 validation over the WHOLE buffer (the dict path's per-string
    # decode would have raised): sound because both header bytes are
    # < 0x80 (key 0x0A, length < 0x80), so a header can never act as a
    # continuation byte — buffer-level validity <=> payload validity.
    if not buf.isascii():
        try:
            buf.decode("utf-8")
        except UnicodeDecodeError:
            return None
    # ZERO-COPY StringArray over the raw table bytes: 2n interleaved
    # entries — entry 2i is string i's 2-byte header (never referenced),
    # entry 2i+1 is its payload.  Callers map sid -> 2*sid + 1 (_take).
    # This skips the payload-compaction pass entirely (the masked-select
    # variant cost ~9 ms per 700 KB table).
    m = len(s)
    offs = np.empty(2 * m + 1, dtype=np.int32)
    offs[0:-1:2] = s
    offs[1::2] = s + 2
    offs[-1] = n
    return pa.StringArray.from_buffers(
        2 * m, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf)
    )


def _packed_svarints_np(buf: bytes, delta: bool = False) -> np.ndarray:
    """Packed zigzag-sint64 field -> int64 numpy array (optionally
    prefix-summed) — the arrow decode path never round-trips through
    Python ints."""
    v = _packed_varints_np(buf)
    s = (v >> np.uint64(1)).astype(np.int64) ^ -(
        (v & np.uint64(1)).astype(np.int64)
    )
    if delta:
        s = np.cumsum(s)
    return s


def decode_primitive_block_arrow(data: bytes, arrow_schema=None):
    """PrimitiveBlock -> pyarrow RecordBatch (PLANET raw schema), fully
    columnar: numpy arrays flow straight into Arrow buffers, tag maps
    and user names are `take` gathers on the string-table StringArray.
    Returns None for a block with zero entities.  See the section
    comment above for the fast-path assumptions and fallback rules."""
    import pyarrow as pa

    if arrow_schema is None:
        arrow_schema = planet_arrow_schema()
    try:
        return _decode_block_arrow_fast(data, arrow_schema)
    except _ArrowFallback:
        cols = decode_primitive_block_columns(data)
        if not cols["id"]:
            return None
        return columns_to_batch(cols, arrow_schema)


def _empty_list_array(n: int, list_type):
    import pyarrow as pa

    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)),
        pa.array([], type=list_type.value_type),
    )


def _decode_block_arrow_fast(data: bytes, schema):
    import pyarrow as pa

    strings = None  # pa.StringArray, built lazily from field 1
    groups: list[bytes] = []
    granularity, date_granularity = 100, 1000
    lat_offset = lon_offset = 0
    for fieldno, _, val in _fields(data):
        if fieldno == 1:
            strings = _decode_string_table_arrow(bytes(val))
            if strings is None:
                raise _ArrowFallback
        elif fieldno == 2:
            groups.append(bytes(val))
        elif fieldno == 17:
            granularity = val
        elif fieldno == 18:
            date_granularity = val
        elif fieldno == 19:
            lat_offset = val - (1 << 64) if val >= (1 << 63) else val
        elif fieldno == 20:
            lon_offset = val - (1 << 64) if val >= (1 << 63) else val
    if strings is None:
        strings = pa.array([], type=pa.string())

    nds_type = schema.field("nds").type
    members_type = schema.field("members").type
    vocab = pa.array(["node", "way", "relation"])
    chunks: dict[str, list] = {f.name: [] for f in schema}

    def emit(name: str, arr) -> None:
        f = schema.field(name)
        if arr.type != f.type:
            arr = arr.cast(f.type)
        chunks[name].append(arr)

    # way/rel messages accumulate across ALL groups and flush once per
    # block (or just before a dense run): the writer side of this codec
    # emits ONE group per way/relation, and real files may use small
    # groups too — flushing per group paid the ~30-Arrow-call batch
    # assembly cost per ENTITY (measured 18.3s on a 46k-way block vs
    # 0.25s accumulated).  Order is preserved: a flush happens whenever
    # the entity kind switches.
    way_rel: list[tuple[int, bytes]] = []
    for group in groups:
        # Group walk identical in structure to the dict path (see
        # decode_primitive_block_columns) — only the per-message
        # handling differs.
        posg, ng = 0, len(group)
        while posg < ng:
            keyg = group[posg]
            posg += 1
            if keyg >= 0x80:
                keyg, posg = _read_varint(group, posg - 1)
            fieldno, wireg = keyg >> 3, keyg & 7
            if wireg != 2:
                if wireg == 0:
                    _, posg = _read_varint(group, posg)
                elif wireg == 1:
                    posg += 8
                elif wireg == 5:
                    posg += 4
                else:
                    raise ValueError(f"unsupported wire type {wireg}")
                continue
            lng = group[posg]
            posg += 1
            if lng >= 0x80:
                lng, posg = _read_varint(group, posg - 1)
            gbuf = group[posg : posg + lng]
            posg += lng
            if fieldno == 1:  # plain (non-dense) Node: rare -> dict path
                raise _ArrowFallback
            if fieldno == 2:
                # flush any buffered ways/relations FIRST so row order
                # matches the dict path even in a (spec-invalid) group
                # mixing message kinds
                if way_rel:
                    _emit_way_rel_arrow(
                        way_rel, emit, strings, vocab, date_granularity
                    )
                    way_rel = []
                _emit_dense_arrow(
                    gbuf,
                    emit,
                    strings,
                    vocab,
                    nds_type,
                    members_type,
                    granularity,
                    date_granularity,
                    lat_offset,
                    lon_offset,
                )
            elif fieldno in (3, 4):
                way_rel.append((fieldno, gbuf))
            elif fieldno == 5:  # ChangeSet entity: rare -> dict path
                raise _ArrowFallback
    if way_rel:
        _emit_way_rel_arrow(
            way_rel,
            emit,
            strings,
            vocab,
            date_granularity,
        )

    if not chunks["id"]:
        return None
    arrays = [
        pa.concat_arrays(chunks[f.name])
        if len(chunks[f.name]) > 1
        else chunks[f.name][0]
        for f in schema
    ]
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


def _take(strings, idx_np: np.ndarray):
    """C-side gather of string-table entries by sid (raises on an
    out-of-range sid, like the dict path's strings[k]).  The table is
    the interleaved 2n-entry zero-copy array — sid s lives at 2s+1, and
    the bounds semantics are unchanged (2s+1 < 2n <=> s < n)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.take(strings, pa.array(2 * idx_np.astype(np.int64) + 1))


def _emit_dense_arrow(
    gbuf: bytes,
    emit,
    strings,
    vocab,
    nds_type,
    members_type,
    granularity: int,
    date_granularity: int,
    lat_offset: int,
    lon_offset: int,
) -> None:
    """DenseNodes -> one set of column arrays, zero per-entity Python.

    Tags: keys_vals stays a numpy array; the 0 terminators give both the
    per-node pair counts (map offsets) and — when exactly n zeros are
    present, proving sid 0 is never used as a value — the flat key/value
    index arrays, which two `take` gathers turn into the map children.
    A non-compliant or odd-dangling-key block falls back to the dict
    path (identical output by construction)."""
    import pyarrow as pa

    ids = lats = lons = kv = None
    versions = timestamps = changesets = uids = user_sids = visibles = None
    for f2, _, v2 in _fields(gbuf):
        if f2 == 1:
            ids = _packed_svarints_np(bytes(v2), delta=True)
        elif f2 == 5:
            for f3, _, v3 in _fields(bytes(v2)):
                if f3 == 1:
                    versions = _packed_varints_np(bytes(v3)).astype(np.int64)
                elif f3 == 2:
                    timestamps = _packed_svarints_np(bytes(v3), delta=True)
                elif f3 == 3:
                    changesets = _packed_svarints_np(bytes(v3), delta=True)
                elif f3 == 4:
                    uids = _packed_svarints_np(bytes(v3), delta=True)
                elif f3 == 5:
                    user_sids = _packed_svarints_np(bytes(v3), delta=True)
                elif f3 == 6:
                    visibles = _packed_varints_np(bytes(v3))
        elif f2 == 8:
            lats = _packed_svarints_np(bytes(v2), delta=True)
        elif f2 == 9:
            lons = _packed_svarints_np(bytes(v2), delta=True)
        elif f2 == 10:
            kv = _packed_varints_np(bytes(v2)).astype(np.int64)
    if ids is None or len(ids) == 0:
        return
    n = len(ids)
    # dict-path parity: an empty-but-present packed DenseInfo field is
    # treated as absent (its `if changesets` truthiness check)
    if versions is not None and versions.size == 0:
        versions = None
    if timestamps is not None and timestamps.size == 0:
        timestamps = None
    if changesets is not None and changesets.size == 0:
        changesets = None
    if uids is not None and uids.size == 0:
        uids = None
    if user_sids is not None and user_sids.size == 0:
        user_sids = None
    if visibles is not None and visibles.size == 0:
        visibles = None

    if kv is None or kv.size == 0 or not kv.any():
        offsets = np.zeros(n + 1, dtype=np.int32)
        keys_arr = pa.array([], type=pa.string())
        vals_arr = pa.array([], type=pa.string())
    else:
        zpos = np.flatnonzero(kv == 0)
        if len(zpos) != n:
            raise _ArrowFallback  # sid 0 used as a value -> dict path
        seg_lens = np.diff(np.concatenate(([-1], zpos))) - 1
        if (seg_lens % 2).any():
            raise _ArrowFallback  # dangling key: dict path's zip drops it
        counts = (seg_lens // 2).astype(np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        offsets = offsets.astype(np.int32)
        nz = kv[kv != 0]
        keys_arr = _take(strings, nz[0::2])
        vals_arr = _take(strings, nz[1::2])
    emit(
        "tags",
        pa.MapArray.from_arrays(pa.array(offsets), keys_arr, vals_arr),
    )

    emit("id", pa.array(ids))
    emit("type", _take_vocab_codes(vocab, np.zeros(n, dtype=np.int32)))
    emit("lat", _nano_np_to_decimal128(lat_offset + granularity * lats))
    emit("lon", _nano_np_to_decimal128(lon_offset + granularity * lons))
    emit("nds", _empty_list_array(n, nds_type))
    emit("members", _empty_list_array(n, members_type))
    emit(
        "changeset",
        pa.array(changesets) if changesets is not None else pa.nulls(n, pa.int64()),
    )
    emit(
        "timestamp_ms",
        pa.array(timestamps * date_granularity)
        if timestamps is not None
        else pa.nulls(n, pa.int64()),
    )
    emit("uid", pa.array(uids) if uids is not None else pa.nulls(n, pa.int64()))
    emit(
        "user",
        _take(strings, user_sids)
        if user_sids is not None
        else pa.nulls(n, pa.string()),
    )
    emit(
        "version",
        pa.array(versions)
        if versions is not None
        else pa.array(np.full(n, -1, dtype=np.int64)),
    )
    emit(
        "visible",
        pa.array(visibles.astype(bool))
        if visibles is not None
        else pa.array(np.ones(n, dtype=bool)),
    )


def _concat_varints(bufs: list) -> tuple[np.ndarray, np.ndarray]:
    """Decode a list of whole-varint buffers in ONE vectorized pass ->
    (uint64 values, per-buffer varint counts).  Buffer boundaries always
    coincide with varint starts (each buffer holds complete varints), so
    per-buffer counts fall out of a searchsorted over the start
    positions of the concatenated stream."""
    concat = b"".join(bufs)
    vals, start_idx = _packed_varints_np_offsets(concat)
    lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
    byte_offs = np.zeros(len(bufs) + 1, dtype=np.int64)
    np.cumsum(lens, out=byte_offs[1:])
    counts = np.diff(np.searchsorted(start_idx, byte_offs))
    return vals, counts


def _zigzag_np(v: np.ndarray) -> np.ndarray:
    return (v >> np.uint64(1)).astype(np.int64) ^ -(
        (v & np.uint64(1)).astype(np.int64)
    )


def _segmented_delta(s: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Per-segment prefix sum of a flat value array: one global cumsum,
    then subtract each segment's incoming base (the PBF delta encoding,
    restarted per way/relation)."""
    if s.size == 0:
        return s
    g = np.cumsum(s)
    first = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=first[1:])
    nz = counts > 0
    base = np.zeros(len(counts), dtype=np.int64)
    base[nz] = g[first[nz]] - s[first[nz]]
    return g - np.repeat(base, counts)


def _pos_in_segment(counts: np.ndarray) -> np.ndarray:
    first = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=first[1:])
    return np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(first, counts)


def _emit_way_rel_arrow(
    way_rel: list,
    emit,
    strings,
    vocab,
    date_granularity: int,
) -> None:
    """Way/Relation messages -> column arrays, with NO per-entity field
    decode: the Python walk only SLICES each message's packed-field
    buffers (refs, memids, roles, types, keys, vals, Info), and every
    field kind then decodes in ONE concatenated vectorized pass —
    segmented zigzag/prefix-sum for the delta fields, `take` gathers for
    the strings.  Even Info decodes vectorized: it contains only varint
    fields, so the concatenated Info stream is a strict key,value
    alternation whose fields scatter into per-entity arrays (duplicate
    fields last-win, like the scalar decoder).  Structural surprises
    (odd Info pair counts, non-varint wire bits in an Info key, field
    numbers outside Info's spec range 1..6, mismatched keys/vals
    lengths, duplicate tag keys) raise _ArrowFallback -> the whole
    block re-decodes on the dict path, so output stays identical by
    construction.  Two dict-path asymmetries remain possible only for
    NON-spec inputs and are accepted: a fixed64 field smuggled inside
    Info can misparse the alternation only if every resynthesized key
    passes BOTH the wire-bit check and the 1..6 field-number bound
    (r7 advice narrowed this from wire-bit alone), and values >= 2^63
    wrap where the dict path would error."""
    import pyarrow as pa

    n = len(way_rel)
    eids: list["int | None"] = []
    type_codes: list[int] = []
    info_bufs: list[bytes] = []
    key_bufs: list[bytes] = []
    val_bufs: list[bytes] = []
    refs_bufs: list[bytes] = []
    roles_bufs: list[bytes] = []
    memids_bufs: list[bytes] = []
    types_bufs: list[bytes] = []

    for fieldno, gbuf in way_rel:
        eid = None
        info_b = key_b = val_b = refs_b = roles_b = memids_b = types_b = b""
        pos2, n2 = 0, len(gbuf)
        while pos2 < n2:
            key2 = gbuf[pos2]
            pos2 += 1
            if key2 >= 0x80:
                key2, pos2 = _read_varint(gbuf, pos2 - 1)
            f2, wire2 = key2 >> 3, key2 & 7
            if wire2 == 0:
                v2, pos2 = _read_varint(gbuf, pos2)
                if f2 == 1:
                    eid = v2
            elif wire2 == 2:
                ln2 = gbuf[pos2]
                pos2 += 1
                if ln2 >= 0x80:
                    ln2, pos2 = _read_varint(gbuf, pos2 - 1)
                v2 = gbuf[pos2 : pos2 + ln2]
                pos2 += ln2
                if f2 == 2:
                    key_b = v2
                elif f2 == 3:
                    val_b = v2
                elif f2 == 4:
                    info_b = v2
                elif f2 == 8 and fieldno == 3:
                    refs_b = v2
                elif f2 == 8:
                    roles_b = v2
                elif f2 == 9:
                    memids_b = v2
                elif f2 == 10:
                    types_b = v2
            elif wire2 == 1:
                pos2 += 8
            elif wire2 == 5:
                pos2 += 4
            else:
                raise ValueError(f"unsupported wire type {wire2}")
        eids.append(eid)
        type_codes.append(1 if fieldno == 3 else 2)
        info_bufs.append(info_b)
        key_bufs.append(key_b)
        val_bufs.append(val_b)
        refs_bufs.append(refs_b)
        roles_bufs.append(roles_b)
        memids_bufs.append(memids_b)
        types_bufs.append(types_b)

    # --- tags: one decode per side, dup/mismatch -> dict path ---------
    kvals, kcounts = _concat_varints(key_bufs)
    vvals, vcounts = _concat_varints(val_bufs)
    if (kcounts != vcounts).any():
        raise _ArrowFallback  # dict path zip-truncates; keep identical
    if kvals.size:
        seg = np.repeat(np.arange(n, dtype=np.int64), kcounts)
        order = np.lexsort((kvals, seg))
        sk, ss = kvals[order], seg[order]
        if ((sk[1:] == sk[:-1]) & (ss[1:] == ss[:-1])).any():
            raise _ArrowFallback  # duplicate tag key: dict path dedupes

    # --- Info: strict key,value varint alternation, scattered ---------
    ivals, icounts = _concat_varints(info_bufs)
    if (icounts % 2).any():
        raise _ArrowFallback
    ik = ivals[0::2]
    iv = ivals[1::2].astype(np.int64)
    if ik.size and (ik & np.uint64(7)).any():
        raise _ArrowFallback  # non-varint wire type inside Info
    ifield = (ik >> np.uint64(3)).astype(np.int64)
    # Field numbers outside Info's spec range (version=1 .. visible=6)
    # also force the dict path (r7 advice): a fixed64/length-delimited
    # payload smuggled into Info whose bytes coincidentally pass the
    # wire-bit check above almost never lands every resynthesized key in
    # 1..6 too, so this cheap bound turns the silent-wrong-metadata
    # failure mode into a correct fallback for all but adversarial
    # inputs.  Spec-valid files never hit it; an unknown Info extension
    # field decodes identically (ignored) on the dict path.
    if ik.size and ((ifield < 1) | (ifield > 6)).any():
        raise _ArrowFallback  # unknown Info field number: desync or extension
    iseg = np.repeat(np.arange(n, dtype=np.int64), icounts // 2)
    version = np.full(n, -1, dtype=np.int64)
    ts_vals = np.zeros(n, dtype=np.int64)
    ts_present = np.zeros(n, dtype=bool)
    cs_vals = np.zeros(n, dtype=np.int64)
    cs_present = np.zeros(n, dtype=bool)
    uid_vals = np.zeros(n, dtype=np.int64)
    uid_present = np.zeros(n, dtype=bool)
    sid_vals = np.zeros(n, dtype=np.int64)
    sid_present = np.zeros(n, dtype=bool)
    vis = np.ones(n, dtype=bool)
    for fno, out_vals, out_present in (
        (2, ts_vals, ts_present),
        (3, cs_vals, cs_present),
        (4, uid_vals, uid_present),
        (5, sid_vals, sid_present),
    ):
        m = ifield == fno
        out_vals[iseg[m]] = iv[m]
        out_present[iseg[m]] = True
    m = ifield == 1
    version[iseg[m]] = iv[m]
    m = ifield == 6
    vis[iseg[m]] = iv[m] != 0

    # --- ways' nds / relations' members: segmented vector decode ------
    rvals, rcounts = _concat_varints(refs_bufs)
    refs_flat = _segmented_delta(_zigzag_np(rvals), rcounts)
    mvals, mcounts = _concat_varints(memids_bufs)
    mem_flat = _segmented_delta(_zigzag_np(mvals), mcounts)
    tvals, tcounts = _concat_varints(types_bufs)
    rolevals, rolecounts = _concat_varints(roles_bufs)
    if (tcounts < mcounts).any() or (rolecounts < mcounts).any():
        # scalar path indexes types[i]/roles[i] per memid
        raise IndexError("list index out of range")
    # truncate trailing types/roles beyond the memid count (the scalar
    # loop never reads them)
    kept_t = tvals[_pos_in_segment(tcounts) < np.repeat(mcounts, tcounts)].astype(
        np.int64
    )
    kept_r = rolevals[
        _pos_in_segment(rolecounts) < np.repeat(mcounts, rolecounts)
    ].astype(np.int64)
    bad = kept_t >= len(_MEMBER_TYPE_NAMES)
    if bad.any():
        raise ValueError(f"unknown member type {int(kept_t[np.argmax(bad)])}")

    def _offsets(counts: np.ndarray):
        o = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=o[1:])
        return pa.array(o.astype(np.int32))

    emit("id", pa.array(eids, type=pa.int64()))
    emit(
        "type",
        _take_vocab_codes(vocab, np.asarray(type_codes, dtype=np.int32)),
    )
    emit(
        "tags",
        pa.MapArray.from_arrays(
            _offsets(kcounts),
            _take(strings, kvals.astype(np.int64)),
            _take(strings, vvals.astype(np.int64)),
        ),
    )
    emit("lat", pa.nulls(n, pa.decimal128(38, 9)))
    emit("lon", pa.nulls(n, pa.decimal128(38, 9)))
    emit("nds", pa.ListArray.from_arrays(_offsets(rcounts), pa.array(refs_flat)))
    member_struct = pa.StructArray.from_arrays(
        [
            _take_vocab_codes(vocab, kept_t.astype(np.int32)),
            pa.array(mem_flat),
            _take(strings, kept_r),
        ],
        names=["type", "ref", "role"],
    )
    emit("members", pa.ListArray.from_arrays(_offsets(mcounts), member_struct))
    emit("changeset", pa.array(cs_vals, mask=~cs_present))
    emit(
        "timestamp_ms",
        pa.array(ts_vals * date_granularity, mask=~ts_present),
    )
    emit("uid", pa.array(uid_vals, mask=~uid_present))
    if sid_present.any():
        # masked slots carry index 1, in bounds whenever any sid is
        # (take validates the real sids exactly like strings[sid] would)
        emit("user", _take_masked(strings, sid_vals, sid_present))
    else:
        emit("user", pa.nulls(n, pa.string()))
    emit("version", pa.array(version))
    emit("visible", pa.array(vis))


def _take_masked(strings, sid_vals: np.ndarray, present: np.ndarray):
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.take(strings, pa.array(2 * sid_vals + 1, mask=~present))


def _take_vocab_codes(vocab, codes: np.ndarray):
    import pyarrow as pa
    import pyarrow.compute as pc

    return pc.take(vocab, pa.array(codes))


def decode_primitive_block_columns(data: bytes) -> dict[str, list]:
    """PrimitiveBlock -> column lists (ENTITY_COLUMNS order).

    Columnar by design: DenseNodes fields decode as whole arrays
    (vectorized varints + one cumsum per delta field) and extend the
    output columns in bulk — no per-row dict is ever built, and the
    caller hands the lists straight to pyarrow (RecordBatch.from_pydict),
    so the only per-entity Python work left is tag-dict assembly."""
    strings: list[str] = []
    groups: list[bytes] = []
    granularity, date_granularity = 100, 1000
    lat_offset = lon_offset = 0
    for fieldno, _, val in _fields(data):
        if fieldno == 1:
            strings = _decode_string_table(bytes(val))
        elif fieldno == 2:
            groups.append(bytes(val))
        elif fieldno == 17:
            granularity = val
        elif fieldno == 18:
            date_granularity = val
        elif fieldno == 19:  # int64 (two's-complement varint, not zigzag)
            lat_offset = val - (1 << 64) if val >= (1 << 63) else val
        elif fieldno == 20:
            lon_offset = val - (1 << 64) if val >= (1 << 63) else val

    def coord(off: int, raw: "int | None") -> "int | None":
        return None if raw is None else off + granularity * raw

    def ts_ms(t: int | None) -> int | None:
        return None if t is None else t * date_granularity

    cols: dict[str, list] = {k: [] for k in ENTITY_COLUMNS}
    c_id = cols["id"]
    c_type = cols["type"]
    c_tags = cols["tags"]
    c_lat = cols["lat"]
    c_lon = cols["lon"]
    c_nds = cols["nds"]
    c_members = cols["members"]
    c_changeset = cols["changeset"]
    c_ts = cols["timestamp_ms"]
    c_uid = cols["uid"]
    c_user = cols["user"]
    c_version = cols["version"]
    c_visible = cols["visible"]

    for group in groups:
        # Inlined PrimitiveGroup walk (every field is wire 2: repeated
        # Node/DenseNodes/Way/Relation messages) — one generator resume
        # per entity adds up at ~10k ways/relations per block-set.
        posg, ng = 0, len(group)
        while posg < ng:
            keyg = group[posg]
            posg += 1
            if keyg >= 0x80:
                keyg, posg = _read_varint(group, posg - 1)
            fieldno, wireg = keyg >> 3, keyg & 7
            if wireg != 2:
                if wireg == 0:
                    _, posg = _read_varint(group, posg)
                elif wireg == 1:
                    posg += 8
                elif wireg == 5:
                    posg += 4
                else:
                    raise ValueError(f"unsupported wire type {wireg}")
                continue
            lng = group[posg]
            posg += 1
            if lng >= 0x80:
                lng, posg = _read_varint(group, posg - 1)
            gbuf = group[posg : posg + lng]
            posg += lng
            if fieldno == 1:  # plain Node
                keys: list[int] = []
                vals: list[int] = []
                info = _INFO_DEFAULT
                nid = lat = lon = None
                for f2, _, v2 in _fields(gbuf):
                    if f2 == 1:
                        nid = _zigzag_decode(v2)
                    elif f2 == 2:
                        keys = _packed_varints(bytes(v2))
                    elif f2 == 3:
                        vals = _packed_varints(bytes(v2))
                    elif f2 == 4:
                        info = _decode_info(bytes(v2), strings)
                    elif f2 == 8:
                        lat = _zigzag_decode(v2)
                    elif f2 == 9:
                        lon = _zigzag_decode(v2)
                c_id.append(nid)
                c_type.append("node")
                c_tags.append(
                    {strings[k]: strings[v] for k, v in zip(keys, vals)}
                )
                c_lat.append(coord(lat_offset, lat))
                c_lon.append(coord(lon_offset, lon))
                c_nds.append([])
                c_members.append([])
                c_changeset.append(info[2])
                c_ts.append(ts_ms(info[1]))
                c_uid.append(info[3])
                c_user.append(info[4])
                c_version.append(info[0])
                c_visible.append(info[5])
            elif fieldno == 5:  # ChangeSet entity (the OTHER reference
                # TODO, OsmPbf2Orc.java:193: "TODO changeset, in which
                # case lat/lon need to be zeroed out").  The osmformat
                # ChangeSet message carries only {1: id}; per the
                # reference's stated intent the coords are ZEROED (not
                # NULL), collections empty, Info defaults (no Info field
                # exists on the message).
                cs_id = None
                for f2, w2, v2 in _fields(gbuf):
                    # id only from a wire-0 varint, like the way/relation
                    # walk — a length-delimited field 1 must not leak
                    # bytes into the int64 id column
                    if f2 == 1 and w2 == 0:
                        cs_id = v2
                c_id.append(cs_id)
                c_type.append("changeset")
                c_tags.append({})
                c_lat.append(0)  # zeroed nanodegrees -> decimal 0E-7
                c_lon.append(0)
                c_nds.append([])
                c_members.append([])
                c_changeset.append(None)  # Info defaults, spelled out:
                c_ts.append(None)  # the message has no Info field
                c_uid.append(None)
                c_user.append(None)
                c_version.append(-1)
                c_visible.append(True)
            elif fieldno == 2:  # DenseNodes
                # Every packed field decodes vectorized; the delta encoding
                # becomes one cumsum per array instead of per-row accumulators.
                ids: list[int] = []
                lats: list[int] = []
                lons: list[int] = []
                keys_vals: list[int] = []
                versions: list[int] | None = None
                timestamps: list[int] | None = None
                changesets: list[int] | None = None
                uids: list[int] | None = None
                user_sids: list[int] | None = None
                visibles: list[int] | None = None
                for f2, _, v2 in _fields(gbuf):
                    if f2 == 1:
                        ids = _packed_svarints_list(bytes(v2), delta=True)
                    elif f2 == 5:
                        for f3, _, v3 in _fields(bytes(v2)):
                            if f3 == 1:
                                versions = _packed_varints_list(bytes(v3))
                            elif f3 == 2:
                                timestamps = _packed_svarints_list(
                                    bytes(v3), delta=True
                                )
                            elif f3 == 3:
                                changesets = _packed_svarints_list(
                                    bytes(v3), delta=True
                                )
                            elif f3 == 4:
                                uids = _packed_svarints_list(bytes(v3), delta=True)
                            elif f3 == 5:
                                user_sids = _packed_svarints_list(
                                    bytes(v3), delta=True
                                )
                            elif f3 == 6:
                                visibles = _packed_varints_list(bytes(v3))
                    elif f2 == 8:
                        lats = _packed_svarints_list(bytes(v2), delta=True)
                    elif f2 == 9:
                        lons = _packed_svarints_list(bytes(v2), delta=True)
                    elif f2 == 10:
                        keys_vals = _packed_varints_list(bytes(v2))
                n = len(ids)
                c_id.extend(ids)
                c_type.extend(["node"] * n)
                # Tag assembly: split keys_vals on its 0 terminators and
                # build a dict per TAGGED node only -- untagged nodes (the
                # planet-scale majority) share one read-only empty dict,
                # mirroring the shared-empty-list trick below.  The split
                # is valid iff no entry references string 0 (the format
                # reserves it as the delimiter); exactly n zeros proves
                # that, since every node contributes one terminator.  A
                # non-compliant file (zero used as a value sid) shows >n
                # zeros and takes the sequential key-position-aware loop.
                if not keys_vals or not any(keys_vals):
                    c_tags.extend([_EMPTY_TAGS] * n)
                else:
                    append_tags = c_tags.append
                    zpos = np.flatnonzero(
                        np.asarray(keys_vals, dtype=np.int64) == 0
                    ).tolist()
                    if len(zpos) == n:
                        prev = 0
                        for z in zpos:
                            if z == prev:
                                append_tags(_EMPTY_TAGS)
                            else:
                                seg = keys_vals[prev:z]
                                append_tags(
                                    {
                                        strings[k]: strings[v]
                                        for k, v in zip(seg[0::2], seg[1::2])
                                    }
                                )
                            prev = z + 1
                    else:
                        kv_pos = 0
                        kv_len = len(keys_vals)
                        for _ in range(n):
                            tags = {}
                            while kv_pos < kv_len and keys_vals[kv_pos] != 0:
                                k = keys_vals[kv_pos]
                                v = keys_vals[kv_pos + 1]
                                tags[strings[k]] = strings[v]
                                kv_pos += 2
                            kv_pos += 1  # skip 0 terminator
                            append_tags(tags)
                c_lat.extend(_coord_nanos(lat_offset, granularity, lats))
                c_lon.extend(_coord_nanos(lon_offset, granularity, lons))
                # read-only downstream (Arrow conversion / row adapter), so
                # sharing one empty list across rows is safe and free
                c_nds.extend([[]] * n)
                c_members.extend([[]] * n)
                c_changeset.extend(changesets if changesets else [None] * n)
                c_ts.extend(
                    [t * date_granularity for t in timestamps]
                    if timestamps
                    else [None] * n
                )
                c_uid.extend(uids if uids else [None] * n)
                c_user.extend(
                    [strings[s] for s in user_sids]
                    if user_sids
                    else [None] * n
                )
                c_version.extend(versions if versions else [-1] * n)
                c_visible.extend(
                    [bool(v) for v in visibles] if visibles else [True] * n
                )
            elif fieldno in (3, 4):  # Way | Relation
                eid = None
                keys = []
                vals = []
                info = _INFO_DEFAULT
                refs: list[int] = []
                roles: list[int] = []
                memids: list[int] = []
                types: list[int] = []
                # Inlined field walk (the _fields generator costs one
                # resume per field across ~10k way/relation messages per
                # block-set — a third of non-dense decode time). Way and
                # Relation define only varint ids (wire 0) and packed/
                # length-delimited payloads (wire 2).
                pos2, n2 = 0, len(gbuf)
                while pos2 < n2:
                    # key and length bytes are single-byte in practice
                    # (fields <= 10, payloads mostly < 128 bytes)
                    key2 = gbuf[pos2]
                    pos2 += 1
                    if key2 >= 0x80:
                        key2, pos2 = _read_varint(gbuf, pos2 - 1)
                    f2, wire2 = key2 >> 3, key2 & 7
                    if wire2 == 0:
                        v2, pos2 = _read_varint(gbuf, pos2)
                        if f2 == 1:
                            eid = v2
                    elif wire2 == 2:
                        ln2 = gbuf[pos2]
                        pos2 += 1
                        if ln2 >= 0x80:
                            ln2, pos2 = _read_varint(gbuf, pos2 - 1)
                        v2 = gbuf[pos2 : pos2 + ln2]
                        pos2 += ln2
                        if f2 == 2:
                            keys = _packed_varints_list(v2)
                        elif f2 == 3:
                            vals = _packed_varints_list(v2)
                        elif f2 == 4:
                            info = _decode_info(v2, strings)
                        elif f2 == 8 and fieldno == 3:
                            refs = _packed_svarints_list(v2, delta=True)
                        elif f2 == 8:
                            roles = _packed_varints_list(v2)
                        elif f2 == 9:
                            memids = _packed_svarints_list(v2, delta=True)
                        elif f2 == 10:
                            types = _packed_varints_list(v2)
                    elif wire2 == 1:
                        pos2 += 8
                    elif wire2 == 5:
                        pos2 += 4
                    else:
                        raise ValueError(f"unsupported wire type {wire2}")
                c_id.append(eid)
                c_tags.append(
                    {strings[k]: strings[v] for k, v in zip(keys, vals)}
                )
                c_lat.append(None)  # B3: NULL coords for ways/relations
                c_lon.append(None)
                c_changeset.append(info[2])
                t = info[1]
                c_ts.append(None if t is None else t * date_granularity)
                c_uid.append(info[3])
                c_user.append(info[4])
                c_version.append(info[0])
                c_visible.append(info[5])
                if fieldno == 3:
                    # refs decode already prefix-summed (delta=True)
                    c_type.append("way")
                    c_nds.append(refs)
                    c_members.append([])
                else:
                    # member type enum 0/1/2 -> lowercase string
                    # (reference lowercases osmosis enum, OsmPbf2Orc.java:253-269;
                    # unknown member type is an error, :268)
                    type_names = {0: "node", 1: "way", 2: "relation"}
                    members = []
                    for i, mid in enumerate(memids):
                        if types[i] not in type_names:
                            raise ValueError(f"unknown member type {types[i]}")
                        members.append(
                            (type_names[types[i]], mid, strings[roles[i]])
                        )
                    c_type.append("relation")
                    c_nds.append([])
                    c_members.append(members)
    return cols


# ---------------------------------------------------------------------------
# encode (fixture writer)
# ---------------------------------------------------------------------------


@dataclass
class PbfWriter:
    """Minimal PBF writer for building test fixtures.

    Entities are dicts: {'id','type','tags','lat','lon' (degrees float or
    str),'nds','members','changeset','timestamp_ms','uid','user','version',
    'visible'}. Nodes are written as DenseNodes (exercising delta + string
    table decode paths); ways/relations as their messages with Info.

    Encoding variants (r12 verdict #3: no real extract is reachable in
    this offline container, so the writer emits the encoding SPACE real
    producers use and the property suite certifies decode across it):

    - ``compression``: 'zlib' (osmosis/osmium default) or 'raw'
      (uncompressed Blob field 1 — legal and seen in the wild).
    - ``granularity`` / ``lat_offset`` / ``lon_offset``: non-default
      coordinate grids (PrimitiveBlock fields 17/19/20; coordinate =
      offset + granularity*raw).  Coordinates snap to the grid by
      floor division — byte-exact round-trip requires grid-aligned
      inputs, which the variant tests generate.
    - ``date_granularity``: timestamp unit (field 18).
    - ``plain_nodes``: plain Node messages (PrimitiveGroup field 1)
      instead of DenseNodes — the route old/unusual producers emit and
      the Arrow fast path deliberately falls back on."""

    bounds: tuple[float, float, float, float] | None = None  # left,bottom,right,top
    compression: str = "zlib"
    granularity: int = 100
    date_granularity: int = 1000
    lat_offset: int = 0  # nanodegrees
    lon_offset: int = 0
    plain_nodes: bool = False
    _entities: list[dict] = field(default_factory=list)

    def add(self, **entity) -> None:
        self._entities.append(entity)

    # -- string table ------------------------------------------------------
    def _build_strings(self) -> tuple[list[str], dict[str, int]]:
        # Index 0 is the DenseNodes keys_vals delimiter (format spec:
        # encoders must never reference entry 0).  Leaving "" out of the
        # intern index means an actual empty string (tag value, role)
        # interns as a SECOND "" entry at a non-zero index, keeping the
        # kv stream unambiguous for any compliant reader.
        table = [""]  # index 0 reserved, never referenced
        index: dict[str, int] = {}

        def intern(s: str) -> int:
            if s not in index:
                index[s] = len(table)
                table.append(s)
            return index[s]

        for e in self._entities:
            for k, v in (e.get("tags") or {}).items():
                intern(k)
                intern(v)
            if e.get("user") is not None:
                intern(e["user"])
            for m in e.get("members") or []:
                intern(m[2] if isinstance(m, tuple) else m["role"])
        return table, index

    def _encode_info(self, e: dict, index: dict[str, int]) -> bytes:
        out = bytearray()
        _emit_varint(out, 1, e.get("version", 1))
        if e.get("timestamp_ms") is not None:
            _emit_varint(out, 2, e["timestamp_ms"] // self.date_granularity)
        if e.get("changeset") is not None:
            _emit_varint(out, 3, e["changeset"])
        if e.get("uid") is not None:
            _emit_varint(out, 4, e["uid"])
        if e.get("user") is not None:
            _emit_varint(out, 5, index[e["user"]])
        _emit_varint(out, 6, 1 if e.get("visible", True) else 0)
        return bytes(out)

    @staticmethod
    def _deg_to_nano(v) -> int:
        # exact: accept str ('12.3456789') or float; route via str to
        # avoid binary-fraction drift in fixtures
        s = str(v)
        neg = s.startswith("-")
        if neg:
            s = s[1:]
        whole, _, frac = s.partition(".")
        nano = int(whole) * NANO + int((frac + "000000000")[:9] or 0)
        return -nano if neg else nano

    def _encode_dense(self, nodes: list[dict], index: dict[str, int]) -> bytes:
        ids, lats, lons, kvs = [], [], [], []
        versions, tss, css, uids, sids, viss = [], [], [], [], [], []
        prev = {"id": 0, "lat": 0, "lon": 0, "ts": 0, "cs": 0, "uid": 0, "sid": 0}
        for e in nodes:
            ids.append(e["id"] - prev["id"])
            prev["id"] = e["id"]
            lat = (self._deg_to_nano(e["lat"]) - self.lat_offset) // self.granularity
            lon = (self._deg_to_nano(e["lon"]) - self.lon_offset) // self.granularity
            lats.append(lat - prev["lat"])
            prev["lat"] = lat
            lons.append(lon - prev["lon"])
            prev["lon"] = lon
            for k, v in (e.get("tags") or {}).items():
                kvs.extend([index[k], index[v]])
            kvs.append(0)
            versions.append(e.get("version", 1))
            ts = (e.get("timestamp_ms") or 0) // self.date_granularity
            tss.append(ts - prev["ts"])
            prev["ts"] = ts
            cs = e.get("changeset") or 0
            css.append(cs - prev["cs"])
            prev["cs"] = cs
            uid = e.get("uid") or 0
            uids.append(uid - prev["uid"])
            prev["uid"] = uid
            sid = index.get(e.get("user") or "", 0)
            sids.append(sid - prev["sid"])
            prev["sid"] = sid
            viss.append(1 if e.get("visible", True) else 0)
        dinfo = bytearray()
        _emit_packed(dinfo, 1, versions)
        _emit_packed(dinfo, 2, tss, zigzag=True)
        _emit_packed(dinfo, 3, css, zigzag=True)
        _emit_packed(dinfo, 4, uids, zigzag=True)
        _emit_packed(dinfo, 5, sids, zigzag=True)
        _emit_packed(dinfo, 6, viss)
        dense = bytearray()
        _emit_packed(dense, 1, ids, zigzag=True)
        _emit_bytes(dense, 5, bytes(dinfo))
        _emit_packed(dense, 8, lats, zigzag=True)
        _emit_packed(dense, 9, lons, zigzag=True)
        _emit_packed(dense, 10, kvs)
        group = bytearray()
        _emit_bytes(group, 2, bytes(dense))
        return bytes(group)

    def _encode_plain_nodes(self, nodes: list[dict], index: dict[str, int]) -> bytes:
        """One PrimitiveGroup of plain Node messages (field 1, repeated):
        absolute sint64 id/lat/lon, packed key/val indices, full Info —
        the non-dense route the Arrow fast path falls back on."""
        group = bytearray()
        for e in nodes:
            out = bytearray()
            _emit_varint(out, 1, _zigzag_encode(e["id"]))
            tags = e.get("tags") or {}
            _emit_packed(out, 2, [index[k] for k in tags])
            _emit_packed(out, 3, [index[v] for v in tags.values()])
            _emit_bytes(out, 4, self._encode_info(e, index))
            lat = (self._deg_to_nano(e["lat"]) - self.lat_offset) // self.granularity
            lon = (self._deg_to_nano(e["lon"]) - self.lon_offset) // self.granularity
            _emit_varint(out, 8, _zigzag_encode(lat))
            _emit_varint(out, 9, _zigzag_encode(lon))
            _emit_bytes(group, 1, bytes(out))
        return bytes(group)

    def _encode_way(self, e: dict, index: dict[str, int]) -> bytes:
        out = bytearray()
        _emit_varint(out, 1, e["id"])
        tags = e.get("tags") or {}
        _emit_packed(out, 2, [index[k] for k in tags])
        _emit_packed(out, 3, [index[v] for v in tags.values()])
        _emit_bytes(out, 4, self._encode_info(e, index))
        deltas = []
        prev = 0
        for r in e.get("nds") or []:
            deltas.append(r - prev)
            prev = r
        _emit_packed(out, 8, deltas, zigzag=True)
        group = bytearray()
        _emit_bytes(group, 3, bytes(out))
        return bytes(group)

    def _encode_relation(self, e: dict, index: dict[str, int]) -> bytes:
        type_ids = {"node": 0, "way": 1, "relation": 2}
        out = bytearray()
        _emit_varint(out, 1, e["id"])
        tags = e.get("tags") or {}
        _emit_packed(out, 2, [index[k] for k in tags])
        _emit_packed(out, 3, [index[v] for v in tags.values()])
        _emit_bytes(out, 4, self._encode_info(e, index))
        members = [
            m if isinstance(m, tuple) else (m["type"], m["ref"], m["role"])
            for m in e.get("members") or []
        ]
        _emit_packed(out, 8, [index[m[2]] for m in members])
        deltas = []
        prev = 0
        for m in members:
            deltas.append(m[1] - prev)
            prev = m[1]
        _emit_packed(out, 9, deltas, zigzag=True)
        _emit_packed(out, 10, [type_ids[m[0]] for m in members])
        group = bytearray()
        _emit_bytes(group, 4, bytes(out))
        return bytes(group)

    def _encode_changeset_entity(self, e: dict) -> bytes:
        """One PrimitiveGroup of a ChangeSet entity (group field 5) —
        the osmformat message carries only {1: id}."""
        out = bytearray()
        _emit_varint(out, 1, e["id"])
        group = bytearray()
        _emit_bytes(group, 5, bytes(out))
        return bytes(group)

    def _blob(self, kind: str, payload: bytes, out: bytearray) -> None:
        blob = bytearray()
        if self.compression == "raw":
            _emit_bytes(blob, 1, payload)  # Blob.raw — legal, uncompressed
        elif self.compression == "zlib":
            _emit_varint(blob, 2, len(payload))
            _emit_bytes(blob, 3, zlib.compress(payload))
        else:
            raise ValueError(f"unsupported compression: {self.compression!r}")
        header = bytearray()
        _emit_bytes(header, 1, kind.encode())
        _emit_varint(header, 3, len(blob))
        out.extend(struct.pack(">i", len(header)))
        out.extend(header)
        out.extend(blob)

    def tobytes(self, nodes_per_block: int | None = None) -> bytes:
        out = bytearray()
        # header blob
        hb = bytearray()
        if self.bounds is not None:
            left, bottom, right, top = self.bounds
            bbox = bytearray()
            _emit_varint(bbox, 1, _zigzag_encode(self._deg_to_nano(left)))
            _emit_varint(bbox, 2, _zigzag_encode(self._deg_to_nano(right)))
            _emit_varint(bbox, 3, _zigzag_encode(self._deg_to_nano(top)))
            _emit_varint(bbox, 4, _zigzag_encode(self._deg_to_nano(bottom)))
            _emit_bytes(hb, 1, bytes(bbox))
        _emit_bytes(hb, 4, b"OsmSchema-V0.6")
        if not self.plain_nodes:  # required feature only when actually used
            _emit_bytes(hb, 4, b"DenseNodes")
        self._blob("OSMHeader", bytes(hb), out)

        strings, index = self._build_strings()

        def primitive_block(groups: list[bytes]) -> bytes:
            st = bytearray()
            for s in strings:
                _emit_bytes(st, 1, s.encode("utf-8"))
            pb = bytearray()
            _emit_bytes(pb, 1, bytes(st))
            for g in groups:
                _emit_bytes(pb, 2, g)
            # non-default grids are emitted explicitly (defaults omitted,
            # like real producers)
            if self.granularity != 100:
                _emit_varint(pb, 17, self.granularity)
            if self.date_granularity != 1000:
                _emit_varint(pb, 18, self.date_granularity)
            if self.lat_offset:
                _emit_varint(pb, 19, self.lat_offset)
            if self.lon_offset:
                _emit_varint(pb, 20, self.lon_offset)
            return bytes(pb)

        nodes = [e for e in self._entities if e["type"] == "node"]
        ways = [e for e in self._entities if e["type"] == "way"]
        rels = [e for e in self._entities if e["type"] == "relation"]
        chunk = nodes_per_block or len(nodes) or 1
        enc_nodes = self._encode_plain_nodes if self.plain_nodes else self._encode_dense
        for i in range(0, len(nodes), chunk):
            batch = nodes[i : i + chunk]
            if batch:
                self._blob("OSMData", primitive_block([enc_nodes(batch, index)]), out)
        changesets = [e for e in self._entities if e["type"] == "changeset"]
        groups = (
            [self._encode_way(w, index) for w in ways]
            + [self._encode_relation(r, index) for r in rels]
            + [self._encode_changeset_entity(c) for c in changesets]
        )
        if groups:
            self._blob("OSMData", primitive_block(groups), out)
        return bytes(out)

    def write(self, path: str, nodes_per_block: int | None = None) -> None:
        with open(path, "wb") as f:
            f.write(self.tobytes(nodes_per_block))
