"""Property-based roundtrips for the PBF codec (SURVEY.md §5.4):
random entities -> encode -> decode == input. Pure codec level (no Spark)
so hypothesis can run hundreds of cases quickly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from osm2orc_spark.sources.pbf_codec import (
    PbfWriter,
    decode_header_block,
    decode_primitive_block,
    read_blob,
    scan_blob_index,
)

tag_text = st.text(
    alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs")),
    min_size=0,
    max_size=30,
)
coord_lat = st.integers(min_value=-90 * 10**7, max_value=90 * 10**7).map(
    lambda v: f"{'-' if v < 0 else ''}{abs(v) // 10**7}.{abs(v) % 10**7:07d}"
)
coord_lon = st.integers(min_value=-180 * 10**7, max_value=180 * 10**7).map(
    lambda v: f"{'-' if v < 0 else ''}{abs(v) // 10**7}.{abs(v) % 10**7:07d}"
)
tags = st.dictionaries(st.text(min_size=1, max_size=10), tag_text, max_size=5)
info = {
    "changeset": st.integers(min_value=0, max_value=2**40),
    "timestamp_ms": st.integers(min_value=0, max_value=2**41).map(lambda v: v - v % 1000),
    "uid": st.integers(min_value=0, max_value=2**31 - 1),
    "user": st.text(min_size=0, max_size=12),
    "version": st.integers(min_value=1, max_value=100),
    "visible": st.booleans(),
}


def nodes_strategy():
    return st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=0, max_value=2**45),
                "lat": coord_lat,
                "lon": coord_lon,
                "tags": tags,
                **info,
            }
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda e: e["id"],
    )


def ways_strategy():
    return st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=0, max_value=2**45),
                "nds": st.lists(st.integers(min_value=0, max_value=2**45), max_size=20),
                "tags": tags,
                **info,
            }
        ),
        max_size=10,
        unique_by=lambda e: e["id"],
    )


def relations_strategy():
    member = st.tuples(
        st.sampled_from(["node", "way", "relation"]),
        st.integers(min_value=0, max_value=2**45),
        st.text(max_size=8),
    )
    return st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=0, max_value=2**45),
                "members": st.lists(member, max_size=8),
                "tags": tags,
                **info,
            }
        ),
        max_size=10,
        unique_by=lambda e: e["id"],
    )


def _decode_all(data: bytes, tmp_path) -> list[dict]:
    p = tmp_path / "t.pbf"
    p.write_bytes(data)
    out = []
    for ref in scan_blob_index(str(p)):
        if ref.kind == "OSMData":
            out.extend(decode_primitive_block(read_blob(ref)))
    return out


@settings(max_examples=60, deadline=None)
@given(nodes=nodes_strategy(), ways=ways_strategy(), rels=relations_strategy())
def test_roundtrip(tmp_path_factory, nodes, ways, rels):
    tmp = tmp_path_factory.mktemp("prop")
    w = PbfWriter()
    for e in nodes:
        w.add(type="node", **e)
    for e in ways:
        w.add(type="way", **e)
    for e in rels:
        w.add(type="relation", **e)
    decoded = _decode_all(w.tobytes(nodes_per_block=7), tmp)

    by_key = {(d["type"], d["id"]): d for d in decoded}
    assert len(decoded) == len(nodes) + len(ways) + len(rels)
    for e in nodes:
        d = by_key[("node", e["id"])]
        # coordinates: writer quantizes to granularity=100 (7 decimals kept)
        assert d["lat"].rstrip("0").rstrip(".") == (
            f"{float(e['lat']):.7f}".rstrip("0").rstrip(".")
        ) or d["lat"].startswith(e["lat"][: e["lat"].index(".") + 8])
        assert d["tags"] == e["tags"]
        assert d["version"] == e["version"]
        assert d["visible"] == e["visible"]
        assert d["timestamp_ms"] == e["timestamp_ms"]
        assert d["changeset"] == e["changeset"]
        assert d["uid"] == e["uid"]
        assert d["user"] == e["user"]
    for e in ways:
        d = by_key[("way", e["id"])]
        assert d["nds"] == e["nds"]  # order-preserving (B9)
        assert d["tags"] == e["tags"]
        assert d["lat"] is None and d["lon"] is None  # B3
    for e in rels:
        d = by_key[("relation", e["id"])]
        assert d["members"] == e["members"]  # ordered, roles exact (B10)


@settings(max_examples=20, deadline=None)
@given(
    left=st.decimals(min_value=-180, max_value=179, places=4),
    bottom=st.decimals(min_value=-90, max_value=89, places=4),
)
def test_bounds_roundtrip(tmp_path_factory, left, bottom):
    tmp = tmp_path_factory.mktemp("bounds")
    bounds = (float(left), float(bottom), float(left) + 1, float(bottom) + 1)
    w = PbfWriter(bounds=bounds)
    w.add(type="node", id=1, lat="1.0", lon="2.0", tags={}, version=1)
    p = tmp / "b.pbf"
    p.write_bytes(w.tobytes())
    hdr = [r for r in scan_blob_index(str(p)) if r.kind == "OSMHeader"][0]
    got = decode_header_block(read_blob(hdr))["bounds"]
    assert all(abs(a - b) < 1e-9 for a, b in zip(got, bounds))


INT64_MIN, INT64_MAX = -(1 << 63), (1 << 63) - 1


@settings(max_examples=200, deadline=None)
@given(vals=st.lists(st.integers(INT64_MIN, INT64_MAX), max_size=200))
def test_packed_svarint_vectorized_roundtrip(vals):
    """The numpy varint decoder must agree with the encoder over the full
    int64 range — including 10-byte varints (negatives), whose top bits
    wrap at 64 in both the scalar and vectorized paths. Lists above ~27
    bytes exercise the numpy branch, short ones the scalar branch."""
    from osm2orc_spark.sources.pbf_codec import (
        _emit_packed,
        _packed_svarints_list,
    )

    out = bytearray()
    _emit_packed(out, 1, vals, zigzag=True)
    # strip the field tag + length header that _emit_packed prepends
    from osm2orc_spark.sources.pbf_codec import _read_varint

    pos = 1  # tag byte (field 1, wire 2)
    _, pos = _read_varint(bytes(out), pos)
    payload = bytes(out[pos:])
    assert _packed_svarints_list(payload) == vals


@settings(max_examples=200, deadline=None)
@given(deltas=st.lists(st.integers(-(1 << 40), 1 << 40), max_size=100))
def test_packed_svarint_delta_matches_prefix_sum(deltas):
    from osm2orc_spark.sources.pbf_codec import (
        _emit_packed,
        _packed_svarints_list,
        _read_varint,
    )

    out = bytearray()
    _emit_packed(out, 1, deltas, zigzag=True)
    pos = 1
    _, pos = _read_varint(bytes(out), pos)
    payload = bytes(out[pos:])
    acc, want = 0, []
    for d in deltas:
        acc += d
        want.append(acc)
    assert _packed_svarints_list(payload, delta=True) == want


def test_empty_string_tag_value_dense_roundtrip(tmp_path):
    """Empty-string tag values must survive DenseNodes keys_vals encoding.

    String-table index 0 is the kv delimiter; the writer must intern a
    real "" at a non-zero index or the stream is ambiguous (this was a
    hypothesis-found bug: tag {'0': ''} decoded as {})."""
    w = PbfWriter()
    w.add(type="node", id=1, tags={"0": ""}, lat="1.0000000", lon="2.0000000",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="")
    w.add(type="node", id=2, tags={}, lat="1.0000000", lon="2.0000000",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    w.add(type="node", id=3, tags={"k": "", "": "v"}, lat="1.0", lon="2.0",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    decoded = _decode_all(w.tobytes(nodes_per_block=7), tmp_path)
    by_id = {d["id"]: d for d in decoded}
    assert by_id[1]["tags"] == {"0": ""}
    assert by_id[1]["user"] == ""
    assert by_id[2]["tags"] == {}
    assert by_id[3]["tags"] == {"k": "", "": "v"}


def test_noncompliant_zero_sid_falls_back(tmp_path):
    """Files that (illegally) reference string 0 inside keys_vals still
    decode via the sequential key-position-aware loop: zeros in value
    position make the terminator count exceed the node count, which
    disables the vectorized split."""

    class SloppyWriter(PbfWriter):
        def _build_strings(self):
            table, index = super()._build_strings()
            # emulate the old non-compliant intern: "" -> index 0
            idx = dict(index)
            idx[""] = 0
            return table, idx

    w = SloppyWriter()
    w.add(type="node", id=1, tags={"a": ""}, lat="1.0", lon="2.0",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    w.add(type="node", id=2, tags={"b": "x"}, lat="1.0", lon="2.0",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    decoded = _decode_all(w.tobytes(nodes_per_block=7), tmp_path)
    by_id = {d["id"]: d for d in decoded}
    assert by_id[1]["tags"] == {"a": ""}
    assert by_id[2]["tags"] == {"b": "x"}


# ---------------------------------------------------------------------------
# Arrow-native decode parity: decode_primitive_block_arrow must produce a
# RecordBatch IDENTICAL to the dict path + columns_to_batch for every
# block — the Spark ingest path runs the arrow decode, the tests and the
# row adapter run the dict path, and this is the bridge that keeps them
# honest (including the fallback routes: non-compliant zero sids, plain
# Node messages, multi-byte string-table lengths).
# ---------------------------------------------------------------------------


def _assert_arrow_parity(data: bytes, tmp_path) -> int:
    from osm2orc_spark.sources.pbf_codec import (
        columns_to_batch,
        decode_primitive_block_arrow,
        decode_primitive_block_columns,
        planet_arrow_schema,
    )

    p = tmp_path / "parity.pbf"
    p.write_bytes(data)
    schema = planet_arrow_schema()
    n_blocks = 0
    for ref in scan_blob_index(str(p)):
        if ref.kind != "OSMData":
            continue
        payload = read_blob(ref)
        fast = decode_primitive_block_arrow(payload, schema)
        cols = decode_primitive_block_columns(payload)
        want = columns_to_batch(cols, schema) if cols["id"] else None
        assert (fast is None) == (want is None)
        if fast is not None:
            assert fast.equals(want)
        n_blocks += 1
    return n_blocks


@settings(max_examples=40, deadline=None)
@given(nodes=nodes_strategy(), ways=ways_strategy(), rels=relations_strategy())
def test_arrow_decode_parity_roundtrip(tmp_path_factory, nodes, ways, rels):
    w = PbfWriter()
    for e in nodes:
        w.add(type="node", **e)
    for e in ways:
        w.add(type="way", **e)
    for e in rels:
        w.add(type="relation", **e)
    tmp = tmp_path_factory.mktemp("arrowparity")
    assert _assert_arrow_parity(w.tobytes(nodes_per_block=7), tmp) >= 1


def test_arrow_decode_parity_tiny_fixture(tmp_path):
    data = open("fixtures/tiny.osm.pbf", "rb").read()
    assert _assert_arrow_parity(data, tmp_path) >= 1


def test_arrow_decode_parity_long_string_fallback(tmp_path):
    """A >=128-byte tag value forces a multi-byte string-table length —
    the arrow fast path's walk cannot parse that table and must fall
    back to the dict path, still producing an identical batch."""
    w = PbfWriter()
    w.add(type="node", id=1, tags={"desc": "x" * 300}, lat="1.0", lon="2.0",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    assert _assert_arrow_parity(w.tobytes(), tmp_path) >= 1


def test_arrow_decode_parity_noncompliant_zero_sid(tmp_path):
    class SloppyWriter(PbfWriter):
        def _build_strings(self):
            table, index = super()._build_strings()
            idx = dict(index)
            idx[""] = 0
            return table, idx

    w = SloppyWriter()
    w.add(type="node", id=1, tags={"a": ""}, lat="1.0", lon="2.0",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    assert _assert_arrow_parity(w.tobytes(), tmp_path) >= 1


def test_planet_arrow_schema_matches_spark():
    """The codec's pyspark-free arrow schema must equal what Spark's
    mapInArrow expects for PLANET_RAW_SCHEMA."""
    from pyspark.sql.pandas.types import to_arrow_schema

    from osm2orc_spark.sources.pbf import PLANET_RAW_SCHEMA
    from osm2orc_spark.sources.pbf_codec import planet_arrow_schema

    assert planet_arrow_schema() == to_arrow_schema(PLANET_RAW_SCHEMA)


@settings(max_examples=60, deadline=None)
@given(
    segs=st.lists(
        st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=12),
        min_size=0,
        max_size=20,
    )
)
def test_concat_varints_and_segmented_delta(segs):
    """The vectorized way-path core (_concat_varints + _zigzag_np +
    _segmented_delta) must equal the scalar per-buffer decode for any
    segment layout, including empty buffers and empty inputs."""
    import numpy as np

    from osm2orc_spark.sources.pbf_codec import (
        _concat_varints,
        _packed_svarints_list,
        _segmented_delta,
        _write_varint,
        _zigzag_decode,
        _zigzag_np,
    )

    def enc(vals):
        out = bytearray()
        for v in vals:
            _write_varint(out, ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1))
        return bytes(out)

    bufs = [enc(s) for s in segs]
    vals, counts = _concat_varints(bufs)
    assert counts.tolist() == [len(s) for s in segs]
    flat = _segmented_delta(_zigzag_np(vals), counts)
    want = []
    for b in bufs:
        want.extend(_packed_svarints_list(b, delta=True))
    assert flat.tolist() == want


def test_arrow_decode_parity_unknown_info_field_falls_back(tmp_path):
    """r7 advice: the arrow path's vectorized Info alternation now bounds
    accepted field numbers to Info's spec range 1..6 — an extension
    field (here varint field 7 on a way's Info) must force the dict-path
    fallback (which ignores unknown fields) instead of risking a silent
    alternation desync, and the batch stays identical."""
    from osm2orc_spark.sources.pbf_codec import PbfWriter, _emit_varint

    class ExtInfoWriter(PbfWriter):
        def _encode_info(self, e, index):
            out = bytearray(super()._encode_info(e, index))
            _emit_varint(out, 7, 12345)  # unknown Info extension field
            return bytes(out)

    w = ExtInfoWriter()
    w.add(type="way", id=1, tags={"highway": "residential"}, nds=[1, 2, 3],
          version=2, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    w.add(type="node", id=1, tags={}, lat="1.0", lon="2.0",
          version=1, visible=True, changeset=5, timestamp_ms=1000, uid=7, user="u")
    assert _assert_arrow_parity(w.tobytes(), tmp_path) >= 1


# ---------------------------------------------------------------------------
# Encoding-variant certification (r12 verdict #3): no real planet extract
# is reachable offline, so the writer now emits the encoding SPACE real
# producers use — raw (uncompressed) blobs, non-default granularity /
# lat_lon offsets / date_granularity, plain (non-dense) Node messages —
# and every variant must decode to the SAME logical rows as the default
# encoding of the same entities, via BOTH decode routes (dict + Arrow
# parity).  This is the strongest offline substitute for replaying a
# real region file: the decoder is pinned across the whole variant
# matrix, not just the one encoding our fixtures happen to produce.
# ---------------------------------------------------------------------------
ENCODING_VARIANTS = [
    {"compression": "raw"},
    {"granularity": 1000},
    {"granularity": 1000, "lat_offset": 500_000_000, "lon_offset": 120_000_000},
    {"date_granularity": 2000},
    {"plain_nodes": True},
    {
        "compression": "raw",
        "granularity": 200,
        "lat_offset": 1_000_000,
        "plain_nodes": True,
        "date_granularity": 4000,
    },
]

# grid-aligned coordinate strategies: every variant above has
# granularity dividing 1000 and offsets that are multiples of it, so
# micro-degree coordinates (x1000 nanodegrees) sit exactly on every grid
coord_lat_grid = st.integers(min_value=-90 * 10**4, max_value=90 * 10**4).map(
    lambda v: f"{'-' if v < 0 else ''}{abs(v) // 10**4}.{abs(v) % 10**4:04d}000"
)
coord_lon_grid = st.integers(min_value=-180 * 10**4, max_value=180 * 10**4).map(
    lambda v: f"{'-' if v < 0 else ''}{abs(v) // 10**4}.{abs(v) % 10**4:04d}000"
)
# timestamps on the coarsest variant grid (4000 ms) so every
# date_granularity above round-trips exactly
info_grid = dict(info)
info_grid["timestamp_ms"] = st.integers(min_value=0, max_value=2**41).map(
    lambda v: v - v % 4000
)


def nodes_grid_strategy():
    return st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=0, max_value=2**45),
                "lat": coord_lat_grid,
                "lon": coord_lon_grid,
                "tags": tags,
                **info_grid,
            }
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda e: e["id"],
    )


def ways_grid_strategy():
    return st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=0, max_value=2**45),
                "nds": st.lists(st.integers(min_value=0, max_value=2**45), max_size=10),
                "tags": tags,
                **info_grid,
            }
        ),
        max_size=6,
        unique_by=lambda e: e["id"],
    )


def relations_grid_strategy():
    member = st.tuples(
        st.sampled_from(["node", "way", "relation"]),
        st.integers(min_value=0, max_value=2**45),
        st.text(max_size=8),
    )
    return st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=0, max_value=2**45),
                "members": st.lists(member, max_size=6),
                "tags": tags,
                **info_grid,
            }
        ),
        max_size=6,
        unique_by=lambda e: e["id"],
    )


@settings(max_examples=25, deadline=None)
@given(
    nodes=nodes_grid_strategy(),
    ways=ways_grid_strategy(),
    rels=relations_grid_strategy(),
)
def test_encoding_variants_decode_identically(tmp_path_factory, nodes, ways, rels):
    tmp = tmp_path_factory.mktemp("variants")

    def rows(writer_kwargs, tag):
        w = PbfWriter(**writer_kwargs)
        for e in nodes:
            w.add(type="node", **e)
        for e in ways:
            w.add(type="way", **e)
        for e in rels:
            w.add(type="relation", **e)
        data = w.tobytes(nodes_per_block=7)
        d = tmp_path_factory.mktemp(tag)
        decoded = _decode_all(data, d)
        # both decode routes agree on every variant
        _assert_arrow_parity(data, d)
        return sorted(
            (
                {k: v for k, v in r.items()}
                for r in decoded
            ),
            key=lambda r: (r["type"], r["id"]),
        )

    base = rows({}, "base")
    for i, variant in enumerate(ENCODING_VARIANTS):
        got = rows(variant, f"v{i}")
        assert got == base, f"variant {variant} decoded differently"


def test_variant_grid_fields_actually_emitted(tmp_path):
    """The non-default grids must be ON THE WIRE, asserted PER FIELD
    (fields 17-20 in the PrimitiveBlock, raw Blob field 1 instead of
    2+3, plain Node group field 1 instead of DenseNodes field 2) — not
    merely 'bytes differ', which any one knob could satisfy while
    another silently stopped being emitted (r13 review)."""
    from osm2orc_spark.sources.pbf_codec import _fields, iter_blobs_from_bytes

    ents = dict(
        type="node", id=5, tags={"a": "b"}, lat="1.2340000", lon="5.0000000",
        version=2, visible=True, changeset=9, timestamp_ms=8000, uid=3, user="u",
    )
    w_def = PbfWriter()
    w_def.add(**ents)
    w_var = PbfWriter(
        compression="raw", granularity=1000, lat_offset=1_000_000,
        lon_offset=2_000_000, date_granularity=2000, plain_nodes=True,
    )
    w_var.add(**ents)
    b_def, b_var = w_def.tobytes(), w_var.tobytes()

    def block_fields(data: bytes) -> tuple[dict, set]:
        """(PrimitiveBlock field -> last varint value, group fieldnos)
        of the first OSMData blob."""
        for kind, payload in iter_blobs_from_bytes(data):
            if kind != "OSMData":
                continue
            scalars, group_fields = {}, set()
            for f, wire, v in _fields(payload):
                if f == 2:  # PrimitiveGroup
                    group_fields |= {f2 for f2, _, _ in _fields(bytes(v))}
                elif wire == 0:
                    scalars[f] = v
            return scalars, group_fields
        raise AssertionError("no OSMData blob")

    d_scalars, d_groups = block_fields(b_def)
    v_scalars, v_groups = block_fields(b_var)
    # defaults omitted on the default encoding
    assert not ({17, 18, 19, 20} & set(d_scalars))
    assert d_groups == {2}  # DenseNodes
    # every knob on the wire for the variant
    assert v_scalars[17] == 1000 and v_scalars[18] == 2000
    assert v_scalars[19] == 1_000_000 and v_scalars[20] == 2_000_000
    assert v_groups == {1}  # plain Node messages
    # raw vs zlib at the Blob level: field 1 (raw) only in the variant,
    # fields 2+3 (raw_size + zlib_data) only in the default
    def blob_body_fields(data: bytes) -> set:
        import struct as _struct

        pos = 0
        out = set()
        while pos < len(data):
            (hlen,) = _struct.unpack(">i", data[pos : pos + 4])
            header = data[pos + 4 : pos + 4 + hlen]
            kind = datasize = None
            for f, _, v in _fields(header):
                if f == 1:
                    kind = bytes(v)
                elif f == 3:
                    datasize = v
            body = data[pos + 4 + hlen : pos + 4 + hlen + datasize]
            if kind == b"OSMData":
                return {f for f, _, _ in _fields(body)}
            pos += 4 + hlen + datasize
        raise AssertionError("no OSMData blob")

    assert blob_body_fields(b_var) == {1}
    assert blob_body_fields(b_def) == {2, 3}
    # and decode equality of the row despite all wire differences
    p1, p2 = tmp_path / "a.pbf", tmp_path / "b.pbf"
    p1.write_bytes(b_def)
    p2.write_bytes(b_var)

    def decode(p):
        out = []
        for ref in scan_blob_index(str(p)):
            if ref.kind == "OSMData":
                out.extend(decode_primitive_block(read_blob(ref)))
        return out

    assert decode(p1) == decode(p2)


# ---------------------------------------------------------------------------
# ChangeSet entities in the entity table (the OTHER half of the reference
# TODO, OsmPbf2Orc.java:193: "TODO changeset, in which case lat/lon need
# to be zeroed out"): PrimitiveGroup field 5 carries ChangeSet{1: id}.
# Decoded row: type='changeset', ZEROED (not NULL) coords per the
# reference's stated intent, empty tags/nds/members, Info defaults.
# ---------------------------------------------------------------------------
@settings(max_examples=40, deadline=None)
@given(
    nodes=nodes_strategy(),
    cs_ids=st.lists(
        st.integers(min_value=0, max_value=2**45), max_size=6, unique=True
    ),
)
def test_changeset_entities_roundtrip(tmp_path_factory, nodes, cs_ids):
    tmp = tmp_path_factory.mktemp("csent")
    w = PbfWriter()
    for e in nodes:
        w.add(type="node", **e)
    for i in cs_ids:
        w.add(type="changeset", id=i)
    data = w.tobytes(nodes_per_block=7)
    decoded = _decode_all(data, tmp)
    got = {d["id"]: d for d in decoded if d["type"] == "changeset"}
    assert set(got) == set(cs_ids)
    for d in got.values():
        assert float(d["lat"]) == 0.0 and float(d["lon"]) == 0.0  # zeroed
        assert d["tags"] == {} and d["nds"] == [] and d["members"] == []
        assert d["visible"] is True
        assert d["uid"] is None and d["user"] is None
    assert len(decoded) == len(nodes) + len(cs_ids)
    # both decode routes agree (Arrow fast path falls back internally)
    _assert_arrow_parity(data, tmp_path_factory.mktemp("csent_parity"))


# ---------------------------------------------------------------------------
# Hostile-input matrix (r13): structural corruption must be a LOUD
# located ValueError, never a silently-empty or silently-partial scan —
# at planet scale a quiet drop of trailing blobs is unrecoverable data
# loss.  Spec hard limits enforced: BlobHeader < 64 KiB, Blob < 32 MiB
# (https://wiki.openstreetmap.org/wiki/PBF_Format).
# ---------------------------------------------------------------------------
def test_corrupt_inputs_raise_loudly(tmp_path):
    import struct
    import zlib as _zlib

    import pytest

    from osm2orc_spark.sources.pbf_codec import iter_blobs_from_bytes, read_blob

    w = PbfWriter()
    for i in range(1, 40):
        w.add(type="node", id=i, lat="1.0", lon="2.0", tags={}, version=1,
              visible=True, timestamp_ms=0, changeset=1, uid=1, user="u")
    data = w.tobytes(nodes_per_block=7)

    def scan_all(blob: bytes):
        p = tmp_path / "case.pbf"
        p.write_bytes(blob)
        refs = list(scan_blob_index(str(p)))
        for r in refs:
            if r.kind == "OSMData":
                decode_primitive_block(read_blob(r))
        return refs

    # intact file and its in-memory twin both scan clean
    n_blobs = len(scan_all(data))
    assert n_blobs >= 3  # header + several data blobs
    assert sum(1 for _ in iter_blobs_from_bytes(data)) == n_blobs

    cases = {
        "truncated mid-blob": data[: len(data) // 2],
        "partial length word": data[:2],
        "trailing garbage": data + b"\x01\x02",
        "not a pbf": b"hello world, definitely not protobuf " * 20,
        "absurd header length": struct.pack(">i", 2**30) + b"\x00" * 100,
        "negative header length": struct.pack(">i", -5) + b"\x00" * 100,
    }
    for name, blob in cases.items():
        with pytest.raises(ValueError, match="truncated|outside|BlobHeader"):
            scan_all(blob)
        with pytest.raises(ValueError, match="truncated|outside|BlobHeader"):
            list(iter_blobs_from_bytes(blob))

    # corrupt zlib payload: loud too (zlib.error from the decompressor)
    flipped = bytearray(data)
    flipped[len(flipped) // 2] ^= 0xFF
    with pytest.raises((ValueError, _zlib.error)):
        scan_all(bytes(flipped))

    # zip bomb: a blob whose zlib stream expands past the spec's 32 MiB
    # uncompressed hard limit is refused, not inflated into task memory;
    # a truncated zlib stream is equally loud (decompressobj, unlike
    # zlib.decompress, does not raise on its own — _bounded_inflate
    # checks stream termination explicitly)
    from osm2orc_spark.sources.pbf_codec import _bounded_inflate

    bomb = _zlib.compress(b"\x00" * (64 * 1024 * 1024))
    assert len(bomb) < 100_000  # the attack: tiny on the wire
    with pytest.raises(ValueError, match="32MiB"):
        _bounded_inflate(bomb)
    with pytest.raises(ValueError, match="32MiB"):
        _bounded_inflate(_zlib.compress(b"y" * 100_000)[:50])

    # a file that shrinks AFTER indexing fails the ranged read, not
    # silently returns fewer entities
    p = tmp_path / "shrink.pbf"
    p.write_bytes(data)
    refs = [r for r in scan_blob_index(str(p)) if r.kind == "OSMData"]
    p.write_bytes(data[: refs[-1].offset + refs[-1].size // 2])
    with pytest.raises(ValueError, match="short read"):
        read_blob(refs[-1])
