"""Property-based round-trip for the changeset XML writer/parser
(SURVEY.md §5.4): random changesets — including XML-hostile user names
and tag k/v (&, <, ", unicode) — render to XML, parse back, and must
match field-for-field. Pure parser level (no Spark) so hypothesis can
run many cases quickly."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from osm2orc_spark.fixtures import changesets_xml
from osm2orc_spark.sources.changeset_xml import parse_changeset_stream

nasty_text = st.text(
    alphabet=st.characters(
        whitelist_categories=("L", "N", "P", "Zs", "S"),
        whitelist_characters='&<>"\'',
    ),
    min_size=1,
    max_size=25,
)
coord = st.integers(min_value=-90 * 10**7, max_value=90 * 10**7).map(
    lambda v: f"{'-' if v < 0 else ''}{abs(v) // 10**7}.{abs(v) % 10**7:07d}"
)
changeset = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=1, max_value=2**40),
        "created_at": st.one_of(st.none(), st.integers(0, 2**31 - 1)),
        "closed_at": st.one_of(st.none(), st.integers(0, 2**31 - 1)),
        "open": st.booleans(),
        "uid": st.one_of(st.none(), st.integers(1, 2**31)),
        "user": st.one_of(st.none(), nasty_text),
        "min_lat": st.one_of(st.none(), coord),
        "min_lon": st.one_of(st.none(), coord),
        "max_lat": st.one_of(st.none(), coord),
        "max_lon": st.one_of(st.none(), coord),
        "num_changes": st.integers(0, 10**6),
        "comments_count": st.integers(0, 10**4),
        "tags": st.dictionaries(nasty_text, nasty_text, max_size=4),
    }
)


@settings(max_examples=200, deadline=None)
@given(st.lists(changeset, min_size=0, max_size=8))
def test_xml_roundtrip(rows):
    xml = changesets_xml(rows)
    parsed = list(parse_changeset_stream("t.xml", xml.encode("utf-8")))
    assert len(parsed) == len(rows)
    for want, got in zip(rows, parsed):
        assert got["id"] == want["id"]
        assert got["open"] == ("true" if want["open"] else "false")
        assert got["uid"] == want["uid"]
        assert got["user"] == want["user"]
        assert got["num_changes"] == want["num_changes"]
        assert got["comments_count"] == want["comments_count"]
        assert got["tags"] == want["tags"]
        for k in ("min_lat", "min_lon", "max_lat", "max_lon"):
            assert got[k] == want[k]
        # timestamps survive as the exact ISO strings the writer rendered
        for k in ("created_at", "closed_at"):
            assert (got[k] is None) == (want[k] is None)
