"""curation_pack_sequences split-and-stitch (r10 scale-killer #8): the
flat spelling sorts rows/PACK_SHARDS per window task — unbounded as the
corpus grows, and an id-stride corpus (doc_id all equal mod 32) pushes
the WHOLE table through ONE task.  The chunked spelling must be
output-identical for every id/NULL pattern.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from osm2orc_spark.operators import curation, switches
from osm2orc_spark.registry import all_queries

REG = all_queries()


@pytest.fixture(autouse=True)
def _clear_probe_cache():
    switches.probe_cache_clear()
    yield
    switches.probe_cache_clear()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# id patterns that stress the chunking: gaps, chunk-boundary adjacency,
# one-shard strides, ids far above PACK_CHUNK_DOCS, and NULL n_tokens.
_doc = st.tuples(
    st.one_of(
        st.integers(min_value=0, max_value=50),
        st.integers(
            min_value=curation.PACK_CHUNK_DOCS - 3,
            max_value=curation.PACK_CHUNK_DOCS + 3,
        ),
        st.integers(min_value=0, max_value=40).map(lambda k: k * 32),
        st.integers(min_value=0, max_value=5).map(
            lambda k: k * curation.PACK_CHUNK_DOCS * 7
        ),
    ),
    st.one_of(st.none(), st.integers(min_value=0, max_value=9)),
)


@given(st.lists(_doc, min_size=0, max_size=30))
@settings(max_examples=12, deadline=None)
def test_pack_chunked_equals_flat(spark, docs):
    uniq = {i: t for i, t in docs}
    rows = [(i, i % curation.PACK_SHARDS, t) for i, t in uniq.items()]
    frame = spark.createDataFrame(
        rows or [(None, None, None)], "doc_id long, shard long, n_tokens long"
    ).filter(F.col("doc_id").isNotNull())
    assert _rows(curation._pack_sequences_chunked(frame)) == _rows(
        curation._pack_sequences_flat(frame)
    )


def test_registered_forced_chunked_equals_flat(spark, sf_smoke, monkeypatch):
    q = REG["curation_pack_sequences"].fn
    flat = _rows(q(spark, sf_smoke))
    monkeypatch.setattr(switches, "HOT_KEY_ROWS", -1)
    switches.probe_cache_clear()
    assert _rows(q(spark, sf_smoke)) == flat
    assert len(flat) > 0


# --- corpus_shuffle_shards two-level rank (r10 scale-killer #9) -----------

# hkeys drawn from a tiny space force ties and chunk-boundary adjacency
# at every shift; doc_ids are unique by construction.
_hdoc = st.integers(min_value=0, max_value=(1 << 32) - 1)


@given(
    hkeys=st.lists(_hdoc, min_size=0, max_size=40),
    shift=st.sampled_from([0, 4, 16, 28, 31, 32]),
)
@settings(max_examples=12, deadline=None)
def test_shuffle_chunked_equals_flat(spark, hkeys, shift):
    rows = [(i, "s", h) for i, h in enumerate(hkeys)]
    frame = spark.createDataFrame(
        rows or [(None, None, None)], "doc_id long, source string, hkey long"
    ).filter(F.col("doc_id").isNotNull())
    assert _rows(
        curation._shuffle_shards_chunked(frame, len(rows), shift=shift)
    ) == _rows(curation._shuffle_shards_flat(frame))


def test_registered_shuffle_forced_chunked_equals_flat(
    spark, sf_smoke, monkeypatch
):
    q = REG["corpus_shuffle_shards"].fn
    flat = _rows(q(spark, sf_smoke))
    monkeypatch.setattr(switches, "HOT_KEY_ROWS", -1)
    switches.probe_cache_clear()
    assert _rows(q(spark, sf_smoke)) == flat
    assert len(flat) > 0
