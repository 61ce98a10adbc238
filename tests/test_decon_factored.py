"""curation_decontaminate / curation_contamination_report factored
spelling (r10 scale-killer #7): the flat train x test shingle equi-join
fans out df_train(g) * df_test(g) rows per shingle — Theta(n^2) through
one unsplittable key once a boilerplate shingle is shared corpus-wide.
The factored spelling (curation._union_hit_counts) must be
OUTPUT-IDENTICAL for any corpus and any hot_df split point.

Three layers:
- a hypothesis property driving the union counter against a flat-join
  reference on adversarial corpora (tiny vocab => forced hot shingles,
  hot_df forced to 1 so EVERY shingle takes the combination path, plus
  the default split);
- forced-switch identity for both REGISTERED queries at the gate SF
  (threshold -> -1 monkeypatch, exactly the simhash/LSH switch tests'
  pattern);
- probe correctness: the memoized flat-pairs probe equals the literal
  join count.
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


def _flat_reference(left, right):
    """The flat spelling of the union counter: distinct-pair join +
    per-doc count — the shape the factored path replaces."""
    return (
        left.join(right, "shingle")
        .select("doc_id", "rdoc_id")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# Tiny vocab forces heavy shingle sharing; doc sets may be empty or
# disjoint from each other, docs may share everything (one family).
_corpus = st.lists(
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=5),
    min_size=0,
    max_size=24,
)


@given(left=_corpus, right=_corpus, hot_df=st.sampled_from([1, 2, 256]))
@settings(max_examples=12, deadline=None)
def test_union_hit_counts_equals_flat(spark, left, right, hot_df):
    def frame(docs, idcol):
        rows = [
            (i, f"g{g}") for i, gs in enumerate(docs) for g in sorted(set(gs))
        ]
        return spark.createDataFrame(
            rows or [(None, None)], f"{idcol} int, shingle string"
        ).filter(F.col(idcol).isNotNull())

    lf = frame(left, "doc_id")
    rf = frame(right, "rdoc_id")
    got = curation._union_hit_counts(lf, rf, hot_df=hot_df)
    assert _rows(got) == _rows(_flat_reference(lf, rf))


def test_probe_equals_literal_join_count(spark, sf_smoke):
    tagged = curation._split_tagged_shingles(spark, sf_smoke)
    train = tagged.filter(F.col("split") == "train").select("doc_id", "shingle")
    test = tagged.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc_id"), "shingle"
    )
    assert curation._decon_flat_pairs(train, test) == train.join(
        test, "shingle"
    ).count()


@pytest.mark.parametrize(
    "qname", ["curation_decontaminate", "curation_contamination_report"]
)
def test_registered_forced_factored_equals_flat(
    spark, sf_smoke, monkeypatch, qname
):
    q = REG[qname].fn
    flat = _rows(q(spark, sf_smoke))
    monkeypatch.setattr(switches, "DECON_FLAT_PAIRS_MAX", -1)
    switches.probe_cache_clear()
    factored = _rows(q(spark, sf_smoke))
    assert factored == flat
    assert len(flat) > 0
