"""Adversarial parity check on shared Spark/SQL constants (r4 verdict #7).

160+ oracle twins interpolate Spark-side constants (thresholds, seeds,
quantizers, band geometry) into their SQL text.  Today both sides read the
same Python name, so they cannot drift — but a future edit that hardcodes
one side (or renames the constant and misses a literal) would pass every
value test at the SFs where both engines happen to agree.  This test
extracts each shared constant from the LIVE registered oracle text and
asserts it equals the LIVE Python value, so a one-sided change fails
loudly and immediately.

The manifest pins (query, module constant, distinctive SQL snippet built
from the live value).  Snippets are chosen so they appear in the oracle
iff the constant reached the SQL with the same value.
"""

from __future__ import annotations

import pytest

from osm2orc_spark.operators import curation, dedup, similarity, text
from osm2orc_spark.registry import all_queries

QUERIES = all_queries()


def _snip(template: str, value) -> str:
    return template.format(v=value)


# (query_name, live_value, snippet_template) — {v} is the live Python value.
MANIFEST = [
    # quantizer scale: every similarity oracle quantizes via floor(x * QUANT)
    ("ann_topk_bruteforce", similarity.QUANT, "* {v})"),
    ("embedding_dim_stats", similarity.QUANT, "* {v})"),
    # Lloyd's fit geometry + the r5 absolute fit cap
    ("ann_ivf_kmeans", similarity.MAX_FIT_ROWS, "<= {v}"),
    ("ann_ivf_kmeans", similarity.N_CENTROIDS, "QUALIFY cid < {v}"),
    ("ann_pq_adc", similarity.MAX_FIT_ROWS, "<= {v}"),
    ("ann_pq_adc", similarity.PQ_K, "QUALIFY cid < {v}"),
    ("ann_ivfpq_probe", similarity.MAX_FIT_ROWS, "<= {v}"),
    ("ann_ivfpq_probe", similarity.PQ_SHORTLIST, "LIMIT {v}"),
    ("dedup_semantic_kmeans", similarity.MAX_FIT_ROWS, "<= {v}"),
    ("ann_ivfpq_recall", similarity.TOP_K, "LIMIT {v}"),
    # RP-LSH banding (the r3 scale-killer was exactly this geometry)
    ("embedding_near_dup_lsh", similarity.RP_BITS - 1, "generate_series(0, {v})"),
    # shingle/minhash geometry
    ("dedup_minhash_lsh", dedup.LSH_BAND_ROWS, None),  # value-only check below
    ("dedup_minhash_lsh", dedup.JACCARD_THRESHOLD, ">= {v}"),
    ("dedup_ngram_jaccard", dedup.JACCARD_THRESHOLD, ">= {v}"),
    ("dedup_containment_pairs", dedup.CONTAIN_THRESHOLD, ">= {v}"),
    ("dedup_containment_ppjoin", dedup.CONTAIN_THRESHOLD, ">= {v}"),
    ("dedup_minhash_lsh_dfcap", dedup.MINHASH_DF_CAP, "> {v}"),
    ("dedup_duplicate_spans", dedup.SPAN_N - 1, "len(toks) - {v})"),
    ("simhash_near_dup", dedup.SIMHASH_HAMMING_MAX, "<= {v}"),
    # curation quotas / quantizers
    ("curation_training_mix", curation.MIX_TARGET, "({v} * q)"),
    ("curation_training_mix", curation.MIX_QUANT, "* {v}"),
    ("curation_dsir_select", curation.DSIR_RQ, "({v} *"),
    ("curation_dsir_select", curation.DSIR_K, None),
    ("curation_quality_filter", curation.MIN_QUALITY, "< {v}"),
    ("curation_quality_filter", curation.MAX_DUP_BIGRAM, "> {v}"),
    ("curation_pack_sequences", curation.PACK_BUDGET, None),
    # text scoring constants
    ("text_bm25_topk", text.BM25_K1, "{v}"),
    ("text_bm25_topk", text.BM25_B, "{v}"),
    ("doc_winnowing_fingerprints", text.WINNOW_K, None),
    ("text_quality_classifier", text.FEAT_BUCKETS, "% {v}"),
]


@pytest.mark.parametrize(
    "name,value,template",
    MANIFEST,
    ids=[f"{n}:{v}" for n, v, _ in MANIFEST],
)
def test_shared_constant_reaches_oracle(name, value, template):
    oracle = QUERIES[name].oracle
    assert oracle is not None, f"{name} lost its oracle"
    if template is None:
        # Geometry constants whose SQL shape varies: require the bare
        # value to appear at least once (weaker, still drift-detecting
        # for any distinctive integer).
        assert str(value) in oracle, f"{name}: {value} not in oracle SQL"
    else:
        snippet = _snip(template, value)
        assert snippet in oracle, f"{name}: {snippet!r} not in oracle SQL"


def test_no_deferred_oracles_remain():
    """Every __DEFERRED_*__ placeholder must be assembled by import time —
    a half-registered composed oracle would silently downgrade a query to
    the rows-only gate."""
    for name, q in QUERIES.items():
        if q.oracle is not None:
            assert "__DEFERRED" not in q.oracle, name


def test_quant_consistent_across_modules():
    """The fixed-point scale is house-wide: similarity.QUANT and the
    curation/DSIR quantizers must stay the same power of ten so
    cross-module compositions keep exact integer semantics."""
    assert similarity.QUANT == 1_000_000
    assert curation.MIX_QUANT == similarity.QUANT
    assert curation.DSIR_RQ == similarity.QUANT
