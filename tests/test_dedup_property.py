"""Randomized exactness property for the PPJoin family.

The fixture-based exactness test (`test_ppjoin_prefix_prunes_but_
preserves_exactness`) checks one corpus; this property drives the
prefix + length + POSITIONAL filters (late r8) through adversarial
corpora a fixture never shows them:

- a TINY vocabulary, so shingle document frequencies tie massively and
  the global (df, shingle) prefix order is decided by the string
  tiebreak — the regime where an unsound rank/tie assumption in the
  positional bound would drop a qualifying pair;
- near-identical doc clusters (base docs + small perturbations), so
  jaccard/containment sit right at the 4/5 and 9/10 thresholds;
- tiny sets (down to one 3-shingle), where the integer prefix/bound
  arithmetic has its edge cases (p = n - ceil(t*n) + 1 at n = 1).

Oracle: a pure-Python brute force over the same normalized word
3-shingles.  Spark result must EQUAL it — the filters may only prune
candidates, never answers.
"""

from __future__ import annotations

import os
import tempfile
from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]

# a document is a list of tokens; perturbations keep docs near-identical
_base_doc = st.lists(st.sampled_from(VOCAB), min_size=3, max_size=14)


@st.composite
def _corpus(draw):
    bases = draw(st.lists(_base_doc, min_size=1, max_size=3))
    docs: list[list[str]] = []
    for base in bases:
        docs.append(base)
        for _ in range(draw(st.integers(0, 2))):
            variant = list(base)
            for _ in range(draw(st.integers(0, 2))):
                op = draw(st.sampled_from(["append", "drop", "swap"]))
                if op == "append":
                    variant.append(draw(st.sampled_from(VOCAB)))
                elif op == "drop" and len(variant) > 3:
                    variant.pop(draw(st.integers(0, len(variant) - 1)))
                elif op == "swap":
                    i = draw(st.integers(0, len(variant) - 1))
                    variant[i] = draw(st.sampled_from(VOCAB))
            docs.append(variant)
    return docs[:8]


def _shingle_set(tokens: list[str]) -> frozenset[str]:
    return frozenset(
        " ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)
    )


def _brute_pairs(docs: list[list[str]]):
    """(jaccard_pairs, containment_pairs) exactly as the queries define
    them: distinct word 3-shingles, jaccard >= 0.8, containment >= 0.9
    in either direction; docs with fewer than 3 tokens have no shingles
    and can never pair (empty sets are filtered by size >= 3 upstream)."""
    sets = {i: _shingle_set(d) for i, d in enumerate(docs) if len(d) >= 3}
    jac, con = set(), {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter / len(sa | sb) >= 0.8:
            jac.add((a, b))
        ca, cb = inter / len(sa), inter / len(sb)
        if ca >= 0.9 or cb >= 0.9:
            con[(a, b)] = (ca, cb)
    return jac, con


def _write_docs(spark, docs: list[list[str]]) -> str:
    sf_dir = tempfile.mkdtemp(prefix="ppjoin_prop_")
    rows = [
        (i, " ".join(d), "en", "prop", len(" ".join(d)))
        for i, d in enumerate(docs)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    return sf_dir


@given(_corpus())
@settings(max_examples=12, deadline=None)
def test_ppjoin_family_matches_python_brute_force(spark, docs):
    from osm2orc_spark.operators.dedup import (
        dedup_containment_ppjoin,
        dedup_ppjoin,
    )

    exp_jac, exp_con = _brute_pairs(docs)
    sf_dir = _write_docs(spark, docs)

    got_jac = {
        (r.doc_a, r.doc_b) for r in dedup_ppjoin(spark, sf_dir).collect()
    }
    assert got_jac == exp_jac, f"docs={docs}"

    got_con = {
        (r.doc_a, r.doc_b): (r.contain_a, r.contain_b)
        for r in dedup_containment_ppjoin(spark, sf_dir).collect()
    }
    assert set(got_con) == set(exp_con), f"docs={docs}"
    for pair, (ca, cb) in exp_con.items():
        assert abs(got_con[pair][0] - ca) < 1e-9
        assert abs(got_con[pair][1] - cb) < 1e-9


# ---------------------------------------------------------------------------
# r10: fuzzy_name_match's split-and-stitch block rank + bucket-banded
# neighborhood join must exactly reproduce the single-window spelling.
# ---------------------------------------------------------------------------
def _fuzzy_window_reference(spark, rows):
    """The r1-r9 spelling: one rank window per block, band as a join
    residual — the semantics of record for the rewrite."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from osm2orc_spark.operators.dedup import FUZZY_MAX_LEV, SNM_WINDOW

    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    t = df.select(
        "p_partkey", "p_name", F.split("p_name", " ").getItem(0).alias("blk")
    ).withColumn(
        "rn",
        F.row_number().over(W.partitionBy("blk").orderBy("p_name", "p_partkey")),
    )
    a = t.select(
        F.col("p_partkey").alias("part_a"), F.col("p_name").alias("name_a"),
        "blk", F.col("rn").alias("rn_a"),
    )
    b = t.select(
        F.col("p_partkey").alias("part_b"), F.col("p_name").alias("name_b"),
        "blk", F.col("rn").alias("rn_b"),
    )
    lev = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (a.blk == b.blk)
            & (F.col("rn_b") - F.col("rn_a") >= 1)
            & (F.col("rn_b") - F.col("rn_a") <= SNM_WINDOW),
        )
        .filter(lev <= FUZZY_MAX_LEV)
        .select("part_a", "part_b", "name_a", "name_b",
                lev.cast("bigint").alias("lev"))
    )


_name = st.text(alphabet="ab x", min_size=0, max_size=10)


@given(st.lists(_name, min_size=1, max_size=40))
@settings(max_examples=10, deadline=None)
def test_fuzzy_rewrite_matches_window_reference(spark, tmp_path_factory, names):
    """Adversarial strings: empty names, leading spaces (empty block
    token), massive name TIES (the stitch's intra-chunk tiebreak and
    the prefix-chunk tie alignment are both load-bearing), blocks
    spanning many prefix chunks, rank-band pairs that straddle bucket
    boundaries."""
    import os as _os
    import tempfile

    from osm2orc_spark.operators.dedup import fuzzy_name_match

    rows = [(i, n) for i, n in enumerate(names)]
    sf_dir = tempfile.mkdtemp(prefix="fuzzy_prop_")
    spark.createDataFrame(rows, "p_partkey long, p_name string").coalesce(
        1
    ).write.mode("overwrite").parquet(_os.path.join(sf_dir, "part.parquet"))
    got = {tuple(r) for r in fuzzy_name_match(spark, sf_dir).collect()}
    exp = {tuple(r) for r in _fuzzy_window_reference(spark, rows).collect()}
    assert got == exp, f"names={names}"
