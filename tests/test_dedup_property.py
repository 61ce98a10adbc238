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
