"""Randomized exactness property for the degree-ordered triangle core.

The r10 rewrite of ``dupgraph_triangle_stats``' triangle count replaced
the id-ordered node-iterator (Theta(hub_deg^2) join fan-out on
hub-skewed dedup graphs) with the degree-ordered orientation.  The
oracle corpus pins the registered query end-to-end at one corpus; this
property drives the CORE through adversarial graph shapes the LSH pair
list never produces locally:

- hubs (stars) — many wedges, zero triangles: the shape whose fan-out
  motivated the rewrite;
- cliques — every wedge closes: the irreducible-output regime;
- degree TIES everywhere (random sparse graphs are tie-heavy), so the
  (degree, id) lexicographic rank's tiebreak is load-bearing: an
  unsound tiebreak double-counts or drops triangles whose vertices
  share a degree.

Oracle: pure-Python brute force over all C(n,3) vertex triples.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _count_triangles_brute(edges: set[tuple[int, int]]) -> int:
    nodes = sorted({v for e in edges for v in e})
    return sum(
        1
        for x, y, z in combinations(nodes, 3)
        if (x, y) in edges and (x, z) in edges and (y, z) in edges
    )


def _spark_count(spark, edges: set[tuple[int, int]]) -> int:
    # registry-ordered import: graph.py assembles its oracle from the
    # dedup registrations at import time, so load through all_queries()
    from osm2orc_spark.registry import all_queries

    all_queries()
    from osm2orc_spark.operators.graph import _triangle_count_degree_ordered

    e = spark.createDataFrame(sorted(edges), "a long, b long")
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    return _triangle_count_degree_ordered(e, deg).collect()[0]["n_triangles"]


# pair lists are canonical (a < b), mirroring the dedup pair contract
_edge = st.tuples(st.integers(0, 11), st.integers(0, 11)).map(
    lambda t: (min(t), max(t))
).filter(lambda t: t[0] != t[1])


@settings(max_examples=12, deadline=None)
@given(st.sets(_edge, min_size=1, max_size=40))
def test_triangle_core_equals_brute_force(spark, edges):
    assert _spark_count(spark, edges) == _count_triangles_brute(edges)


def test_triangle_core_on_named_shapes(spark):
    # star: 9 spokes, 0 triangles (the hub regime)
    star = {(0, i) for i in range(1, 10)}
    assert _spark_count(spark, star) == 0
    # clique of 6: C(6,3) = 20 (uniform degrees — ALL ranks tie on degree)
    clique = {(a, b) for a, b in combinations(range(6), 2)}
    assert _spark_count(spark, clique) == 20
    # two cliques sharing one vertex: 20 + 20
    shifted = {(a + 5, b + 5) for a, b in combinations(range(6), 2)}
    assert _spark_count(spark, clique | shifted) == 40
    # clique + star off one clique vertex: spokes add wedges, no closure
    assert _spark_count(spark, clique | {(5, i) for i in range(20, 28)}) == 20
