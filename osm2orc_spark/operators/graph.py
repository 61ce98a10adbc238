"""Iterative graph analytics over the relational corpus.

The reference (osm2orc) has no graph operators; its data model (ways ->
nodes, relations -> members) is nevertheless graph-shaped, and a corpus
engine at 100 TB needs the pregel-style iterate-join-aggregate pattern
(the same dataflow GraphX/GraphFrames use). ``dedup_components``
(operators/dedup.py) already covers label propagation / connected
components; this module adds weighted-influence ranking.

PageRank here is exact-integer so the DuckDB oracle can replay it
bit-for-bit: ranks are scaled by 1e6 and every update uses only BIGINT
sums and truncating integer division (order-independent, engine-exact).
Damping 0.85 becomes ``150000 + (85 * contrib_sum) div 100``.

Scale notes: the edge list is built once, degree-annotated, and
persisted; each iteration is one shuffle-join (ranks x edges on src,
both hash-partitioned on the same key, so AQE reuses the exchange) plus
one groupBy(dst) with map-side partial sums. At 100 TB the graph is the
small side of the data (distinct trade pairs), iterations are fixed, and
beyond ~10 rounds you'd checkpoint the rank lineage exactly as
dedup_components does (reliable_checkpoint=True posture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2orc_spark.operators.cache import release_with
from osm2orc_spark.registry import register
from osm2orc_spark.tables import load

PR_SCALE = 1_000_000  # rank fixed-point scale
PR_ITERS = 3  # fixed so the oracle unrolls to a flat CTE chain
PR_TOP = 20


def _pagerank_oracle(iters: int) -> str:
    """Unrolled-SQL twin of the Spark loop: r0..r{iters} CTEs."""
    parts = [
        """pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
      SELECT 'c:' || CAST(c AS VARCHAR) AS src, 's:' || CAST(s AS VARCHAR) AS dst FROM pairs
      UNION ALL
      SELECT 's:' || CAST(s AS VARCHAR) AS src, 'c:' || CAST(c AS VARCHAR) AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    dedges AS (SELECT e.src, e.dst, g.d FROM edges e JOIN deg g USING (src)),
    r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""r{i} AS (
      SELECT e.dst AS node,
             CAST(150000 + (85 * SUM(r.pr // e.d)) // 100 AS BIGINT) AS pr
      FROM dedges e JOIN r{i - 1} r ON r.node = e.src
      GROUP BY e.dst
    )"""
        )
    return ",\n    ".join(parts)


@register(
    "pagerank_trade_graph",
    oracle=f"""
    WITH {_pagerank_oracle(PR_ITERS)}
    SELECT node, pr AS pr_scaled
    FROM r{PR_ITERS}
    ORDER BY pr_scaled DESC, node
    LIMIT {PR_TOP}
    """,
    doc="Integer-exact PageRank over the customer<->supplier trade graph "
    "(distinct (custkey, suppkey) pairs from orders x lineitem, edges in "
    "both directions so the chain is irreducible and no dangling-mass "
    "term is needed). Fixed-point ranks scaled 1e6; damping 0.85 applied "
    "as BIGINT ops only, so Spark and the unrolled-CTE DuckDB oracle "
    f"agree exactly. {PR_ITERS} pregel iterations: join(ranks, edges) on "
    "src + groupBy(dst) per round — the GraphX dataflow expressed as "
    "DataFrame ops, with the degree-annotated edge list built once and "
    "persisted across rounds.",
    tags=("graph", "iterative"),
)
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    cnode = F.concat(F.lit("c:"), F.col("c").cast("string"))
    snode = F.concat(F.lit("s:"), F.col("s").cast("string"))
    edges = pairs.select(cnode.alias("src"), snode.alias("dst")).unionAll(
        pairs.select(snode.alias("src"), cnode.alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # Degree-annotated edges: built once, reused every iteration.
    dedges = edges.join(deg, "src").persist()
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("bigint").alias("pr")
    )
    for _ in range(PR_ITERS):
        ranks = (
            dedges.join(ranks, dedges.src == ranks.node)
            .select(F.col("dst"), F.expr("pr div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("cs"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(150000) + F.expr("(85 * cs) div 100")).cast("bigint").alias("pr"),
            )
        )
    return release_with(
        ranks.orderBy(F.desc("pr"), "node")
        .limit(PR_TOP)
        .select("node", F.col("pr").alias("pr_scaled")),
        dedges,
    )


# ---------------------------------------------------------------------------
# Triangle / wedge census of the near-duplicate pair graph.
# ---------------------------------------------------------------------------
@register(
    "dupgraph_triangle_stats",
    oracle="__DEFERRED__",  # assembled below from the minhash-LSH oracle
    doc="Triangle census over the LSH-verified near-dup pair graph: "
    "n_edges, n_wedges (open triads, sum deg*(deg-1)/2), n_triangles "
    "(node-iterator: three-way self-join on id-ordered edges, each "
    "triangle counted once), and the global clustering coefficient "
    "3*tri/wedges in exact micro units. A transitivity probe for dedup "
    "quality: near-dup clusters should be near-cliques, so a LOW "
    "coefficient flags chains of borderline pairs that clustering will "
    "over-merge. Scale: the id-ordering bounds each edge to one join "
    "direction; on skewed graphs order endpoints by (degree, id) "
    "instead — same census, bounded per-key fan-out (the standard "
    "node-iterator refinement).",
    tags=("graph", "dedup"),
)
def dupgraph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm2orc_spark.operators.dedup import dedup_minhash_lsh

    # Hold the upstream result: its shingle cache is scoped to it and
    # must stay warm while this query's plan materializes e.
    lsh_pairs = dedup_minhash_lsh(spark, sf_dir)
    e = lsh_pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).persist()
    und = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges")
    )
    e2 = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    e3 = e.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    tri = (
        e.join(e2, "b")
        .join(e3, (F.col("a") == F.col("ta")) & (F.col("c") == F.col("tc")))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    cc = F.when(
        F.col("n_wedges") > 0,
        F.floor((F.lit(1e6) * 3 * F.col("n_triangles")) / F.col("n_wedges")).cast(
            "bigint"
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    return release_with(
        edges.crossJoin(wedges)
        .crossJoin(tri)
        .select("n_edges", "n_wedges", "n_triangles", cc.alias("clustering_micro")),
        e,
        lsh_pairs,
    )


def _assemble_triangle_oracle() -> None:
    from osm2orc_spark.registry import REGISTRY

    pairs_sql = REGISTRY["dedup_minhash_lsh"].oracle
    REGISTRY["dupgraph_triangle_stats"].oracle = f"""
    WITH p AS ({pairs_sql}),
    e AS (SELECT doc_a AS a, doc_b AS b FROM p),
    und AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT a, COUNT(*) AS d FROM und GROUP BY a),
    w AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
    t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3
        ON e3.a = e1.a AND e3.b = e2.b
    ),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
    SELECT ne.n_edges, w.n_wedges, t.n_triangles,
           CASE WHEN w.n_wedges > 0
                THEN CAST(FLOOR((1e6 * 3 * t.n_triangles) / w.n_wedges) AS BIGINT)
                ELSE 0 END AS clustering_micro
    FROM ne, w, t
    """


_assemble_triangle_oracle()
