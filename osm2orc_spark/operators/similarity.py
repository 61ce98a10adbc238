"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force cosine top-k            -> ann_topk_bruteforce (baseline)
- all-pairs near-duplicate cosine     -> embedding_near_dup_pairs
- IVF-style probed search             -> ann_ivf_probe (the scale path)

Cross-engine determinism: floats are widened to double (exact) and
quantized with floor(x * 1e6) to BIGINT. Every dot product / norm is then
an integer sum — order-independent and overflow-safe (64 dims x (1e6)^2
~= 6.4e13 << 2^63, and < 2^53 so the final double conversion is exact).
Cosines are computed from those exact integers with IEEE double ops, so
Spark and DuckDB agree bit-for-bit. Spark-side vector math uses
higher-order array functions (zip_with/aggregate) — JVM-evaluated, no
Python, no explode shuffle.

Scale notes: brute-force is O(n*q) with a broadcast query side — the
right plan for one query against any corpus size. All-pairs is O(n^2);
the IVF variant bounds it by cluster: centroid assignment is a broadcast
cross join (centroids are tiny), probing touches only nprobe clusters.
On a real 100 TB corpus the centroid set comes from a sampled k-means
(MLlib KMeans fits here); a fixed deterministic centroid subset is used
so the oracle can replay the exact pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from osm2orc_spark.operators.guards import guard_quadratic
from osm2orc_spark.registry import register
from osm2orc_spark.tables import load

QUANT = 1_000_000
N_CENTROIDS = 8
N_PROBE = 2
TOP_K = 10
NEAR_DUP_COS = 0.4

# Random-hyperplane LSH: RP_BITS sign-bit projections. "Random" planes are
# deterministic ±1 matrices derived from md5 parity of "j|i" (j = bit,
# i = 1-based dimension subscript) so Spark and the DuckDB oracle build the
# EXACT same matrix independently. 16 bits -> 4 x 4-bit chunks; pigeonhole
# guarantees every pair within hamming 3 shares a chunk.
RP_BITS = 16
RP_DIM = 64
RP_CHUNKS = 4


def _rp_sign(j: int, i: int) -> int:
    import hashlib

    return 1 if int(hashlib.md5(f"{j}|{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1


RP_SIGNS = [[_rp_sign(j, i) for i in range(1, RP_DIM + 1)] for j in range(RP_BITS)]


def _quant(col) -> Column:
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT).cast("bigint"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _cosine(dot: Column, n2a: Column, n2b: Column) -> Column:
    return dot.cast("double") / (
        F.sqrt(n2a.cast("double")) * F.sqrt(n2b.cast("double"))
    )


# DuckDB building block: quantized (vec_id, i, v) elements + norms.
_DUCK_QE = f"""
  qe AS (
    SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT}) AS BIGINT) AS v
    FROM embeddings
  ),
  norms AS (SELECT vec_id, CAST(SUM(v*v) AS BIGINT) AS n2 FROM qe GROUP BY vec_id)
"""


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH {_DUCK_QE},
    qid AS (SELECT MIN(vec_id) AS q FROM embeddings),
    dots AS (
      SELECT a.vec_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      FROM qe a JOIN qe b ON a.i = b.i, qid
      WHERE b.vec_id = qid.q
      GROUP BY a.vec_id
    )
    SELECT d.vec_id, e.label,
           CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nq.n2 AS DOUBLE))) AS cosine
    FROM dots d
    JOIN embeddings e ON e.vec_id = d.vec_id
    JOIN norms na ON na.vec_id = d.vec_id
    JOIN norms nq ON nq.vec_id = (SELECT q FROM qid), qid
    WHERE d.vec_id != qid.q
    ORDER BY cosine DESC, d.vec_id
    LIMIT {TOP_K}
    """,
    doc="Brute-force cosine top-k for a single query vector (min vec_id). "
    "The one-row query side is broadcast; scoring is a narrow map over the "
    "corpus — the correct baseline plan at any corpus size.",
    tags=("similarity",),
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    qa, qb = _quant(F.col("embedding")), _quant(F.col("q_emb"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            "label",
            _cosine(_dot(qa, qb), _dot(qa, qa), _dot(qb, qb)).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH {_DUCK_QE},
    dots AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      FROM qe a JOIN qe b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= {NEAR_DUP_COS}
    """,
    doc="Embedding-cosine near-duplicate pairs (all-pairs baseline, "
    "threshold 0.4). O(n^2) by construction — the documented scale path "
    "is ann_ivf_probe's cluster blocking (or LSH random projections) to "
    "restrict pairs to same-bucket candidates.",
    tags=("similarity", "dedup"),
)
def embedding_near_dup_pairs(
    spark: SparkSession, sf_dir: str, *, allow_quadratic: bool = False
) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    guard_quadratic(
        emb,
        "embedding_near_dup_pairs",
        "embedding_near_dup_lsh",
        allow_quadratic=allow_quadratic,
    )
    # The left side fans out to n^2 rows; spread it across cores first
    # (single small parquet split otherwise pins the cross join to 1 task).
    a = emb.repartition(spark.sparkContext.defaultParallelism, "vec_id").select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    qa, qb = _quant(F.col("ea")), _quant(F.col("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            _cosine(_dot(qa, qb), _dot(qa, qa), _dot(qb, qb)).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


N_BATCH_QUERIES = 10


@register(
    "ann_topk_batch",
    oracle=f"""
    WITH {_DUCK_QE},
    queries AS (
      SELECT vec_id AS q_id FROM embeddings ORDER BY vec_id LIMIT {N_BATCH_QUERIES}
    ),
    dots AS (
      SELECT q.q_id, a.vec_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      FROM qe a
      JOIN queries q ON true
      JOIN qe b ON b.vec_id = q.q_id AND b.i = a.i
      WHERE a.vec_id != q.q_id
      GROUP BY q.q_id, a.vec_id
    ),
    scored AS (
      SELECT d.q_id, d.vec_id,
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nq.n2 AS DOUBLE))) AS cosine
      FROM dots d
      JOIN norms na ON na.vec_id = d.vec_id
      JOIN norms nq ON nq.vec_id = d.q_id
    )
    SELECT q_id, vec_id, cosine FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) <= {TOP_K}
    """,
    doc="Batched ANN: top-10 neighbors for each of 10 query vectors in "
    "ONE pass — broadcast the query block, score corpus x queries with "
    "JVM-side zip_with/aggregate, rank per query with a window. This is "
    "the production retrieval shape (dedup and RAG jobs score query "
    "BLOCKS, not single vectors): corpus scans amortize across the whole "
    "block, and the per-query top-k shuffle partitions on q_id.",
    tags=("similarity",),
)
def ann_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = (
        emb.orderBy("vec_id")
        .limit(N_BATCH_QUERIES)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    qa, qb = _quant(F.col("embedding")), _quant(F.col("q_emb"))
    scored = (
        emb.repartition(spark.sparkContext.defaultParallelism, "vec_id")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            _cosine(_dot(qa, qb), _dot(qa, qa), _dot(qb, qb)).alias("cosine"),
        )
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", "cosine")
    )


@register(
    "ann_ivf_kmeans",
    oracle=None,  # KMeans centroids are Spark-specific (seeded but not
    # reproducible in DuckDB); tests/test_advanced.py checks recall
    # against the exhaustive brute-force top-k instead.
    doc="The production IVF variant promised by ann_ivf_probe: centroids "
    "from MLlib KMeans (seeded, fit on the corpus — at 100 TB, on a "
    "sample), then the same assign/probe/score dataflow. Rows-only in "
    "the oracle gate; the recall test pins quality. Fit cost is one "
    "pass over a sample; assignment is a broadcast of k centroid "
    "vectors — identical scale posture to the fixed-centroid variant.",
    tags=("similarity",),
)
def ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load(spark, sf_dir, "embeddings")
    feat = emb.select(
        "vec_id", "label", "embedding",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    km = KMeans(k=N_CENTROIDS, seed=42, maxIter=10)
    model = km.fit(feat.select("features"))
    assigned = model.transform(feat).withColumnRenamed("prediction", "cid")
    # centroid vectors as a tiny broadcastable frame
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid int, c_emb array<double>",
    )
    q = (
        assigned.orderBy("vec_id")
        .limit(1)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.col("cid").alias("q_cid"),
        )
    )
    # probe the query's N_PROBE nearest centroids by euclidean distance
    qc = q.crossJoin(F.broadcast(cent)).select(
        "q_id", "cid",
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("c_emb"),
                    F.col("q_emb").cast("array<double>"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("dist"),
    )
    probe = (
        qc.withColumn("rn", F.row_number().over(W.orderBy("dist", "cid")))
        .filter(F.col("rn") <= N_PROBE)
        .select("cid")
    )
    qa, qb = _quant(F.col("embedding")), _quant(F.col("q_emb"))
    return (
        assigned.join(F.broadcast(probe), "cid")
        .crossJoin(F.broadcast(q.select("q_id", "q_emb")))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id", "label", "cid",
            _cosine(_dot(qa, qb), _dot(qa, qa), _dot(qb, qb)).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


@register(
    "embedding_near_dup_lsh",
    oracle=f"""
    WITH {_DUCK_QE},
    signs AS (
      SELECT j, i,
             CASE WHEN CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 1)) AS INT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM (SELECT unnest(generate_series(0, {RP_BITS - 1})) AS j)
      CROSS JOIN (SELECT unnest(generate_series(1, {RP_DIM})) AS i)
    ),
    sigbits AS (
      SELECT q.vec_id, s.j,
             CASE WHEN SUM(s.s * q.v) >= 0 THEN 1 ELSE 0 END AS bit
      FROM qe q JOIN signs s ON s.i = q.i
      GROUP BY q.vec_id, s.j
    ),
    sigs AS (
      SELECT vec_id, CAST(SUM(bit * power(2, j)) AS BIGINT) AS sig
      FROM sigbits GROUP BY vec_id
    ),
    chunks AS (
      SELECT vec_id, c, (sig >> (4 * c)) & 15 AS cv
      FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, {RP_CHUNKS - 1})) AS c)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM chunks a JOIN chunks b
        ON a.c = b.c AND a.cv = b.cv AND a.vec_id < b.vec_id
    ),
    dots AS (
      SELECT c.vec_a, c.vec_b, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      FROM cand c
      JOIN qe a ON a.vec_id = c.vec_a
      JOIN qe b ON b.vec_id = c.vec_b AND b.i = a.i
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= {NEAR_DUP_COS}
    """,
    doc="Embedding near-dup via random-hyperplane LSH: 16 deterministic "
    "sign-bit projections per vector, 4x4-bit chunk banding (pigeonhole "
    "covers hamming <= 3 between signatures), exact-cosine verification "
    "of same-chunk candidates only. This is the all-pairs scale path: "
    "candidate cost tracks bucket collision counts, not corpus^2. Recall "
    "vs the exhaustive embedding_near_dup_pairs is tunable with more "
    "bits/chunks; the hyperplane matrix is md5-parity-derived so both "
    "engines rebuild it bit-identically.",
    tags=("similarity", "dedup"),
)
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    qv = _quant(F.col("embedding"))
    # signature: bit j = sign of dot(quantized vec, ±1 plane j); exact
    # BIGINT arithmetic, so the sign is engine-deterministic.
    sig = None
    for j in range(RP_BITS):
        plane = F.array(*[F.lit(s) for s in RP_SIGNS[j]])
        bit = (_dot(qv, plane) >= 0).cast("bigint") * F.lit(2**j)
        sig = bit if sig is None else sig + bit
    sigs = emb.select("vec_id", qv.alias("q"), sig.alias("sig")).persist()
    chunk_structs = [
        F.struct(
            F.lit(c).alias("c"),
            F.shiftright(F.col("sig"), 4 * c).bitwiseAND(F.lit(15)).alias("cv"),
        )
        for c in range(RP_CHUNKS)
    ]
    chunks = sigs.select("vec_id", F.explode(F.array(*chunk_structs)).alias("ch")).select(
        "vec_id", "ch.c", "ch.cv"
    )
    a = chunks.select(F.col("vec_id").alias("vec_a"), "c", "cv")
    b = chunks.select(F.col("vec_id").alias("vec_b"), "c", "cv")
    cand = (
        a.join(b, ["c", "cv"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = sigs.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"))
    eb = sigs.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"))
    qa, qb = F.col("qa"), F.col("qb")
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            _cosine(_dot(qa, qb), _dot(qa, qa), _dot(qb, qb)).alias("cosine"),
        )
        .filter(F.col("cosine") >= NEAR_DUP_COS)
    )


@register(
    "ann_ivf_probe",
    oracle=f"""
    WITH {_DUCK_QE},
    cdot AS (
      SELECT a.vec_id, b.vec_id AS cid, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      FROM qe a JOIN qe b ON a.i = b.i
      WHERE b.vec_id < {N_CENTROIDS}
      GROUP BY 1, 2
    ),
    ccos AS (
      SELECT c.vec_id, c.cid,
             CAST(c.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE))) AS cos
      FROM cdot c
      JOIN norms na ON na.vec_id = c.vec_id
      JOIN norms nc ON nc.vec_id = c.cid
    ),
    assign AS (
      SELECT vec_id, cid FROM ccos
      QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) = 1
    ),
    qid AS (SELECT MIN(vec_id) AS q FROM embeddings),
    probe AS (
      SELECT cid FROM ccos, qid WHERE vec_id = qid.q
      QUALIFY ROW_NUMBER() OVER (ORDER BY cos DESC, cid) <= {N_PROBE}
    ),
    qdot AS (
      SELECT a.vec_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot
      FROM qe a JOIN qe b ON a.i = b.i, qid
      WHERE b.vec_id = qid.q
      GROUP BY 1
    )
    SELECT s.vec_id, e.label, s.cid,
           CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nq.n2 AS DOUBLE))) AS cosine
    FROM assign s
    JOIN probe USING (cid)
    JOIN qdot d ON d.vec_id = s.vec_id
    JOIN embeddings e ON e.vec_id = s.vec_id
    JOIN norms na ON na.vec_id = s.vec_id
    JOIN norms nq ON nq.vec_id = (SELECT q FROM qid), qid
    WHERE s.vec_id != qid.q
    ORDER BY cosine DESC, s.vec_id
    LIMIT {TOP_K}
    """,
    doc="IVF-style probed ANN: assign every vector to its best of 8 "
    "deterministic centroids (broadcast cross join — centroids are tiny), "
    "probe the query's 2 best clusters, score only those members. The "
    "production variant swaps the fixed centroid subset for MLlib KMeans "
    "on a sample; the probe/assign dataflow is identical.",
    tags=("similarity",),
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    ev, cv = _quant(F.col("embedding")), _quant(F.col("c_emb"))
    ccos = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        _cosine(_dot(ev, cv), _dot(ev, ev), _dot(cv, cv)).alias("cos"),
    )
    w_assign = W.partitionBy("vec_id").orderBy(F.desc("cos"), "cid")
    assign = (
        ccos.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    q = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    )
    probe = (
        ccos.join(F.broadcast(q), ccos.vec_id == F.col("q_id"))
        .withColumn("rn", F.row_number().over(W.orderBy(F.desc("cos"), "cid")))
        .filter(F.col("rn") <= N_PROBE)
        .select("cid")
    )
    qa, qb = _quant(F.col("embedding")), _quant(F.col("q_emb"))
    return (
        assign.join(F.broadcast(probe), "cid")
        .join(emb, "vec_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            "label",
            "cid",
            _cosine(_dot(qa, qb), _dot(qa, qa), _dot(qb, qb)).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )


INT8_MAX = 127


@register(
    "embedding_int8_quantize",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
                            x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
      FROM embeddings
    ),
    m AS (
      SELECT vec_id, label, qv,
             list_max(list_transform(qv, v -> abs(v))) AS max_abs
      FROM q
    ),
    i8 AS (
      SELECT vec_id, label, max_abs,
             CASE WHEN max_abs = 0 THEN qv
                  ELSE list_transform(qv, v -> CAST(floor(v * {INT8_MAX}.0 / max_abs) AS BIGINT))
             END AS q8
      FROM m
    )
    SELECT vec_id, label,
           CAST(max_abs AS BIGINT) AS max_abs,
           md5(array_to_string(q8, ',')) AS q8_md5,
           CAST(list_sum(list_transform(q8, v -> v * v)) AS BIGINT) AS q8_sq_norm
    FROM i8
    """,
    doc=f"Symmetric int8 quantization of embeddings (the 4x storage / "
    "bandwidth compression step before an ANN index build): elements are "
    f"first fixed-point quantized (floor x*1e6, the engine-neutral rule), "
    f"then scaled to [-{INT8_MAX},{INT8_MAX}] by the per-vector max — all "
    "integer or exact-IEEE arithmetic, so both engines produce identical "
    "codes. Output carries the scale (max_abs), an md5 over the code "
    "vector, and its exact integer squared norm. Narrow per-row op, "
    "zero shuffles, fully parallel.",
    tags=("similarity",),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    qv = _quant(F.col("embedding"))
    m = emb.select("vec_id", "label", qv.alias("qv")).withColumn(
        "max_abs", F.array_max(F.transform("qv", lambda v: F.abs(v)))
    )
    q8 = F.when(F.col("max_abs") == 0, F.col("qv")).otherwise(
        F.transform(
            "qv",
            lambda v: F.floor(v * F.lit(float(INT8_MAX)) / F.col("max_abs")).cast(
                "bigint"
            ),
        )
    )
    i8 = m.withColumn("q8", q8)
    return i8.select(
        "vec_id",
        "label",
        F.col("max_abs").cast("bigint").alias("max_abs"),
        F.md5(F.encode(F.concat_ws(",", F.col("q8")), "utf-8")).alias("q8_md5"),
        F.aggregate(
            F.transform("q8", lambda v: v * v),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("q8_sq_norm"),
    )


def _int8_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, label, q8 array<bigint>) int8 code vectors — the shared
    front-end of embedding_int8_quantize and the int8 ANN probe."""
    qv = _quant(F.col("embedding"))
    m = emb.select("vec_id", "label", qv.alias("qv")).withColumn(
        "max_abs", F.array_max(F.transform("qv", lambda v: F.abs(v)))
    )
    q8 = F.when(F.col("max_abs") == 0, F.col("qv")).otherwise(
        F.transform(
            "qv",
            lambda v: F.floor(v * F.lit(float(INT8_MAX)) / F.col("max_abs")).cast(
                "bigint"
            ),
        )
    )
    return m.withColumn("q8", q8).select("vec_id", "label", "q8")


_DUCK_I8 = f"""
  q AS (
    SELECT vec_id, label,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * {{quant}}) AS BIGINT)) AS qv
    FROM embeddings
  ),
  m AS (
    SELECT vec_id, label, qv,
           list_max(list_transform(qv, v -> abs(v))) AS max_abs
    FROM q
  ),
  codes AS (
    SELECT vec_id, label,
           CASE WHEN max_abs = 0 THEN qv
                ELSE list_transform(qv, v -> CAST(floor(v * {{i8max}}.0 / max_abs) AS BIGINT))
           END AS q8
    FROM m
  )
"""


@register(
    "ann_topk_int8",
    oracle=f"""
    WITH {_DUCK_I8.format(quant=QUANT, i8max=INT8_MAX)},
    e AS (
      SELECT vec_id, label, generate_subscripts(q8, 1) AS i, unnest(q8) AS v
      FROM codes
    ),
    qid AS (SELECT MIN(vec_id) AS q FROM embeddings),
    dots AS (
      SELECT a.vec_id, CAST(SUM(a.v * b.v) AS BIGINT) AS dot_i8
      FROM e a JOIN e b ON a.i = b.i, qid
      WHERE b.vec_id = qid.q
      GROUP BY a.vec_id
    )
    SELECT d.vec_id, c.label, d.dot_i8
    FROM dots d JOIN codes c ON c.vec_id = d.vec_id, qid
    WHERE d.vec_id != qid.q
    ORDER BY d.dot_i8 DESC, d.vec_id
    LIMIT {TOP_K}
    """,
    doc="Top-k by int8 dot product over the quantized code vectors — the "
    "compressed-domain rescoring path: 4x less memory bandwidth per "
    "candidate than float scoring and pure integer arithmetic (exact in "
    "both engines, no fp ordering hazards). At scale this is the cheap "
    "second stage after an IVF/LSH bucket probe, with float rescoring "
    "reserved for the final shortlist. Same broadcast-one-row plan shape "
    "as the float brute-force baseline.",
    tags=("similarity",),
)
def ann_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = _int8_codes(load(spark, sf_dir, "embeddings"))
    q = (
        codes.orderBy("vec_id")
        .limit(1)
        .select(F.col("vec_id").alias("q_id"), F.col("q8").alias("q8_q"))
    )
    return (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "vec_id",
            "label",
            _dot(F.col("q8"), F.col("q8_q")).alias("dot_i8"),
        )
        .orderBy(F.desc("dot_i8"), "vec_id")
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# Product quantization with asymmetric distance computation (PQ-ADC).
# ---------------------------------------------------------------------------
PQ_M = 8  # subspaces over the 64-dim embedding
PQ_D = 8  # dims per subspace
PQ_K = 16  # codes per subspace -> 8 x 4-bit codes per vector (16x smaller)
PQ_SHORTLIST = 50  # ADC shortlist size before exact re-rank


def _pq_sqdist(sub_col: Column, cent: list[float]) -> Column:
    return F.aggregate(
        F.zip_with(
            sub_col,
            F.array(*[F.lit(float(c)) for c in cent]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


@register(
    "ann_pq_adc",
    oracle=None,  # codebooks come from MLlib KMeans fits (Spark-specific);
    # tests/test_advanced.py gates recall against the exhaustive top-k.
    doc="Product-quantization ANN with asymmetric distance computation: "
    f"the 64-dim embedding splits into {PQ_M} subspaces of {PQ_D} dims, "
    f"each with a {PQ_K}-entry KMeans codebook (fit per subspace — on a "
    "sample at 100 TB), so a vector compresses to 8 codes. Encoding is a "
    "pure JVM expression (argmin over literal centroid arrays — no join, "
    "no shuffle, fused into the scan stage); the query-side lookup table "
    "of subspace dot products is computed once on the driver and baked "
    "into the plan as literals, so ADC scoring is 8 array lookups per "
    "row. The ADC shortlist is exact-cosine re-ranked (the standard "
    "IVFPQ discipline). End-to-end: zero shuffles before the final "
    "TakeOrdered top-k.",
    tags=("similarity",),
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load(spark, sf_dir, "embeddings")
    dsub = [
        F.slice(F.col("embedding").cast("array<double>"), m * PQ_D + 1, PQ_D)
        for m in range(PQ_M)
    ]
    feats = emb.select(
        *[array_to_vector(s).alias(f"f{m}") for m, s in enumerate(dsub)]
    ).persist()
    books: list[list[list[float]]] = []
    for m in range(PQ_M):
        model = KMeans(
            k=PQ_K, seed=42 + m, maxIter=10, featuresCol=f"f{m}"
        ).fit(feats.select(f"f{m}"))
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    feats.unpersist()

    # per-subspace code: argmin over the PQ_K literal centroids
    def code(m: int) -> Column:
        d_arr = F.array(*[_pq_sqdist(dsub[m], books[m][c]) for c in range(PQ_K)])
        return (F.array_position(d_arr, F.array_min(d_arr)) - 1).cast("int")

    q_row = (
        emb.orderBy("vec_id").limit(1).select("vec_id", "embedding").collect()[0]
    )
    q_id, q_emb = q_row["vec_id"], [float(x) for x in q_row["embedding"]]
    # ADC lookup tables: LUT[m][c] = <query subvector, centroid c>
    lut = [
        [
            sum(q_emb[m * PQ_D + i] * books[m][c][i] for i in range(PQ_D))
            for c in range(PQ_K)
        ]
        for m in range(PQ_M)
    ]
    approx = sum(
        F.element_at(
            F.array(*[F.lit(v) for v in lut[m]]), code(m) + 1
        )
        for m in range(PQ_M)
    )
    shortlist = (
        emb.filter(F.col("vec_id") != q_id)
        .select("vec_id", "label", "embedding", approx.alias("approx_dot"))
        .orderBy(F.desc("approx_dot"), "vec_id")
        .limit(PQ_SHORTLIST)
    )
    q_arr = F.array(*[F.lit(x) for x in q_emb])
    qa, qb = _quant(F.col("embedding")), _quant(q_arr)
    return (
        shortlist.select(
            "vec_id",
            "label",
            "approx_dot",
            _cosine(_dot(qa, qb), _dot(qa, qa), _dot(qb, qb)).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(TOP_K)
    )
