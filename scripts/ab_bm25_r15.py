"""Quiet-window in-session A/B for text_bm25_topk (r15, VERDICT r14 #5).

The r14 one-pass rewrite (41d5d8c) measured a wash at sf0.1 and a 1.35x
win at the x32 XL twin, but the r14 driver scored the query 0.83x.  The
VERDICT asks for a 5+-run in-session interleaved A/B against the r13
spelling under the bench's cleared-cache-per-pass protocol so the
keep-or-revert decision rests on same-window numbers.

Usage: python scripts/ab_bm25_r15.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2orc_spark.session import get_spark
from osm2orc_spark.tables import load
from osm2orc_spark.operators.text import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
    _toks,
    text_bm25_topk,
)


def bm25_r13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r13 spelling, verbatim from 41d5d8c~1 (three toks subtrees,
    two doc_id joins)."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_toks()).alias("term")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    g = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    tfd, dfd, dld = (
        F.col("tf").cast("double"),
        F.col("df").cast("double"),
        (F.col("dl") * F.col("n_docs")).cast("double"),
    )
    s = (
        ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (dfd + F.lit(0.5))
    ) * (
        (tfd * F.lit(BM25_K1 + 1.0))
        / (
            tfd
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + (F.lit(BM25_B) * dld) / F.col("sum_dl").cast("double")
            )
        )
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(g))
        .select("doc_id", "term", s.alias("s"))
    )
    term_score = lambda t: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            (
                term_score("spark") + term_score("window") + term_score("merge")
            ).alias("score")
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(
        "ab_bm25_r15", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"one_pass_r14": text_bm25_topk, "r13_three_scans": bm25_r13}

    # Parity first: same rows in the same order.
    rows = {
        k: [tuple(r) for r in fn(spark, sf_dir).collect()]
        for k, fn in variants.items()
    }
    a, b = rows["one_pass_r14"], rows["r13_three_scans"]
    assert len(a) == len(b) and all(
        x[0] == y[0] and abs(x[1] - y[1]) == 0.0 for x, y in zip(a, b)
    ), "variants disagree"
    print(f"parity OK ({len(a)} rows, bit-equal scores)")
    spark.catalog.clearCache()

    # Warm both (codegen), then interleaved timed runs with cleared caches.
    for fn in variants.values():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    walls: dict[str, list[float]] = {k: [] for k in variants}
    for i in range(n):
        order = list(variants.items()) if i % 2 == 0 else list(variants.items())[::-1]
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"bm25 A/B {name} run {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in walls.items():
        s = sorted(ts)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{name:18s} min {min(ts):.3f}  med {med:.3f}  "
            f"runs {' '.join(f'{t:.3f}' for t in ts)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
