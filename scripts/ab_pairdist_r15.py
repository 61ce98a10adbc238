"""In-session A/B: fuse the pair-distinct with the verify-stage doc_a
re-distribution (r15 exploration, guide §2.2).

OLD spelling: ``.distinct()`` (Exchange on (doc_a, doc_b)) then
``repartition(par, doc_a)`` inside the verify (a second Exchange over the
distinct pairs).  NEW spelling: repartition the RAW match rows by doc_a
first; HashPartitioning(doc_a) satisfies the distinct's
ClusteredDistribution([doc_a, doc_b]) and the verify joins' doc_a
clustering, so the distinct and first join add no exchange.  Map-side
partial dedup before the old distinct catches ~nothing (a pair's
duplicate rows come from different shingle/band join keys), so both
spellings shuffle ~all raw rows once and the new one skips the second
exchange outright.

Usage: python scripts/ab_pairdist_r15.py <data_dir> [n_runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm2orc_spark.session import get_spark
from osm2orc_spark.operators.cache import release_with
from osm2orc_spark.operators import dedup as dd


def _old_pair_intersections(cand, arrs):
    cand = cand.repartition(
        cand.sparkSession.sparkContext.defaultParallelism, "doc_a"
    )
    a = arrs.selectExpr("doc_id AS doc_a", "arr AS arr_a", "n AS na")
    b = arrs.selectExpr("doc_id AS doc_b", "arr AS arr_b", "n AS nb")
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .selectExpr("*", "size(array_intersect(arr_a, arr_b)) AS n_inter")
    )


def _old_jaccard_pairs_arrays(cand, arrs, threshold):
    return (
        _old_pair_intersections(cand, arrs)
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(n_inter AS DOUBLE) / ((na + nb) - n_inter) AS jaccard",
        )
        .filter(F.col("jaccard") >= threshold)
    )


def old_ppjoin(spark, sf_dir):
    oarr, arrs = dd._df_ordered_shingle_arrays(spark, sf_dir)
    arrs = arrs.persist()
    oarr = oarr.persist()
    pos = oarr.selectExpr("doc_id", "n", "posexplode(arr) AS (idx, shingle)")
    prefix = pos.filter(
        F.expr("(idx + 1) <= ((n - ((4*n + 4) div 5)) + 1)")
    ).selectExpr("*", "idx + 1 AS rn")
    a = prefix.selectExpr("doc_id AS doc_a", "shingle", "n AS na", "rn AS rna")
    b = prefix.selectExpr("doc_id AS doc_b", "shingle", "n AS nb", "rn AS rnb")
    cand = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.lit(5) * F.least("na", "nb") >= F.lit(4) * F.greatest("na", "nb"))
        .filter(
            F.lit(9)
            * (F.lit(1) + F.least(F.col("na") - F.col("rna"), F.col("nb") - F.col("rnb")))
            >= F.lit(4) * (F.col("na") + F.col("nb"))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return release_with(
        _old_jaccard_pairs_arrays(cand, oarr, dd.JACCARD_THRESHOLD), oarr, arrs
    )


def old_containment_ppjoin(spark, sf_dir):
    oarr, arrs = dd._df_ordered_shingle_arrays(spark, sf_dir)
    arrs = arrs.persist()
    oarr = oarr.persist()
    pos = oarr.selectExpr("doc_id", "n", "posexplode(arr) AS (idx, shingle)")
    prefix = pos.filter(
        F.expr("(idx + 1) <= ((n - ((9*n + 9) div 10)) + 1)")
    ).selectExpr("doc_id AS doc_p", "shingle", "n AS np", "idx + 1 AS rnp")
    full = pos.selectExpr("doc_id AS doc_f", "shingle", "n AS nf", "idx + 1 AS rnf")
    cand = (
        prefix.join(full, "shingle")
        .filter(F.col("doc_p") != F.col("doc_f"))
        .filter(
            F.lit(10)
            * (F.lit(1) + F.least(F.col("np") - F.col("rnp"), F.col("nf") - F.col("rnf")))
            >= F.lit(9) * F.least("np", "nf")
        )
        .select(
            F.least("doc_p", "doc_f").alias("doc_a"),
            F.greatest("doc_p", "doc_f").alias("doc_b"),
        )
        .distinct()
    )
    scored = _old_pair_intersections(cand, oarr).selectExpr(
        "doc_a",
        "doc_b",
        "CAST(n_inter AS DOUBLE) / na AS contain_a",
        "CAST(n_inter AS DOUBLE) / nb AS contain_b",
    )
    return release_with(
        scored.filter(
            (F.col("contain_a") >= dd.CONTAIN_THRESHOLD)
            | (F.col("contain_b") >= dd.CONTAIN_THRESHOLD)
        ),
        oarr,
        arrs,
    )


def old_minhash_lsh(spark, sf_dir):
    arrs = dd._shingle_arrays(spark, sf_dir).persist()
    sh = arrs.select("doc_id", F.explode("arr").alias("shingle"))
    sigs = dd._minhash_signatures(sh).persist()
    n_bands = dd.MINHASH_SEEDS // dd.LSH_BAND_ROWS
    band_structs = ", ".join(
        f"named_struct('band', {b}, 'band_val', concat_ws(',', "
        + ", ".join(
            f"mh{s}" for s in range(b * dd.LSH_BAND_ROWS, (b + 1) * dd.LSH_BAND_ROWS)
        )
        + "))"
        for b in range(n_bands)
    )
    bands = sigs.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bv"
    ).select("doc_id", "bv.band", "bv.band_val")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_val")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_val")
    cand = (
        a.join(b, ["band", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return release_with(
        _old_jaccard_pairs_arrays(cand, arrs, dd.JACCARD_THRESHOLD), arrs, sigs
    )


PAIRS = {
    "ppjoin": (old_ppjoin, dd.dedup_ppjoin),
    "containment_ppjoin": (old_containment_ppjoin, dd.dedup_containment_ppjoin),
    "minhash_lsh": (old_minhash_lsh, dd.dedup_minhash_lsh),
}


def main() -> None:
    data_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "ab_pairdist_r15",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for qname, (old_fn, new_fn) in PAIRS.items():
        old_rows = sorted(tuple(r) for r in old_fn(spark, data_dir).collect())
        spark.catalog.clearCache()
        new_rows = sorted(tuple(r) for r in new_fn(spark, data_dir).collect())
        spark.catalog.clearCache()
        assert old_rows == new_rows, f"{qname}: variants disagree"
        print(f"{qname}: parity OK ({len(old_rows)} rows)")

    for qname, (old_fn, new_fn) in PAIRS.items():
        for fn in (old_fn, new_fn):
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        walls = {"old": [], "new": []}
        for i in range(n):
            order = [("old", old_fn), ("new", new_fn)]
            if i % 2:
                order = order[::-1]
            for vname, fn in order:
                spark.sparkContext.setJobDescription(f"pairdist {qname} {vname} run {i}")
                t0 = time.perf_counter()
                fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                walls[vname].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
        for vname, ts in walls.items():
            s = sorted(ts)
            med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
            print(
                f"{qname:20s} {vname:4s} min {min(ts):.3f}  med {med:.3f}  "
                f"runs {' '.join(f'{t:.3f}' for t in ts)}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
