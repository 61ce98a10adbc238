"""In-session A/B: persist the MinHash signature frame before the band
self-join (r15 exploration).

_band_candidates self-joins the bands frame, so the sh-explode + md5 +
12-permutation + groupBy(doc_id) signature subtree is planned once per
join side (both replayed from the persisted arrs cache).  Variant B
persists the narrow (doc_id, mh0..mh11) frame so the hashing runs once.

Usage: python scripts/ab_sigs_persist_r15.py <data_dir> [n_runs]
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


def lsh_sigs_persist(spark, sf_dir):
    arrs = dd._shingle_arrays(spark, sf_dir).persist()
    sh = arrs.select("doc_id", F.explode("arr").alias("shingle"))
    sigs = dd._minhash_signatures(sh).persist()
    cand = dd._band_candidates(sigs)
    return release_with(
        dd._jaccard_pairs_arrays(cand, arrs, dd.JACCARD_THRESHOLD), arrs, sigs
    )


def main() -> None:
    data_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "ab_sigs_persist_r15",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    variants = {
        "replicated": dd.dedup_minhash_lsh,
        "sigs_persist": lsh_sigs_persist,
    }
    rows = {}
    for name, fn in variants.items():
        rows[name] = sorted(tuple(r) for r in fn(spark, data_dir).collect())
        spark.catalog.clearCache()
    assert rows["replicated"] == rows["sigs_persist"], "variants disagree"
    print(f"parity OK ({len(rows['replicated'])} rows)")

    for fn in variants.values():
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    walls = {k: [] for k in variants}
    for i in range(n):
        order = list(variants.items()) if i % 2 == 0 else list(variants.items())[::-1]
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"sigs A/B {name} run {i}")
            t0 = time.perf_counter()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in walls.items():
        s = sorted(ts)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{name:14s} min {min(ts):.3f}  med {med:.3f}  "
            f"runs {' '.join(f'{t:.3f}' for t in ts)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
