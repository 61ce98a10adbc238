"""In-session A/B: fuse the RP-LSH candidate pair-distinct with a vec_a
distribution (r15 exploration — the similarity-family analog of
scripts/ab_pairdist_r15.py).

OLD: ``.distinct()`` on (vec_a, vec_b); the cosine verify then runs in
the distinct's output stage, whose partition count AQE coalesced by
BYTES (~16 B/pair -> one or two tasks) while the per-row work is a
full-array dot product.  NEW: repartition the raw match rows by vec_a
first; the distinct rides it exchange-free and the verify inherits
defaultParallelism tasks.

Usage: python scripts/ab_rp_pairdist_r15.py <data_dir> [n_runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm2orc_spark.session import get_spark
from osm2orc_spark.operators.cache import release_with
from osm2orc_spark.operators import similarity as sim


def _variant(fused: bool):
    def run(spark, sf_dir):
        sigs, cand = sim._rp_sigs_and_candidates(spark, sf_dir)
        if fused:
            # rebuild cand from sigs with the fused spelling
            chunks = sigs.select("vec_id", F.explode("chs").alias("ch")).select(
                "vec_id", "ch.c", "ch.cv"
            )
            a = chunks.select(F.col("vec_id").alias("vec_a"), "c", "cv")
            b = chunks.select(F.col("vec_id").alias("vec_b"), "c", "cv")
            raw = (
                a.join(b, ["c", "cv"])
                .filter(F.col("vec_a") < F.col("vec_b"))
                .select("vec_a", "vec_b")
            )
            cand = raw.repartition(
                spark.sparkContext.defaultParallelism, "vec_a"
            ).dropDuplicates(["vec_a", "vec_b"])
        sigs = sigs.persist()
        return release_with(sim._lsh_cosine_verify(sigs, cand), sigs)

    return run


def main() -> None:
    data_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark(
        "ab_rp_pairdist_r15",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"old": _variant(False), "new": _variant(True)}
    rows = {}
    for name, fn in variants.items():
        rows[name] = sorted(tuple(r) for r in fn(spark, data_dir).collect())
        spark.catalog.clearCache()
    assert rows["old"] == rows["new"], "variants disagree"
    print(f"parity OK ({len(rows['old'])} rows)")

    for fn in variants.values():
        fn(spark, data_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    walls = {k: [] for k in variants}
    for i in range(n):
        order = list(variants.items()) if i % 2 == 0 else list(variants.items())[::-1]
        for name, fn in order:
            spark.sparkContext.setJobDescription(f"rp pairdist {name} run {i}")
            t0 = time.perf_counter()
            fn(spark, data_dir).write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in walls.items():
        s = sorted(ts)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{name:4s} min {min(ts):.3f}  med {med:.3f}  "
            f"runs {' '.join(f'{t:.3f}' for t in ts)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
