"""Stage attribution for curation_training_mix (r15, VERDICT r14 #4).

Times the composition's building blocks independently (noop sink, min of
N interleaved passes, caches cleared between passes) so the 2.7-3.4s
bench wall can be attributed: the fused quality frame, dedup_components
(LSH candidate pipeline + union-find), curation_canonical_docs, the
quality filter, and the full composition.

Usage: python scripts/profile_training_mix_r15.py [sf_dir] [n_runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2orc_spark.session import get_spark
from osm2orc_spark.registry import REGISTRY  # noqa: F401  (registration side effects)
import osm2orc_spark.operators.curation as cur
import osm2orc_spark.operators.dedup as dd
from osm2orc_spark.operators.curation import (
    _doc_quality_repetition,
    curation_canonical_docs,
    curation_quality_filter,
    curation_training_mix,
)
from osm2orc_spark.operators.dedup import dedup_components, dedup_minhash_lsh


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(
        "profile_training_mix_r15",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    stages = {
        "quality_frame": lambda: _doc_quality_repetition(spark, sf_dir),
        "minhash_lsh": lambda: dedup_minhash_lsh(spark, sf_dir),
        "components": lambda: dedup_components(spark, sf_dir),
        "canonical_docs": lambda: curation_canonical_docs(spark, sf_dir),
        "quality_filter": lambda: curation_quality_filter(spark, sf_dir),
        "training_mix": lambda: curation_training_mix(spark, sf_dir),
    }
    # Warm codegen once each.
    for fn in stages.values():
        fn().write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    walls: dict[str, list[float]] = {k: [] for k in stages}
    for i in range(n):
        for name, fn in stages.items():
            spark.sparkContext.setJobDescription(f"profile {name} run {i}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            walls[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in walls.items():
        print(f"{name:16s} min {min(ts):.3f}  runs {' '.join(f'{t:.3f}' for t in ts)}")
    spark.stop()


if __name__ == "__main__":
    main()
