"""Build the bench XL scaling-tier twin (r15, VERDICT r14 bench-scaling
item): a salted uniform replication of sf0.1 documents + events, reusing
measure_scaling's xl_base recipe (per-replica token salting keeps dedup
work ~linear in the replication factor instead of quadratic in true
pairs; event/doc ids are remapped collision-free).

Usage:
    SKEW_XL_REP=16 python scripts/build_bench_xl.py
prints the twin directory to point SPARK_GRAFT_XL_DIR at:
    SPARK_GRAFT_XL_DIR=<dir> python bench.py
The twin is write-once input data (idempotent _BUILT marker), the same
class as measure_scaling's twins — no query results or intermediates are
cached.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2orc_spark.session import get_spark  # noqa: E402

import measure_scaling  # noqa: E402  (same directory)


def main() -> None:
    spark = get_spark("build_bench_xl")
    dirs = measure_scaling._build_xl_data(spark)
    print(dirs["xl_base"])
    spark.stop()


if __name__ == "__main__":
    main()
