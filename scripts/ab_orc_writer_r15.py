"""In-session A/B of ORC writer knobs on the x10 ingest twin (r15,
VERDICT r14 #9: the x100 ORC encode is the e2e ingest ceiling).

Times write_orc(read_pbf(x10)) under candidate orc-core writer options,
interleaved run-by-run in one session (r14 house rule), min + median.
Every variant keeps zlib (reference parity) except the recorded zstd
reference point; read-back cell parity is asserted per variant against
the baseline output (same rows, any order).

Usage: python scripts/ab_orc_writer_r15.py [n_runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (x10 twin builder)
from osm2orc_spark.session import get_spark  # noqa: E402
from osm2orc_spark.sinks.orc import write_orc  # noqa: E402
from osm2orc_spark.sources.pbf import read_pbf, read_pbf_bounds  # noqa: E402

VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    "compress_1m": {"orc.compress.size": str(1 << 20)},
    "stripe_128m": {"orc.stripe.size": str(128 << 20)},
    "memchecks_25k": {"orc.rows.between.memory.checks": "25000"},
    "stripe128_c1m": {
        "orc.stripe.size": str(128 << 20),
        "orc.compress.size": str(1 << 20),
    },
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        "ab_orc_writer_r15", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    x10 = bench._x10_pbf_path()
    bounds = read_pbf_bounds(x10)
    base_dir = os.path.dirname(x10)

    def run(name: str, opts: dict[str, str]) -> float:
        out = os.path.join(base_dir, f"ab_orc_{name}")
        df = read_pbf(spark, x10)
        for k, v in opts.items():
            df = df  # options ride the writer, applied inside write_orc via extra
        t0 = time.perf_counter()
        write_orc(df, out, bounds=bounds, extra_options=opts)
        return time.perf_counter() - t0

    # warm decode path once
    read_pbf(spark, x10).write.format("noop").mode("overwrite").save()

    walls: dict[str, list[float]] = {k: [] for k in VARIANTS}
    for i in range(n):
        order = list(VARIANTS.items())
        if i % 2:
            order = order[::-1]
        for name, opts in order:
            spark.sparkContext.setJobDescription(f"orc A/B {name} run {i}")
            walls[name].append(run(name, opts))
    for name, ts in walls.items():
        s = sorted(ts)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{name:14s} min {min(ts):.3f}  med {med:.3f}  "
            f"runs {' '.join(f'{t:.3f}' for t in ts)}"
        )

    # read-back cell parity vs baseline (counts + a value checksum)
    from pyspark.sql import functions as F

    def checksum(path):
        df = spark.read.orc(path)
        # maps are not hashable in Spark; JSON-serialize the full row
        # (field order fixed by the sorted select) before hashing
        return (
            df.count(),
            df.select(
                F.xxhash64(F.to_json(F.struct(*sorted(df.columns)))).alias("h")
            )
            # decimal sum: multiset-exact (xor would cancel the x10
            # twin's repeated rows pairwise), no long overflow
            .agg(F.sum(F.col("h").cast("decimal(38,0)")))
            .collect()[0][0],
        )

    ref = checksum(os.path.join(base_dir, "ab_orc_baseline"))
    for name in VARIANTS:
        got = checksum(os.path.join(base_dir, f"ab_orc_{name}"))
        print(f"parity {name}: {got == ref} ({got[0]} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
