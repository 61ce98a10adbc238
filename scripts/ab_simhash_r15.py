"""In-session alternating A/B: simhash signature aggregate width.

Variant A (r14 shape): 48 conditional-sum aggregates, one per signature
bit (sum(when(bit,1).otherwise(-1))).

Variant B (packed lanes, guide §2.3 "shuffle fewer bytes / narrower
aggregation"): 24 packed sums + count(*).  Each 64-bit sum carries TWO
32-bit ones-counters (bits b and b+24); bit b of the signature is set
iff 2*ones_b > n — algebraically identical to sum(±1) > 0.  Overflow-free
by construction: tokens/doc < 2^30 (string length cap), lane sum < 2^30,
packed row value <= 2^32+1, total sum < 2^31*(2^32+1) < 2^63.

Protocol (r14 house rule): ONE Spark session, variants interleaved
run-by-run, min AND median reported; identity checked by collect at the
gate SFs first.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from osm2orc_spark.operators import dedup  # noqa: E402
from osm2orc_spark.session import get_spark  # noqa: E402
from osm2orc_spark.tables import load  # noqa: E402

LANES = 24  # 48 bits / 2 lanes per 64-bit sum
LOW_MASK = (1 << 32) - 1


def _simhash_df_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(dedup._norm_text(), " "))).alias("tok"),
    )
    hashed = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.encode("tok", "utf-8")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("v"),
    )
    packed = [
        F.sum(
            F.shiftright(F.col("v"), j).bitwiseAND(F.lit(1))
            + F.shiftleft(
                F.shiftright(F.col("v"), j + LANES).bitwiseAND(F.lit(1)), 32
            )
        ).alias(f"p{j}")
        for j in range(LANES)
    ]
    agg = hashed.groupBy("doc_id").agg(*packed, F.count(F.lit(1)).alias("n"))
    sig = None
    for b in range(48):
        if b < LANES:
            ones = F.col(f"p{b}").bitwiseAND(F.lit(LOW_MASK))
        else:
            ones = F.shiftright(F.col(f"p{b - LANES}"), 32)
        term = F.when(ones * 2 > F.col("n"), F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.cast("bigint").alias("simhash"))


def _noop(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    spark = get_spark("ab_simhash_r15")
    sc = spark.sparkContext

    # identity at all three gate SFs
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        a = sorted(map(tuple, dedup._simhash_df(spark, d).collect()))
        b = sorted(map(tuple, _simhash_df_packed(spark, d).collect()))
        assert a == b, f"MISMATCH at {sf}"
        print(f"identity {sf}: OK ({len(a)} rows)", flush=True)

    sf = "/root/testdata/sf0.1"
    # warm both
    _noop(dedup._simhash_df(spark, sf))
    _noop(_simhash_df_packed(spark, sf))

    n = int(os.environ.get("AB_N", "7"))
    ta, tb = [], []
    for i in range(n):
        sc.setJobDescription(f"A48 run {i}")
        ta.append(_noop(dedup._simhash_df(spark, sf)))
        sc.setJobDescription(f"B24 run {i}")
        tb.append(_noop(_simhash_df_packed(spark, sf)))
        print(f"run {i}: A={ta[-1]:.3f} B={tb[-1]:.3f}", flush=True)
    for nm, t in (("A 48-agg", ta), ("B 24-packed", tb)):
        print(
            f"{nm}: min={min(t):.3f} median={statistics.median(t):.3f} "
            f"all={[round(x, 3) for x in t]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
