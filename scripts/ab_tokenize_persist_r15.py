"""In-session A/B for the multi-consumer tokenize cutover (r15, VERDICT
r14 #6): replicated tokenize subtrees (the r14 gate-SF shape) vs one
persisted fan (+ the now-single-subtree repartition-before-fan-out), for
text_tfidf_topk and text_bigram_coverage.

The variant is forced through switches.TOKENIZE_PERSIST_MIN_DOCS (huge =
replicate, 0 = persist) so both run the REGISTERED function.  Parity is
asserted first (sorted collects equal), then interleaved timed noop-sink
runs with caches cleared between passes.

Usage: python scripts/ab_tokenize_persist_r15.py <data_dir> [n_runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2orc_spark.session import get_spark
from osm2orc_spark.operators import switches
from osm2orc_spark.operators.text import text_bigram_coverage, text_tfidf_topk


def main() -> None:
    data_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        "ab_tokenize_persist_r15",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = {"tfidf": text_tfidf_topk, "bigram_cov": text_bigram_coverage}
    modes = {"replicate": 1 << 62, "persist": 0}

    def run(qfn, mode):
        switches.TOKENIZE_PERSIST_MIN_DOCS = modes[mode]
        return qfn(spark, data_dir)

    for qname, qfn in queries.items():
        rows = {}
        for mode in modes:
            rows[mode] = sorted(tuple(r) for r in run(qfn, mode).collect())
            spark.catalog.clearCache()
        assert rows["replicate"] == rows["persist"], f"{qname} variants disagree"
        print(f"{qname}: parity OK ({len(rows['persist'])} rows)")

    # warm codegen for both modes
    for qfn in queries.values():
        for mode in modes:
            run(qfn, mode).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()

    walls: dict[tuple, list[float]] = {
        (q, m): [] for q in queries for m in modes
    }
    for i in range(n):
        mode_order = list(modes) if i % 2 == 0 else list(modes)[::-1]
        for qname, qfn in queries.items():
            for mode in mode_order:
                spark.sparkContext.setJobDescription(
                    f"tokenize A/B {qname} {mode} run {i}"
                )
                t0 = time.perf_counter()
                run(qfn, mode).write.format("noop").mode("overwrite").save()
                walls[(qname, mode)].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
    for (qname, mode), ts in walls.items():
        s = sorted(ts)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{qname:10s} {mode:9s} min {min(ts):.3f}  med {med:.3f}  "
            f"runs {' '.join(f'{t:.3f}' for t in ts)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
