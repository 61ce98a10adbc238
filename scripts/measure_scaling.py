"""Measure wall-clock scaling of the scale-path queries across SF steps.

Run from the repo root: ``python scripts/measure_scaling.py``.  For each
query, times min-of-N (default 3) steady-state passes at sf0.01 and
sf0.1 in one warmed session and prints the 10x-step wall ratio — the
number SURVEY.md's "measured scaling" table quotes.  A ratio well above
the data growth factor flags super-linear work (unbounded candidate
generation, a skew-collapsed shuffle); at these toy sizes most operators
sit below ~2x because fixed job overhead still dominates.

Output: one JSON line per query + a final summary line, all on stdout
(progress bars disabled), so the artifact is diff-able round over round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2orc_spark.registry import all_queries  # noqa: E402
from osm2orc_spark.session import get_spark  # noqa: E402

SFS = ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
PASSES = 3

# The scale-path set: every operator whose 100 TB story depends on
# bounded candidate generation or single-exchange shapes.
QUERIES = [
    "q1_pricing_summary",
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash_near_dup",
    "dedup_ppjoin",
    "dedup_containment_ppjoin",
    "dedup_duplicate_spans",
    "embedding_near_dup_lsh",
    "ann_topk_bruteforce",
    "ann_ivf_probe",
    "ann_ivfpq_probe",
    "text_quality_scores",
    "curation_dsir_select",
    "embedding_prototype_prune",
]


def main() -> None:
    spark = get_spark(
        app_name="measure_scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        fn = qs[name].fn
        walls: dict[str, float] = {}
        for sf_dir in SFS:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(PASSES):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            walls[sf_dir.rsplit("sf", 1)[-1]] = round(best, 3)
        ratio = round(walls["0.1"] / walls["0.01"], 2)
        results[name] = {**walls, "ratio_10x": ratio}
        print(json.dumps({"query": name, **results[name]}), flush=True)
    worst = max(results.items(), key=lambda kv: kv[1]["ratio_10x"])
    print(
        json.dumps(
            {
                "summary": "10x-step wall ratios",
                "queries": {k: v["ratio_10x"] for k, v in results.items()},
                "worst": {"query": worst[0], **worst[1]},
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
