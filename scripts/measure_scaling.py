"""Measure wall-clock scaling of the scale-path queries across SF steps.

Run from the repo root: ``python scripts/measure_scaling.py``.  For each
query, times min-of-N (default 3) steady-state passes at sf0.01 and
sf0.1 in one warmed session and prints the 10x-step wall ratio — the
number SURVEY.md's "measured scaling" table quotes.  A ratio well above
the data growth factor flags super-linear work (unbounded candidate
generation, a skew-collapsed shuffle); at these toy sizes most operators
sit below ~2x because fixed job overhead still dominates.

``python scripts/measure_scaling.py --skew`` runs the SKEW mode instead
(r5 verdict #5): the uniform 10x-step table cannot see the 100 TB risk —
one hot key.  Skew mode derives two deterministic skewed twins of sf0.1
under .scaling_skew/ (never touching /root/testdata):

- hot_span:  every 10th document gets the same 8-token boilerplate
  sentence appended — one span/shingle family at 10% document frequency
  (the license-header scenario the span/shingle operators exist for).
- hot_user:  every 10th event is remapped to ONE user_id — a single key
  holding 10% of the events table (the hot-session scenario for the
  window family).

Each skew-sensitive query is timed at baseline sf0.1 and on its skewed
twin; the reported ``skew_ratio`` (skewed wall / baseline wall) is the
resilience number — near 1.0 means the plan absorbs the hot key
(partial aggregation, prefix filters, df caps, salting), a blow-up
means the operator needs attention before production scale.

Output: one JSON line per (query, mode) + a final summary line.
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


# Skew-sensitivity set: (query, skew mode) pairs.  Document-derived
# operators face the hot-span corpus; event/window operators the
# hot-user stream.  dfcap and ppjoin variants are IN the list precisely
# because their designs claim hot-key immunity — the measurement checks
# the claim, not just the failure.
SKEW_QUERIES = [
    ("dedup_duplicate_spans", "hot_span"),
    ("dedup_spans_clean", "hot_span"),
    ("dedup_ppjoin", "hot_span"),
    ("dedup_containment_ppjoin", "hot_span"),
    ("dedup_minhash_lsh", "hot_span"),
    ("dedup_minhash_lsh_dfcap", "hot_span"),
    ("dedup_exact", "hot_span"),
    ("sessionize_events", "hot_user"),
    ("latest_event_window", "hot_user"),
    ("tumbling_window_hourly", "hot_user"),
    ("ohlc_hourly_bars", "hot_user"),
    ("salted_hot_key_agg", "hot_user"),
    ("window_lag_transitions", "hot_user"),
    ("anomaly_zscore_events", "hot_user"),
]

BASE_SF = "/root/testdata/sf0.1"
SKEW_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaling_skew"
)
BOILERPLATE = (
    "this document is provided as is without warranty of any kind whatsoever"
)
HOT_USER_ID = 424242


def _build_skew_data(spark) -> dict[str, str]:
    """Derive the two skewed twins of sf0.1 (idempotent, deterministic)."""
    from pyspark.sql import functions as F

    from osm2orc_spark.tables import TABLES, load

    out = {}
    for mode in ("hot_span", "hot_user"):
        mode_dir = os.path.join(SKEW_DIR, mode)
        marker = os.path.join(mode_dir, "_BUILT")
        out[mode] = mode_dir
        if os.path.exists(marker):
            continue
        os.makedirs(mode_dir, exist_ok=True)
        for t in TABLES:
            df = load(spark, BASE_SF, t)
            if mode == "hot_span" and t == "documents":
                df = df.withColumn(
                    "text",
                    F.when(
                        F.col("doc_id") % 10 == 0,
                        F.concat(F.col("text"), F.lit(" " + BOILERPLATE)),
                    ).otherwise(F.col("text")),
                )
            if mode == "hot_user" and t == "events":
                df = df.withColumn(
                    "user_id",
                    F.when(
                        F.col("event_id") % 10 == 0, F.lit(HOT_USER_ID)
                    ).otherwise(F.col("user_id")),
                )
            df.write.mode("overwrite").parquet(os.path.join(mode_dir, f"{t}.parquet"))
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out


def _timed(spark, fn, sf_dir: str, passes: int = PASSES) -> float:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    return best


def main_skew() -> None:
    spark = get_spark(
        app_name="measure_scaling_skew",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    dirs = _build_skew_data(spark)
    qs = all_queries()
    results: dict[str, dict] = {}
    for name, mode in SKEW_QUERIES:
        fn = qs[name].fn
        base = _timed(spark, fn, BASE_SF)
        skew = _timed(spark, fn, dirs[mode])
        rec = {
            "mode": mode,
            "base_sec": round(base, 3),
            "skew_sec": round(skew, 3),
            "skew_ratio": round(skew / base, 2),
        }
        results[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
    worst = max(results.items(), key=lambda kv: kv[1]["skew_ratio"])
    print(
        json.dumps(
            {
                "summary": "hot-key skew wall ratios (skew/base at sf0.1)",
                "queries": {k: v["skew_ratio"] for k, v in results.items()},
                "worst": {"query": worst[0], **worst[1]},
            }
        ),
        flush=True,
    )
    spark.stop()


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
    main_skew() if "--skew" in sys.argv[1:] else main()
