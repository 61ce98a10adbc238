"""Semantic invariants for the r4 data-selection suite — properties the
hash-equality oracle can't express (the oracle proves Spark == DuckDB;
these prove the statistic does what the method claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm2orc_spark.registry import all_queries

QUERIES = all_queries()


def test_dsir_enriches_target_source(spark, sf_correctness):
    """The selected subset must over-represent the target domain: DSIR's
    whole point is that docs sharing the target's n-gram profile rank
    higher, and the target's own docs share it maximally."""
    from osm2orc_spark.operators.curation import DSIR_K, DSIR_TARGET_SOURCE

    out = QUERIES["curation_dsir_select"].fn(spark, sf_correctness)
    rows = out.collect()
    n = len(rows)
    n_sel = sum(r["selected"] for r in rows)
    assert n_sel == min(DSIR_K, n)
    corpus_share = sum(r["source"] == DSIR_TARGET_SOURCE for r in rows) / n
    sel_share = (
        sum(r["source"] == DSIR_TARGET_SOURCE for r in rows if r["selected"]) / n_sel
    )
    assert sel_share > corpus_share, (
        f"selected target share {sel_share:.3f} <= corpus share {corpus_share:.3f}"
    )


def test_prototype_prune_marks_exact_fifth_per_label(spark, sf_correctness):
    """prune = rnk*5 <= n marks exactly floor(n/5) per label, and the
    pruned set is the TOP of the cosine ranking (most prototypical)."""
    out = QUERIES["embedding_prototype_prune"].fn(spark, sf_correctness)
    per_label = (
        out.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("prune").cast("int")).alias("n_pruned"),
            F.max(F.when(F.col("prune"), F.col("rnk"))).alias("max_pruned_rnk"),
        )
        .collect()
    )
    assert per_label
    for r in per_label:
        assert r["n_pruned"] == r["n"] // 5
        if r["n_pruned"]:
            assert r["max_pruned_rnk"] == r["n_pruned"]  # contiguous top block


def test_epoch_mix_copy_counts_follow_targets(spark, sf_correctness):
    """Per-source replication totals must land inside the floor/ceil epoch
    envelope: n*floor(epochs) <= copies <= n*ceil(epochs), with the
    fractional epoch a strict subset when 0 < frac < 1."""
    from osm2orc_spark.operators.curation import (
        EPOCH_DEFAULT_MILLIS,
        EPOCH_MILLIS,
    )
    from osm2orc_spark.tables import load

    out = QUERIES["curation_epoch_mix"].fn(spark, sf_correctness)
    copies = {
        r["source"]: r["c"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    docs = {
        r["source"]: r["n"]
        for r in load(spark, sf_correctness, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(copies) <= set(docs)
    for src, n in docs.items():
        em = EPOCH_MILLIS.get(src, EPOCH_DEFAULT_MILLIS)
        lo, hi = n * (em // 1000), n * (-(-em // 1000))
        c = copies.get(src, 0)
        assert lo <= c <= hi, f"{src}: {c} outside [{lo}, {hi}]"
    # fractional subsets should be strict somewhere (h is ~uniform)
    assert any(
        copies.get(s, 0) > n * (EPOCH_MILLIS.get(s, EPOCH_DEFAULT_MILLIS) // 1000)
        for s, n in docs.items()
    )


def test_scd2_intervals_partition_user_history(spark, sf_correctness):
    """Per user: intervals tile the history — exactly one is_current,
    n_events sums to the user's event count, and consecutive intervals
    never share a band (change-points only)."""
    from osm2orc_spark.tables import load

    out = QUERIES["scd2_user_value_bands"].fn(spark, sf_correctness)
    agg = (
        out.groupBy("user_id")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("n_current"),
            F.sum("n_events").alias("total_events"),
        )
        .collect()
    )
    ev_counts = {
        r["user_id"]: r["n"]
        for r in load(spark, sf_correctness, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert agg
    for r in agg:
        assert r["n_current"] == 1
        assert r["total_events"] == ev_counts[r["user_id"]]
    # no adjacent same-band intervals
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("valid_from")
    adj = out.select(
        "user_id", "band", F.lag("band").over(w).alias("prev")
    ).filter(F.col("band") == F.col("prev"))
    assert adj.count() == 0


def test_mix_report_describes_training_mix(spark, sf_correctness):
    """The funnel card's n_selected must equal the ACTUAL per-language
    row counts of curation_training_mix, and its quota column the mix's
    quota — the 'provably describes the mix' claim, checked end to end."""
    rep = QUERIES["curation_mix_report"].fn(spark, sf_correctness).collect()
    mix = (
        QUERIES["curation_training_mix"]
        .fn(spark, sf_correctness)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.first("quota").alias("quota"))
        .collect()
    )
    mix_by_lang = {r["lang"]: r for r in mix}
    assert rep
    for r in rep:
        m = mix_by_lang.get(r["lang"])
        assert (m["n"] if m else 0) == r["n_selected"]
        if m is not None:
            assert m["quota"] == r["quota"]
        assert r["n_total"] == (
            r["n_quality_fail"] + r["n_dup_removed"] + r["n_survivors"]
        )


def test_two_level_bucket_rank_equals_plain_window_under_ties(spark):
    """The r7 two-level bucket rank in embedding_prototype_prune must
    equal the single-window spelling on a tie-heavy synthetic frame:
    scores quantize into FEW buckets (forcing multi-row buckets, the
    offset path, and sub-quantization ties that straddle bucket
    boundaries) — the regime where an off-by-one in the exclusive
    running-sum or a wrong tie-break would show."""
    from pyspark.sql.window import Window as W

    QUANT = 1_000_000
    # 3 labels x 400 rows; cos values collide heavily at 1e-6 (k % 7
    # buckets per label) and within-bucket order falls to vec_id.
    rows = spark.range(1200).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 3).cast("string").alias("label"),
        ((F.col("id") % 7).cast("double") / 7.0
         + (F.col("id") % 2).cast("double") * 1e-8).alias("cos"),
    )
    b = rows.withColumn("cos_q6", F.floor(F.col("cos") * QUANT).cast("bigint"))

    w_plain = W.partitionBy("label").orderBy(F.desc("cos"), "vec_id")
    plain = b.select(
        "vec_id", F.row_number().over(w_plain).cast("bigint").alias("rnk")
    )

    counts = b.groupBy("label", "cos_q6").agg(F.count(F.lit(1)).alias("n_b"))
    w_off = (
        W.partitionBy("label")
        .orderBy(F.desc("cos_q6"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "label", "cos_q6",
        F.coalesce(F.sum("n_b").over(w_off), F.lit(0)).alias("off"),
    )
    w_local = W.partitionBy("label", "cos_q6").orderBy(F.desc("cos"), "vec_id")
    two_level = (
        b.join(offsets, ["label", "cos_q6"])
        .select(
            "vec_id",
            (F.col("off") + F.row_number().over(w_local)).cast("bigint").alias("rnk"),
        )
    )
    diff = (
        plain.alias("p")
        .join(two_level.alias("t"), "vec_id")
        .filter(F.col("p.rnk") != F.col("t.rnk"))
    )
    assert diff.count() == 0


def test_rank_cap_conjunct_equals_plain_quota_filter(spark):
    """_rank_cap's literal conjunct ((rn <= bound) AND (rn <= quota)) is
    a pure plan-shape device: with quota <= bound by construction it
    must select exactly the rows of the bare quota filter, including
    groups whose quota exceeds their row count and a hot group."""
    from pyspark.sql.window import Window as W

    from osm2orc_spark.operators.curation import _rank_cap

    rows = spark.range(5000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 3000, F.lit("hot"))
        .otherwise(F.concat(F.lit("g"), (F.col("id") % 37).cast("string")))
        .alias("lang"),
    )
    quota = (
        rows.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "lang",
            F.when(F.col("lang") == "hot", F.lit(17))
            .otherwise(F.least(F.col("n") + 5, F.lit(200)))
            .alias("quota"),
        )
    )
    order_cols = (F.md5(F.col("doc_id").cast("string")), F.asc("doc_id"))
    joined = rows.join(F.broadcast(quota), "lang")

    w = W.partitionBy("lang").orderBy(*order_cols)
    plain = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("quota"))
        .select("doc_id")
    )
    capped = _rank_cap(joined, "lang", order_cols, F.col("quota"), cap_bound=200)
    got = sorted(r["doc_id"] for r in capped.select("doc_id").collect())
    want = sorted(r["doc_id"] for r in plain.collect())
    assert got == want and len(got) > 0


def test_prototype_prune_keeps_zero_norm_vectors(spark, tmp_path):
    """r7 advice: a zero-norm quantized vector makes the cosine (and so
    cos_q6) NULL; the two-level rank's equi-join on the bucket key must
    not drop the row.  The null-safe sentinel bucket ranks it LAST per
    label (desc nulls-last semantics), n_label still counts it, and the
    output row keeps cos_q6 NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 40
    vecs = [[float(i % 7) / 7.0 + 0.01] * 4 for i in range(n)]
    vecs[5] = [0.0, 0.0, 0.0, 0.0]  # zero-norm -> NULL cosine
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = QUERIES["embedding_prototype_prune"].fn(spark, str(tmp_path)).collect()
    assert len(out) == n, "zero-norm row was dropped from the ranking"
    by_id = {r["vec_id"]: r for r in out}
    zr = by_id[5]
    assert zr["cos_q6"] is None
    assert zr["rnk"] == n, "NULL cosine must rank last (nulls-last desc)"
    assert sorted(r["rnk"] for r in out) == list(range(1, n + 1))
    # prune threshold uses n_label INCLUDING the null row: exactly n//5
    assert sum(r["prune"] for r in out) == n // 5
