"""Text-analysis operators over the ``documents`` table.

- token counting (whitespace tokenization)        -> text_token_stats
- quality scoring (length/stopword/diversity)     -> text_quality_scores
- language ID (stopword-list heuristic)           -> lang_id_heuristic
- document fingerprinting (sorted-vocab hash)     -> doc_fingerprint

All metrics are derived from integer counts (exact) or integer ratios
(deterministic IEEE division), so Spark and DuckDB agree bit-for-bit.
Everything is built-in column expressions — no Python UDFs — so the whole
pipeline stays inside whole-stage codegen and scales linearly with
document count (narrow, per-row; zero shuffles except final aggs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm2orc_spark.operators.cache import release_with
from osm2orc_spark.registry import register
from osm2orc_spark.tables import load


def _toks():
    return F.split(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))), " ")


STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]

# Per-language stopword lists for the n-gram/stopword language heuristic.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "das", "und", "ist"],
    "zh": ["de", "shi", "zai", "le", "wo"],
}


@register(
    "text_token_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique,
           CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS n_token_chars,
           CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE) / len(toks) AS avg_token_len,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
    FROM t
    """,
    doc="Token counting: whitespace tokens via built-in array functions "
    "(size / array_distinct / aggregate) plus a BPE-ish regex count "
    "(letter runs | single digits | punctuation — the GPT-2 pre-tokenizer "
    "shape). Per-row narrow ops, no shuffle, fully codegen'd.",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tokenize once into a materialized column — inlining the split
    # expression into every metric re-runs the regex per metric.
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "text", _toks().alias("t")
    )
    t = F.col("t")
    n_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return docs.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_unique"),
        n_chars.alias("n_token_chars"),
        (n_chars.cast("double") / F.size(t)).alias("avg_token_len"),
        (F.size(F.array_distinct(t)).cast("double") / F.size(t)).alias(
            "type_token_ratio"
        ),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"[a-z]+|[0-9]|[^a-z0-9 ]"), 0))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


def _quality_cols() -> list:
    """The text_quality_scores metric columns over a frame carrying
    (n_chars, t) — factored (r14) so fused internal consumers
    (operators/curation.py's one-scan quality+repetition frame) compute
    them off a single tokenize with arithmetic IDENTICAL to the
    registered query (same expressions, same oracle)."""
    toks = F.col("t")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("bigint")
    n_unique = F.size(F.array_distinct(toks)).cast("bigint")
    stop_ratio = n_stop.cast("double") / n_tokens
    diversity = n_unique.cast("double") / n_tokens
    length_term = (
        F.when(F.col("n_chars").between(100, 400), F.lit(0.4)).otherwise(F.lit(0.1))
    )
    return [
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        diversity.alias("diversity"),
        (length_term + F.lit(0.3) * stop_ratio + F.lit(0.3) * diversity).alias(
            "quality_score"
        ),
    ]



@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id, lang, n_chars,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_filter(toks, x -> list_contains({STOPWORDS!r}, x))) AS BIGINT) AS n_stop,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
      FROM t
    )
    SELECT doc_id, lang, n_tokens,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_unique AS DOUBLE) / n_tokens AS diversity,
           (CASE WHEN n_chars BETWEEN 100 AND 400 THEN 0.4 ELSE 0.1 END
            + 0.3 * (CAST(n_stop AS DOUBLE) / n_tokens)
            + 0.3 * (CAST(n_unique AS DOUBLE) / n_tokens)) AS quality_score
    FROM m
    """,
    doc="Quality scoring from length / stopword-ratio / lexical diversity. "
    "All terms are integer ratios or literals -> deterministic doubles. "
    "The score mirrors heuristic pretraining-data filters (C4-style).",
    tags=("text",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", _toks().alias("t")
    )
    return docs.select("doc_id", "lang", *_quality_cols())


def _lang_scores_sql() -> str:
    cols = ",\n           ".join(
        f"CAST(len(list_filter(toks, x -> list_contains({words!r}, x))) AS BIGINT) AS s_{lang}"
        for lang, words in LANG_STOPWORDS.items()
    )
    langs = list(LANG_STOPWORDS)
    pred = "CASE "
    for lang in langs:
        others = [f"s_{o}" for o in langs if o != lang]
        pred += f"WHEN s_{lang} >= greatest({', '.join(others)}) THEN '{lang}' "
    pred += "ELSE 'unknown' END"
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
           {cols}
      FROM t
    )
    SELECT doc_id, lang, {pred} AS pred_lang,
           (lang = ({pred})) AS correct
    FROM scored
    """


@register(
    "lang_id_heuristic",
    oracle=_lang_scores_sql(),
    doc="Stopword-list language ID: per-language token-hit counts, argmax "
    "with a fixed precedence order (en>es>fr>de>zh) so ties are "
    "deterministic. Output includes agreement with the labeled lang.",
    tags=("text",),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", _toks().alias("t"))
    toks = F.col("t")
    def hit_count(words: list[str]):
        word_arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(word_arr, x))).cast("bigint")

    scored = docs.select(
        "doc_id",
        "lang",
        *[hit_count(words).alias(f"s_{lang}") for lang, words in LANG_STOPWORDS.items()],
    )
    langs = list(LANG_STOPWORDS)
    pred = None
    for lang in langs:
        others = [F.col(f"s_{o}") for o in langs if o != lang]
        cond = F.col(f"s_{lang}") >= F.greatest(*others)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("unknown"))
    return scored.select(
        "doc_id", "lang", pred.alias("pred_lang"), (F.col("lang") == pred).alias("correct")
    )


# Characteristic character-trigram profiles per language. Tiny on purpose:
# the oracle gate checks Spark==DuckDB cell equality; classification
# accuracy scales with profile size, not with the plan shape. (Note: the
# driver's synthetic documents draw the SAME vocabulary for every lang
# label, so content-based accuracy is chance-level on this testdata by
# construction — verified by per-lang trigram distributions being
# indistinguishable. On real corpora the profiles do the work.)
LANG_TRIGRAMS: dict[str, list[str]] = {
    "en": ["the", "ing", "and", " th", "ion"],
    "es": [" de", "que", "ión", " la", "los"],
    "fr": [" le", "les", "ent", "que", " de"],
    "de": ["der", "und", "sch", "ich", "ein"],
    "zh": ["zh", "sh", "ng ", " sh", " zh"],
}


def _lang_ngram_oracle() -> str:
    cols = ",\n           ".join(
        f"CAST(len(list_filter(grams, x -> list_contains({tris!r}, x))) AS BIGINT) AS g_{lang}"
        for lang, tris in LANG_TRIGRAMS.items()
    )
    langs = list(LANG_TRIGRAMS)
    pred = "CASE "
    for lang in langs:
        others = [f"g_{o}" for o in langs if o != lang]
        pred += f"WHEN g_{lang} >= greatest({', '.join(others)}) THEN '{lang}' "
    pred += "ELSE 'unknown' END"
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
      FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             [substr(norm, i, 3) for i in generate_series(1, len(norm) - 2)] AS grams
      FROM t WHERE len(norm) >= 3
    ),
    scored AS (SELECT doc_id, lang, {cols} FROM g)
    SELECT doc_id, lang, {pred} AS pred_lang, (lang = ({pred})) AS correct
    FROM scored
    """


@register(
    "lang_id_char_ngrams",
    oracle=_lang_ngram_oracle(),
    doc="Character-trigram language ID (the n-gram heuristic proper): "
    "slide a 3-char window over the normalized text, count hits against "
    "per-language trigram profiles, argmax with fixed precedence. The "
    "gram extraction is transform(sequence(...)) + substring — all "
    "JVM-side higher-order functions, no explode: the grams array lives "
    "inside one row, so the plan is scan + project with zero shuffles.",
    tags=("text",),
)
def lang_id_char_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", norm.alias("norm"))
        .filter(F.length("norm") >= 3)
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length("norm") - 2),
        lambda i: F.substring(F.col("norm"), i, F.lit(3)),
    )
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            F.size(
                F.filter(grams, lambda x: F.array_contains(F.array(*[F.lit(t) for t in tris]), x))
            )
            .cast("bigint")
            .alias(f"g_{lang}")
            for lang, tris in LANG_TRIGRAMS.items()
        ],
    )
    langs = list(LANG_TRIGRAMS)
    pred = None
    for lang in langs:
        others = [F.col(f"g_{o}") for o in langs if o != lang]
        cond = F.col(f"g_{lang}") >= F.greatest(*others)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit("unknown"))
    return scored.select(
        "doc_id", "lang", pred.alias("pred_lang"), (F.col("lang") == pred).alias("correct")
    )


WINNOW_K = 5  # char k-gram size
WINNOW_W = 4  # winnowing window (minima over w consecutive hashes)


@register(
    "doc_winnowing_fingerprints",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             list_transform(
               [substr(norm, i, {WINNOW_K}) for i in generate_series(1, len(norm) - {WINNOW_K - 1})],
               g -> CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)
             ) AS hashes
      FROM t WHERE len(norm) >= {WINNOW_K + WINNOW_W - 1}
    ),
    fp AS (
      SELECT doc_id,
             list_sort(list_distinct(
               [list_min(hashes[j:j+{WINNOW_W - 1}]) for j in generate_series(1, len(hashes) - {WINNOW_W - 1})]
             )) AS fps
      FROM h
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fps,
           md5(array_to_string(fps, ',')) AS fp_md5
    FROM fp
    """,
    doc="MOSS-style winnowing fingerprints: hash every 5-char k-gram "
    "(rolling-hash stand-in: 32-bit md5 prefix), take the minimum of "
    "each window of 4 consecutive hashes, keep the distinct minima. "
    "Winnowing guarantees any shared substring of length k+w-1 yields a "
    "shared fingerprint — the basis of local (not whole-doc) plagiarism "
    "and near-dup detection. Entirely JVM-side higher-order functions "
    "over per-row arrays: zero shuffles, zero Python.",
    tags=("text", "dedup"),
)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", norm.alias("norm"))
        .filter(F.length("norm") >= WINNOW_K + WINNOW_W - 1)
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.length("norm") - (WINNOW_K - 1)),
        lambda i: F.substring(F.col("norm"), i, F.lit(WINNOW_K)),
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(F.encode(g, "utf-8")), 1, 8), 16, 10).cast(
            "bigint"
        ),
    )
    docs = docs.select("doc_id", hashes.alias("hashes"))
    minima = F.transform(
        F.sequence(F.lit(1), F.size("hashes") - (WINNOW_W - 1)),
        lambda j: F.array_min(F.slice("hashes", j, WINNOW_W)),
    )
    fps = F.array_sort(F.array_distinct(minima))
    return docs.select(
        "doc_id",
        F.size(fps).cast("bigint").alias("n_fps"),
        F.md5(
            F.encode(
                F.concat_ws(",", F.transform(fps, lambda x: x.cast("string"))), "utf-8"
            )
        ).alias("fp_md5"),
    )


@register(
    "dataset_split_assign",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="Deterministic 80/10/10 train/val/test split by md5 bucket of the "
    "doc id — the reproducible-split primitive every training pipeline "
    "needs: membership is a pure function of the id, so re-runs, "
    "backfills, and other engines (the oracle re-derives it) agree "
    "row-for-row, and no shuffle or RNG state is involved. Zero-shuffle "
    "narrow projection.",
    tags=("text", "split"),
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


@register(
    "doc_fingerprint",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
    FROM t
    """,
    doc="Document fingerprint: md5 over the sorted distinct vocabulary — a "
    "bag-of-words rolling-hash analog that is permutation-invariant, so "
    "editorially reordered copies collide. Joinable with dedup_exact "
    "output for two-level dedup.",
    tags=("text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", _toks().alias("t"))
    toks = F.col("t")
    return docs.select(
        "doc_id",
        F.md5(
            F.encode(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))), "utf-8")
        ).alias("fingerprint"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
    )


TFIDF_TOPK = 5


@register(
    "text_tfidf_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) AS score,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf * (CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                                         tf.term) AS rn
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score
    FROM scored WHERE rn <= {TFIDF_TOPK}
    """,
    doc=f"Top-{TFIDF_TOPK} characteristic terms per document by TF-IDF "
    "with a log-free inverse-frequency weight (tf * N/df): one IEEE "
    "division and one multiplication, both bit-exact across engines, "
    "where ln() would risk last-bit libm divergence in the oracle "
    "comparison. Shape: explode -> two partial-aggregated groupBys -> "
    "term join -> per-doc window. The term join shuffles on term; at "
    "corpus scale the df side is vocabulary-sized (Zipf: far smaller "
    "than the tf side) and AQE broadcasts it when it fits.",
    tags=("text",),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from osm2orc_spark.operators import switches

    # NOTE(r14): repartition-before-fan-out was tried here and reverted —
    # the REPLICATED plan re-runs the toks subtree once per consumer (tf,
    # df; no ReusedExchange), so the repartition exchange multiplied
    # instead of helping (measured wash-to-worse at sf0.1).
    docs = load(spark, sf_dir, "documents")
    tf_cached = None
    if switches.tokenize_persist(spark, sf_dir):
        # Corpus-scale cutover (r15, VERDICT r14 #6): persist the tf fan
        # so the tokenize runs ONCE, and — since the subtree is now
        # planned once — the repartition-before-fan-out rule applies
        # again (the r14 objection was per-copy multiplication).  tf is
        # the narrow post-aggregate frame (doc_id, term, count), far
        # smaller than the raw token stream it replaces.
        toks = switches.fanout_repartition(spark, sf_dir, docs, "doc_id").select(
            "doc_id", F.explode(_toks()).alias("term")
        )
        tf_cached = (
            toks.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .persist()
        )
        tf = tf_cached
    else:
        toks = docs.select("doc_id", F.explode(_toks()).alias("term"))
        tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.col("tf") * (F.col("n_docs").cast("double") / F.col("df")))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    )
    out = (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "score")
    )
    if tf_cached is not None:
        from osm2orc_spark.operators.cache import release_with

        return release_with(out, tf_cached)
    return out


REPETITION_MAX_RATIO = 0.2  # flag docs whose duplicate-bigram share exceeds this


def _grams_col(tok_col: str):
    """Word-bigram array over a token-array column (the
    text_repetition_scores fan) — factored (r14) for the one-scan
    fusion with ``_quality_cols``.  Callers materialize it into a named
    column FIRST (inlining it into each metric re-runs the transform
    per metric)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tok_col) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(tok_col, i), F.element_at(tok_col, i + 1)
        ),
    )


def _repetition_cols(grams_col: str = "grams") -> list:
    """The text_repetition_scores metric columns over a materialized
    grams column (identical expressions to the registered query; a
    NULL grams array — a doc under 2 tokens in the fused spelling —
    yields NULLs, matching the composed left-join semantics)."""
    n_bi = F.size(grams_col)
    n_uni = F.size(F.array_distinct(grams_col))
    dup_ratio = 1.0 - n_uni.cast("double") / n_bi
    return [
        n_bi.cast("bigint").alias("n_bigrams"),
        n_uni.cast("bigint").alias("n_unique_bigrams"),
        dup_ratio.alias("dup_bigram_ratio"),
        (dup_ratio > REPETITION_MAX_RATIO).alias("flagged"),
    ]



@register(
    "text_repetition_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS tk
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             [tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk) - 1)] AS grams
      FROM t WHERE len(tk) >= 2
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_unique_bigrams,
           1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams) AS dup_bigram_ratio,
           (1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)) > {REPETITION_MAX_RATIO} AS flagged
    FROM g
    """,
    doc="Within-document repetition scoring (the Gopher-rule family): the "
    "share of word bigrams that are repeats of an earlier bigram in the "
    "same document. Boilerplate, keyword stuffing, and generation loops "
    "all push this ratio up; docs above 0.2 are flagged. Pure per-row "
    "array arithmetic (integer counts -> one exact IEEE division), no "
    "shuffle, no UDF — scales as a narrow map over the corpus.",
    tags=("text",),
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", _toks().alias("tk")
    ).filter(F.size("tk") >= 2)
    return docs.select("doc_id", _grams_col("tk").alias("grams")).select(
        "doc_id", *_repetition_cols("grams")
    )


# ---------------------------------------------------------------------------
# BM25 ranking for a fixed query (log-free rational IDF).
# ---------------------------------------------------------------------------
BM25_TERMS = ["spark", "window", "merge"]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
    g  AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term IN ('spark', 'window', 'merge')
      GROUP BY doc_id, term
    ),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ((CAST(g.n_docs - df.df AS DOUBLE) + 0.5) / (CAST(df.df AS DOUBLE) + 0.5))
             * ((CAST(tf.tf AS DOUBLE) * {BM25_K1 + 1.0}) /
                (CAST(tf.tf AS DOUBLE) + {BM25_K1} * ({1.0 - BM25_B} +
                 ({BM25_B} * CAST(dl.dl * g.n_docs AS DOUBLE)) / CAST(g.sum_dl AS DOUBLE)))) AS s
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g
    ),
    per_doc AS (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN term = 'spark'  THEN s END), 0.0)
           + COALESCE(MAX(CASE WHEN term = 'window' THEN s END), 0.0)
           + COALESCE(MAX(CASE WHEN term = 'merge'  THEN s END), 0.0) AS score
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, score FROM per_doc
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
    doc=f"BM25 document ranking for a fixed {len(BM25_TERMS)}-term query "
    f"(k1={BM25_K1}, b={BM25_B}) with the log-free rational IDF "
    "(N-df+0.5)/(df+0.5) — a monotone per-term transform of the classic "
    "log IDF, chosen because ln() risks last-bit libm divergence between "
    "engines (documented divergence; ranking within a term is "
    "unchanged). All aggregates stay integer (tf, df, dl, sum_dl); the "
    "per-row score is a fixed-order IEEE expression, and avgdl division "
    "is rewritten b*dl*N/sum_dl so no intermediate average is "
    "materialized. Per-doc term scores combine via fixed-order "
    "conditional addition, never an unordered double SUM. One tokenize "
    "pass (r14): a single groupBy(doc_id) computes dl and the per-term "
    "tfs together, df and the globals collapse into a 1-row broadcast "
    "aggregate — one exchange, no doc_id joins.",
    tags=("text",),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE tokenize pass (r14, guide §2.3/§2.4): the r13 spelling built
    # dl and tf off separate toks subtrees and joined them back on
    # doc_id, replicating the scan+explode once per consumer (Catalyst
    # plans identical subtrees independently) and paying two doc_id
    # join exchanges.  One groupBy(doc_id) computes dl AND the three
    # per-term tfs; everything downstream is a 1-row broadcast
    # aggregate, so the whole query is one tokenize + one exchange.
    # Score arithmetic is expression-identical per term (same casts,
    # same fixed + order), so results match the registered oracle
    # bit-for-bit.
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(_toks()).alias("term")
    )
    # Aggregate and score expressions ride parsed SQL (r15, guide §7.3):
    # the per-node Column spelling cost ~1.7k py4j round trips per plan
    # build.  Double literals carry the D suffix — a bare 0.5 parses as
    # DECIMAL and would change the score arithmetic.
    per_doc = toks.groupBy("doc_id").agg(
        F.expr("CAST(count(1) AS BIGINT)").alias("dl"),
        *[
            F.expr(
                f"CAST(sum(CASE WHEN (term = '{t}') THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias(f"tf_{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    # per_doc feeds the global aggregate AND the scored rows — persist
    # the narrow (doc_id, 4 ints) frame or the tokenize runs twice.
    per_doc = per_doc.persist()
    g = per_doc.agg(
        F.expr("CAST(count(1) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(sum(dl) AS BIGINT)").alias("sum_dl"),
        *[
            F.expr(
                f"CAST(sum(CASE WHEN (tf_{i} > 0) THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias(f"df_{i}")
            for i in range(len(BM25_TERMS))
        ],
    )

    def term_score(i: int) -> str:
        tfd = f"CAST(tf_{i} AS DOUBLE)"
        s = (
            f"(((CAST(n_docs - df_{i} AS DOUBLE) + 0.5D) / "
            f"(CAST(df_{i} AS DOUBLE) + 0.5D)) * "
            f"(({tfd} * {BM25_K1 + 1.0!r}D) / "
            f"({tfd} + {BM25_K1!r}D * ({1.0 - BM25_B!r}D + "
            f"({BM25_B!r}D * CAST(dl * n_docs AS DOUBLE)) / "
            f"CAST(sum_dl AS DOUBLE)))))"
        )
        return f"(CASE WHEN (tf_{i} > 0) THEN {s} ELSE 0.0D END)"

    matched = per_doc.filter(
        " OR ".join(f"tf_{i} > 0" for i in range(len(BM25_TERMS)))
    )
    return release_with(
        matched.crossJoin(F.broadcast(g))
        .selectExpr(
            "doc_id",
            f"{term_score(0)} + {term_score(1)} + {term_score(2)} AS score",
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK),
        per_doc,
    )


# ---------------------------------------------------------------------------
# PII redaction (regexp_replace chain over the events props JSON).
# ---------------------------------------------------------------------------
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
PII_NUM = r"[0-9]+"


def pii_redact(col):
    """Chained redaction: emails, then phone-shaped runs, then bare digit
    runs. Order matters — the later patterns match inside the earlier
    ones' targets. Pure regexp_replace chain: JVM-side, codegen-fused,
    no UDF."""
    out = F.regexp_replace(col, PII_EMAIL, "[EMAIL]")
    out = F.regexp_replace(out, PII_PHONE, "[PHONE]")
    return F.regexp_replace(out, PII_NUM, "[NUM]")


@register(
    "text_pii_redact",
    oracle=f"""
    SELECT event_id,
           regexp_replace(regexp_replace(regexp_replace(props,
               '{PII_EMAIL}', '[EMAIL]', 'g'),
               '{PII_PHONE.replace("'", "''")}', '[PHONE]', 'g'),
               '{PII_NUM}', '[NUM]', 'g') AS redacted,
           CAST(len(regexp_extract_all(props, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(props, '{PII_NUM}')) AS BIGINT) AS n_nums
    FROM events
    """,
    doc="PII redaction over the events props JSON: a chained "
    "regexp_replace (emails -> phone-shaped runs -> bare digit runs) "
    "plus per-row match counts. The whole operator is a narrow "
    "projection fused into the scan's codegen — no UDF, no shuffle; at "
    "100 TB this runs at scan speed. Patterns are RE2-compatible "
    "character classes so Spark (Java regex) and DuckDB (RE2) agree "
    "exactly. The synthetic props only exercise the digit-run arm; the "
    "email/phone arms are unit-tested on crafted literals "
    "(tests/test_advanced.py).",
    tags=("text",),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        pii_redact(F.col("props")).alias("redacted"),
        F.regexp_count("props", F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count("props", F.lit(PII_NUM)).cast("bigint").alias("n_nums"),
    )


# ---------------------------------------------------------------------------
# Corpus-wide n-gram vocabulary: the BPE/tokenizer-training corpus stat.
# ---------------------------------------------------------------------------
NGRAM_VOCAB_K = 100  # vocabulary candidates kept


@register(
    "text_ngram_vocab",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    b AS (
      SELECT doc_id, toks[g] || ' ' || toks[g + 1] AS ngram
      FROM t CROSS JOIN unnest(generate_series(1, len(toks) - 1)) AS u(g)
    )
    SELECT ngram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM b
    GROUP BY ngram
    ORDER BY n_occurrences DESC, ngram
    LIMIT {NGRAM_VOCAB_K}
    """,
    doc=f"Corpus-wide top-{NGRAM_VOCAB_K} word bigrams with occurrence and "
    "document frequency — the merge-candidate statistic a BPE/tokenizer "
    "training pass computes over the whole corpus. Plan shape: explode "
    "bigrams (adjacent-pair transform over the shared whitespace "
    "tokenization), ONE groupBy(ngram) with map-side partial counts, "
    "then a TakeOrdered top-k with total-order tie-break (count DESC, "
    "ngram ASC). The shuffle key is the ngram itself (uniform unless the "
    "corpus is degenerate); count-distinct doc_id rides the same "
    "exchange via partial aggregation. At 100 TB this is the canonical "
    "two-phase scan: no driver state, top-k never materializes the full "
    "vocabulary.",
    tags=("text",),
)
def text_ngram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm2orc_spark.operators import switches

    # Repartition before the bigram fan-out (r14), gated on the scan
    # split count (r15 — see switches.fanout_repartition).
    docs = switches.fanout_repartition(
        spark, sf_dir, load(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", _toks().alias("t"))
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i])) "
                "ELSE array() END"
            )
        ).alias("ngram"),
    )
    return (
        bigrams.groupBy("ngram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(NGRAM_VOCAB_K)
    )


# ---------------------------------------------------------------------------
# Bigram-LM coverage: the oracle-safe perplexity proxy. A KenLM-style
# quality filter scores documents by how well a corpus LM predicts them;
# log-prob needs ln() (libm last-bit risk across engines), so this scores
# the rational statistic instead: the fraction of a document's word
# bigrams whose corpus document-frequency is >= BIGRAM_MIN_DF. Rare-bigram
# documents (low coverage) are the high-perplexity outliers.
# ---------------------------------------------------------------------------
BIGRAM_MIN_DF = 3


@register(
    "text_bigram_coverage",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    b AS (
      SELECT doc_id, toks[g] || ' ' || toks[g + 1] AS ngram
      FROM t CROSS JOIN unnest(generate_series(1, len(toks) - 1)) AS u(g)
    ),
    df AS (
      SELECT ngram, COUNT(DISTINCT doc_id) AS doc_freq FROM b GROUP BY ngram
    ),
    cov AS (
      SELECT b.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(CASE WHEN df.doc_freq >= {BIGRAM_MIN_DF} THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM b JOIN df ON df.ngram = b.ngram
      GROUP BY b.doc_id
    )
    SELECT d.doc_id,
           COALESCE(c.n_bigrams, 0) AS n_bigrams,
           COALESCE(c.n_covered, 0) AS n_covered,
           CASE WHEN c.n_bigrams > 0
                THEN CAST(c.n_covered AS DOUBLE) / c.n_bigrams END AS coverage
    FROM documents d LEFT JOIN cov c ON c.doc_id = d.doc_id
    """,
    doc=f"Corpus bigram-LM coverage score (perplexity proxy, quality "
    f"filter): per doc, the fraction of word bigrams whose corpus "
    f"doc-frequency is >= {BIGRAM_MIN_DF}. Plan: one bigram explode "
    "feeds BOTH the doc-frequency aggregate and the per-doc rollup; the "
    "df join shuffles on the ngram (uniform key), the final agg on "
    "doc_id. Counts are exact integers; the single ratio division is "
    "IEEE-exact on ints < 2^53, so both engines agree bitwise. At 100 TB "
    "this is TF-IDF's plan shape with a threshold instead of a log.",
    tags=("text",),
)
def text_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOTE(r14): repartition-before-fan-out tried and reverted — bigrams
    # feeds three consumer subtrees (df, cov, final join) with no
    # ReusedExchange, so the exchange multiplied (see text_tfidf_topk).
    # NOTE(r15, VERDICT r14 #6): the tokenize_persist cutover that
    # text_tfidf_topk adopted was tried here TWO ways at the x64 XL twin
    # and lost both: persisting the exploded bigram fan min 8.98 vs 5.89s
    # replicate (the r5 "wide exploded frames lose to recompute" rule),
    # and persisting the narrow (doc_id, ngram, c) post-aggregate min
    # 11.77 vs 6.78s — bigrams are ~unique within a doc, so the aggregate
    # does not reduce the stream and the persist path just adds an
    # exchange plus a corpus-sized cache build.  The replicated tokenize
    # is the measured-right shape for this query at every SF tried.
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _toks().alias("t"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) >= 2 THEN "
                "transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i])) "
                "ELSE array() END"
            )
        ).alias("ngram"),
    )
    df = bigrams.groupBy("ngram").agg(
        F.countDistinct("doc_id").alias("doc_freq")
    )
    cov = (
        bigrams.join(df, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("doc_freq") >= BIGRAM_MIN_DF, 1).otherwise(0)
            ).alias("n_covered"),
        )
    )
    return docs.select("doc_id").join(cov, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        F.coalesce("n_covered", F.lit(0)).cast("bigint").alias("n_covered"),
        F.when(
            F.col("n_bigrams") > 0,
            F.col("n_covered").cast("double") / F.col("n_bigrams"),
        ).alias("coverage"),
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix + per-language recall.
# ---------------------------------------------------------------------------
@register(
    "lang_confusion_matrix",
    oracle=f"""
    WITH scored AS ({_lang_scores_sql()}),
    cells AS (
      SELECT lang, pred_lang, COUNT(*) AS n
      FROM scored GROUP BY lang, pred_lang
    ),
    totals AS (SELECT lang, SUM(n) AS lang_total FROM cells GROUP BY lang)
    SELECT c.lang, c.pred_lang, c.n,
           CAST(FLOOR((1e6 * c.n) / t.lang_total) AS BIGINT) AS frac_micro
    FROM cells c JOIN totals t USING (lang)
    ORDER BY c.lang, c.pred_lang
    """,
    doc="Confusion matrix of the stopword language-ID against the labeled "
    "lang column, with each cell's share of its true-language row "
    "(micro units, one IEEE division from exact integer counts). The "
    "classifier-eval shape every labeling pipeline needs: a |langs|^2 "
    "aggregate after the per-row scorer, so the only data-sized work is "
    "the scan itself.",
    tags=("text", "eval"),
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = lang_id_heuristic(spark, sf_dir)
    cells = pred.groupBy("lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))
    totals = cells.groupBy("lang").agg(F.sum("n").alias("lang_total"))
    return (
        cells.join(F.broadcast(totals), "lang")
        .select(
            "lang",
            "pred_lang",
            "n",
            F.floor((F.lit(1e6) * F.col("n")) / F.col("lang_total"))
            .cast("bigint")
            .alias("frac_micro"),
        )
        .orderBy("lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# Hashed uni+bigram feature space: the fasttext/DSIR feature extractor.
# Every word and every adjacent word pair hashes (salted md5, 32-bit
# prefix) into one of FEAT_BUCKETS buckets. Shared by the linear quality
# classifier below and curation_dsir_select (operators/curation.py).
# ---------------------------------------------------------------------------
FEAT_BUCKETS = 4096


def _ngrams_uni_bi(toks: str = "t"):
    """Array of unigrams ++ bigrams over a MATERIALIZED token-array column.

    Callers must project ``_toks().alias(toks)`` first: building bigrams
    straight off the split() expression re-tokenizes the whole document
    once per array element inside the transform lambda (O(tokens^2) per
    doc — measured 15s for DSIR at sf0.1 vs ~2s with the column form)."""
    return F.expr(
        f"concat("
        f"  {toks},"
        f"  CASE WHEN size({toks}) >= 2 THEN"
        f"    transform(sequence(1, size({toks}) - 1),"
        f"      i -> concat({toks}[i-1], ' ', {toks}[i]))"
        f"  ELSE array() END)"
    )


def feature_bucket(ngram_col, salt: str):
    """Salted 32-bit md5 prefix -> bucket in [0, FEAT_BUCKETS)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.encode(F.concat(F.lit(salt + ":"), ngram_col), "utf-8")), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % FEAT_BUCKETS
    )


# DuckDB twin of the exploded (doc_id, source, bucket) feature stream.
# {salt} is interpolated by the registering operator.
_DUCK_FEATS = """
  t AS (
    SELECT doc_id, source,
           string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
    FROM documents
  ),
  feats AS (
    SELECT doc_id, source,
           CAST(concat('0x', substr(md5('{salt}:' || ngram), 1, 8)) AS BIGINT) % {buckets} AS b
    FROM (
      SELECT doc_id, source,
             unnest(list_concat(
               toks,
               list_transform(generate_series(1, len(toks) - 1),
                              g -> toks[g] || ' ' || toks[g + 1])
             )) AS ngram
      FROM t
    )
  )
"""


# ---------------------------------------------------------------------------
# Linear quality classifier over hashed features (fasttext-style).
# ---------------------------------------------------------------------------
CLS_WEIGHT_RANGE = 2001  # weights in [-1000, 1000]


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH {_DUCK_FEATS.format(salt="qcls", buckets=FEAT_BUCKETS)},
    weighted AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5('qw:' || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)
               % {CLS_WEIGHT_RANGE} - 1000 AS w
      FROM feats
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(w) AS BIGINT) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_feats
      FROM weighted GROUP BY doc_id
    )
    SELECT doc_id, score, n_feats, score > 0 AS keep FROM scored
    """,
    doc="Model-based quality filter: a linear classifier over hashed "
    f"uni+bigram features ({FEAT_BUCKETS} buckets), the fasttext-style "
    "gate LLM corpus builds run after heuristic filters. Each feature "
    "bucket carries one weight; a document's score is the sum of its "
    "feature weights and keep = score > 0. The weights here are a "
    "deterministic md5-derived stand-in (the container has no trained "
    "model); production swaps in learned weights — as a broadcast "
    "bucket->weight table or, as here, a pure expression — without "
    "touching the plan shape. Everything is integer arithmetic on "
    "builtin expressions: tokenize, hash, sum, one groupBy(doc_id) with "
    "map-side partial aggregation. No weight-table join is needed when "
    "the weight is a function of the bucket, so the whole classifier is "
    "scan + one shuffle on doc_id at any corpus size.",
    tags=("text", "curation"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm2orc_spark.operators import switches

    # Repartition before the ngram fan-out (r14), gated on the scan
    # split count (r15 — see switches.fanout_repartition).
    docs = switches.fanout_repartition(
        spark, sf_dir, load(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", _toks().alias("t"))
    ex = docs.select("doc_id", F.explode(_ngrams_uni_bi("t")).alias("ngram"))
    b = feature_bucket(F.col("ngram"), "qcls")
    w = (
        F.conv(
            F.substring(F.md5(F.encode(F.concat(F.lit("qw:"), b.cast("string")), "utf-8")), 1, 8),
            16,
            10,
        ).cast("bigint")
        % CLS_WEIGHT_RANGE
        - 1000
    )
    return (
        ex.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.sum("w").cast("bigint").alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
        )
        .select("doc_id", "score", "n_feats", (F.col("score") > 0).alias("keep"))
    )
