"""The reference README's sample-query corpus (reference README.md:74-242)
over the committed OSM fixture tables.

These are the queries the reference's users actually run on its ORC
output via Athena/Presto (README.md:25-26,72) — the query-capability
contract of SURVEY.md §2C. Bbox constants are rescaled to the fixture's
coordinate range (FIXTURES.md §4); the Liberty-Island changeset query
keeps the README's exact constants (README.md:238-241) because the
fixture plants changesets inside that bbox.

The fixture tables are produced by scripts/make_fixtures.py *through the
ingest pipeline* (PBF/XML -> source -> parquet), so oracle agreement here
also certifies the sources' cell semantics. sf_dir is ignored — these
tables are scale-invariant fixtures, not TPC-H derivatives.

Output shaping for the hash gate: map/array columns are projected to
deterministic scalars (counts, 'lat,lon;...' strings via exact
decimal->string casts) — the underlying plans still exercise the
README's operator set (CTE chains, posexplode-with-ordinality, self-join
vs derived MAX, arbitrary(), order-sensitive array_agg, UNION ALL,
ORDER BY CASE).
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from osm2orc_spark.registry import register

# Resolved relative to the repo root (two levels above this package) so
# the registered queries and their oracle SQL work from any CWD / checkout
# location, not just /root/repo.
FIXTURES = str(pathlib.Path(__file__).resolve().parents[2] / "fixtures")

_PLANET = f"read_parquet('{FIXTURES}/planet.parquet/*.parquet')"
_HISTORY = f"read_parquet('{FIXTURES}/planet_history.parquet/*.parquet')"
_CHANGESETS = f"read_parquet('{FIXTURES}/changesets.parquet/*.parquet')"

# fixture-scaled bbox (README's -121.4024..-121.2483 / 43.9992..44.1250
# rescaled to the fixture coordinate pool)
BBOX_LON = ("-74.0500000", "-74.0400000")
BBOX_LAT = ("40.6850000", "40.6950000")


def _planet(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(f"{FIXTURES}/planet.parquet")


def _history(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(f"{FIXTURES}/planet_history.parquet")


def _changesets(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(f"{FIXTURES}/changesets.parquet")


# ---------------------------------------------------------------------------
# README.md:79-139 — "Re-assemble Ways": 5-CTE chain, nodes-in-bbox,
# CROSS JOIN UNNEST WITH ORDINALITY, arbitrary(), ordered array_agg,
# UNION ALL with literal type column (C1,C2,C3,C4,C8,C9,C12,C16,C17,
# C18,C20,C22,C23).
# ---------------------------------------------------------------------------
@register(
    "osm_ways_reassembly",
    oracle=f"""
    WITH nodes AS (
      SELECT id, lat, lon FROM {_PLANET} WHERE type = 'node'
    ),
    ways AS (
      SELECT id, nds FROM {_PLANET} WHERE type = 'way'
    ),
    nodes_in_bbox AS (
      SELECT * FROM nodes
      WHERE lon BETWEEN {BBOX_LON[0]} AND {BBOX_LON[1]}
        AND lat BETWEEN {BBOX_LAT[0]} AND {BBOX_LAT[1]}
    ),
    exploded AS (
      SELECT ways.id,
             generate_subscripts(nds, 1) AS idx,
             unnest(nds).ref AS ref
      FROM ways
    ),
    referenced_ways AS (
      SELECT DISTINCT e.id FROM exploded e JOIN nodes_in_bbox b ON b.id = e.ref
    ),
    exploded_ways AS (
      SELECT e.id, e.idx,
             CAST(n.lat AS VARCHAR) || ',' || CAST(n.lon AS VARCHAR) AS coord
      FROM exploded e
      JOIN referenced_ways r ON r.id = e.id
      JOIN nodes n ON n.id = e.ref
    ),
    ways_in_bbox AS (
      SELECT id,
             string_agg(coord, ';' ORDER BY idx) AS coordinates,
             COUNT(*) AS n_points
      FROM exploded_ways
      GROUP BY id
    )
    SELECT id, 'node' AS type,
           CAST(lat AS VARCHAR) || ',' || CAST(lon AS VARCHAR) AS coordinates,
           CAST(1 AS BIGINT) AS n_points
    FROM nodes_in_bbox
    UNION ALL
    SELECT id, 'way' AS type, coordinates, n_points
    FROM ways_in_bbox
    """,
    doc="README ways-reassembly (README.md:79-139): nodes-in-bbox feed a "
    "posexplode(WITH ORDINALITY) of way node-refs; coordinates re-agg in "
    "nd order. Spark plan: bbox filter pushes to the parquet scan; the "
    "refs join shuffles on node id; array_sort(collect_list(struct(idx,..)))"
    " replaces Presto's ORDER BY+array_agg (order-stable at any "
    "parallelism). Coordinates stringify via exact decimal->string.",
    tags=("osm",),
)
def osm_ways_reassembly(
    spark: SparkSession, sf_dir: str, *, planet: DataFrame | None = None
) -> DataFrame:
    # ``planet`` lets a caller run the README query over an alternative
    # snapshot frame with the same schema — e.g. the ORC round-trip
    # (read_pbf -> write_orc -> spark.read.orc) the e2e ingest bench and
    # test drive — without re-registering the query.
    if planet is None:
        planet = _planet(spark)
    nodes = planet.filter(F.col("type") == "node").select("id", "lat", "lon")
    ways = planet.filter(F.col("type") == "way").select("id", "nds")
    nodes_in_bbox = nodes.filter(
        F.col("lon").between(*BBOX_LON) & F.col("lat").between(*BBOX_LAT)
    )
    # C8: posexplode is 0-based; Presto UNNEST WITH ORDINALITY is 1-based
    exploded = ways.select(
        "id", F.posexplode("nds").alias("pos", "nd")
    ).select("id", (F.col("pos") + 1).alias("idx"), F.col("nd.ref").alias("ref"))
    referenced = (
        exploded.join(nodes_in_bbox.select(F.col("id").alias("nid")), exploded.ref == F.col("nid"))
        .select("id")
        .distinct()
    )
    coord = F.concat_ws(",", F.col("lat").cast("string"), F.col("lon").cast("string"))
    exploded_ways = (
        exploded.join(referenced, "id")
        .join(nodes.select(F.col("id").alias("nid"), "lat", "lon"), F.col("ref") == F.col("nid"))
        .select("id", "idx", coord.alias("coord"))
    )
    ways_in_bbox = exploded_ways.groupBy("id").agg(
        F.concat_ws(
            ";",
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "coord"))),
                lambda s: s["coord"],
            ),
        ).alias("coordinates"),
        F.count(F.lit(1)).alias("n_points"),
    )
    node_rows = nodes_in_bbox.select(
        "id",
        F.lit("node").alias("type"),
        coord.alias("coordinates"),
        F.lit(1).cast("bigint").alias("n_points"),
    )
    way_rows = ways_in_bbox.select("id", F.lit("way").alias("type"), "coordinates", "n_points")
    return node_rows.unionByName(way_rows)


# ---------------------------------------------------------------------------
# README.md:151-155 — tracktype usage by month (C5,C13,C14,C21).
# ---------------------------------------------------------------------------
@register(
    "osm_tag_usage_by_month",
    oracle=f"""
    SELECT date_trunc('month', "timestamp") AS month, COUNT(*) AS count
    FROM {_HISTORY}
    WHERE tags['tracktype'][1] IS NOT NULL
    GROUP BY date_trunc('month', "timestamp")
    ORDER BY month
    """,
    doc="README tag-usage-by-month (README.md:151-155): map-subscript "
    "IS NOT NULL filter + date_trunc group. The map filter evaluates "
    "pre-shuffle; only (month, partial count) rows move.",
    tags=("osm",),
)
def osm_tag_usage_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _history(spark)
    return (
        hist.filter(F.col("tags")["tracktype"].isNotNull())
        .groupBy(F.date_trunc("month", "timestamp").alias("month"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# README.md:162-184 — latest version of all non-deleted entities:
# self-join against derived MAX aggregate + ORDER BY CASE (C7,C10,C11,
# C13,C15,C19,C24).
# ---------------------------------------------------------------------------
@register(
    "osm_latest_versions",
    oracle=f"""
    SELECT planet.id, planet.type, planet.changeset, planet."timestamp",
           planet.uid, planet."user", planet.version, planet.visible
    FROM {_HISTORY} planet
    INNER JOIN (
      SELECT id, type, MAX(version) AS version
      FROM {_HISTORY}
      GROUP BY type, id
    ) latest
      ON planet.id = latest.id
     AND planet.version = latest.version
     AND planet.type = latest.type
    WHERE planet.visible = true
    ORDER BY CASE planet.type
               WHEN 'node' THEN 1 WHEN 'way' THEN 2
               WHEN 'relation' THEN 3 ELSE 4 END,
             planet.id
    """,
    doc="README latest-versions (README.md:162-184): 3-column composite "
    "self-join against a derived MAX, boolean filter, ORDER BY CASE "
    "precedence. Both sides shuffle on (type,id); the idiomatic "
    "single-shuffle window alternative is osm_latest_versions_window.",
    tags=("osm",),
)
def osm_latest_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _history(spark)
    latest = hist.groupBy("type", "id").agg(F.max("version").alias("version"))
    prec = (
        F.when(F.col("type") == "node", 1)
        .when(F.col("type") == "way", 2)
        .when(F.col("type") == "relation", 3)
        .otherwise(4)
    )
    return (
        hist.join(latest, ["id", "version", "type"])
        .filter(F.col("visible") == True)  # noqa: E712 — README's `visible = true`
        .select("id", "type", "changeset", "timestamp", "uid", "user", "version", "visible")
        .orderBy(prec, "id")
    )


@register(
    "osm_latest_versions_window",
    oracle=f"""
    SELECT id, type, changeset, "timestamp", uid, "user", version, visible
    FROM {_HISTORY}
    QUALIFY ROW_NUMBER() OVER (PARTITION BY type, id ORDER BY version DESC) = 1
       AND visible = true
    ORDER BY CASE type WHEN 'node' THEN 1 WHEN 'way' THEN 2
                       WHEN 'relation' THEN 3 ELSE 4 END, id
    """,
    doc="Latest-versions via window row_number (C11-alt, SURVEY §2C): one "
    "shuffle on (type,id) instead of the agg-join's two; identical result "
    "set to osm_latest_versions by construction (version is unique per key).",
    tags=("osm",),
)
def osm_latest_versions_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _history(spark)
    w = W.partitionBy("type", "id").orderBy(F.desc("version"))
    prec = (
        F.when(F.col("type") == "node", 1)
        .when(F.col("type") == "way", 2)
        .when(F.col("type") == "relation", 3)
        .otherwise(4)
    )
    return (
        hist.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & F.col("visible"))
        .select("id", "type", "changeset", "timestamp", "uid", "user", "version", "visible")
        .orderBy(prec, "id")
    )


# ---------------------------------------------------------------------------
# README.md:190-213 — deleted-entity count (the "will probably time out"
# query; C7,C14 over the same latest-version join).
# ---------------------------------------------------------------------------
@register(
    "osm_deleted_count",
    oracle=f"""
    WITH latest AS (
      SELECT planet.id, planet.type
      FROM {_HISTORY} planet
      INNER JOIN (
        SELECT id, type, MAX(version) AS version
        FROM {_HISTORY}
        GROUP BY type, id
      ) latest
        ON planet.id = latest.id
       AND planet.version = latest.version
       AND planet.type = latest.type
      WHERE planet.visible = false
    )
    SELECT COUNT(*) AS deleted_count FROM latest
    """,
    doc="README deleted-entities count (README.md:190-213). Athena 'will "
    "probably time out' on this at planet scale (README.md:187); the Spark "
    "plan pre-aggregates MAX map-side and the final count is a single "
    "scalar — no global sort, no timeout cliff.",
    tags=("osm",),
)
def osm_deleted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _history(spark)
    latest = hist.groupBy("type", "id").agg(F.max("version").alias("version"))
    return (
        hist.join(latest, ["id", "version", "type"])
        .filter(F.col("visible") == False)  # noqa: E712
        .agg(F.count(F.lit(1)).alias("deleted_count"))
    )


# ---------------------------------------------------------------------------
# README.md:217-222 / 226-230 / 234-241 — the three changeset queries
# (C4,C5,C6,C14,C26).
# ---------------------------------------------------------------------------
@register(
    "osm_changesets_with_comment",
    oracle=f"""
    SELECT COUNT(*) AS count
    FROM {_CHANGESETS}
    WHERE tags['comment'][1] IS NOT NULL
    """,
    doc="README comment-tag count (README.md:217-222): map-subscript "
    "existence filter + count.",
    tags=("osm",),
)
def osm_changesets_with_comment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _changesets(spark)
        .filter(F.col("tags")["comment"].isNotNull())
        .agg(F.count(F.lit(1)).alias("count"))
    )


@register(
    "osm_changesets_josm",
    oracle=f"""
    SELECT COUNT(*) AS count
    FROM {_CHANGESETS}
    WHERE tags['created_by'][1] LIKE 'JOSM%'
    """,
    doc="README JOSM-changesets count (README.md:226-230): LIKE-prefix on "
    "a map value.",
    tags=("osm",),
)
def osm_changesets_josm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _changesets(spark)
        .filter(F.col("tags")["created_by"].like("JOSM%"))
        .agg(F.count(F.lit(1)).alias("count"))
    )


@register(
    "osm_changesets_liberty_island",
    oracle=f"""
    SELECT COUNT(id) AS count
    FROM {_CHANGESETS}
    WHERE min_lon BETWEEN -74.0474545 AND -74.0433990
      AND max_lon BETWEEN -74.0474545 AND -74.0433990
      AND min_lat BETWEEN 40.6884971 AND 40.6911817
      AND max_lat BETWEEN 40.6884971 AND 40.6911817
    """,
    doc="README Liberty-Island changesets (README.md:234-241) with the "
    "README's exact decimal constants — the 4-way conjunctive BETWEEN "
    "pushes down to the parquet scan as min/max range predicates.",
    tags=("osm",),
)
def osm_changesets_liberty_island(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = _changesets(spark)
    return cs.filter(
        F.col("min_lon").between("-74.0474545", "-74.0433990")
        & F.col("max_lon").between("-74.0474545", "-74.0433990")
        & F.col("min_lat").between("40.6884971", "40.6911817")
        & F.col("max_lat").between("40.6884971", "40.6911817")
    ).agg(F.count("id").alias("count"))


# ---------------------------------------------------------------------------
# README.md:158-159 — the declared aspiration: count tag ADDITIONS (not
# edits) with a window function (C25).
# ---------------------------------------------------------------------------
@register(
    "osm_tag_additions_window",
    oracle=f"""
    WITH seq AS (
      SELECT type, id, version, "timestamp",
             (tags['tracktype'][1] IS NOT NULL) AS has_tag,
             LAG(tags['tracktype'][1] IS NOT NULL) OVER (
               PARTITION BY type, id ORDER BY version) AS prev_has
      FROM {_HISTORY}
    )
    SELECT date_trunc('month', "timestamp") AS month, COUNT(*) AS additions
    FROM seq
    WHERE has_tag AND (prev_has IS NULL OR NOT prev_has)
    GROUP BY date_trunc('month', "timestamp")
    ORDER BY month
    """,
    doc="README's window-function aspiration (README.md:158-159): count "
    "tracktype ADDITIONS by lag-comparing consecutive versions — an edit "
    "that keeps the tag doesn't count. One shuffle on (type,id) serves "
    "lag; the monthly rollup re-aggregates map-side.",
    tags=("osm",),
)
def osm_tag_additions_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _history(spark)
    w = W.partitionBy("type", "id").orderBy("version")
    has = F.col("tags")["tracktype"].isNotNull()
    seq = hist.select(
        "type", "id", "version", "timestamp", has.alias("has_tag")
    ).withColumn("prev_has", F.lag("has_tag").over(w))
    return (
        seq.filter(F.col("has_tag") & (F.col("prev_has").isNull() | ~F.col("prev_has")))
        .groupBy(F.date_trunc("month", "timestamp").alias("month"))
        .agg(F.count(F.lit(1)).alias("additions"))
        .orderBy("month")
    )


SNAPSHOT_TS = "2017-06-01 00:00:00"


@register(
    "osm_snapshot_at",
    oracle=f"""
    SELECT id, type, changeset, "timestamp", uid, "user", version, visible
    FROM {_HISTORY}
    WHERE "timestamp" <= TIMESTAMP '{SNAPSHOT_TS}'
    QUALIFY ROW_NUMBER() OVER (PARTITION BY type, id
                               ORDER BY version DESC) = 1
       AND visible = true
    ORDER BY CASE type WHEN 'node' THEN 1 WHEN 'way' THEN 2
                       WHEN 'relation' THEN 3 ELSE 4 END, id
    """,
    doc="State of the map at time T: the highest version of each entity "
    f"authored on or before {SNAPSHOT_TS}, visible rows only — the "
    "time-travel query the reference's full-history ORC layout exists to "
    "serve (README's historical-analysis use case generalized from "
    "'latest' to 'as of T'). Same single-shuffle window plan as "
    "osm_latest_versions_window, with the timestamp predicate pushed to "
    "the scan so only pre-T row groups are read.",
    tags=("osm",),
)
def osm_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = _history(spark).filter(F.col("timestamp") <= F.lit(SNAPSHOT_TS).cast("timestamp"))
    rn = F.row_number().over(
        W.partitionBy("type", "id").orderBy(F.desc("version"))
    )
    prec = (
        F.when(F.col("type") == "node", 1)
        .when(F.col("type") == "way", 2)
        .when(F.col("type") == "relation", 3)
        .otherwise(4)
    )
    return (
        hist.withColumn("rn", rn)
        .filter((F.col("rn") == 1) & (F.col("visible") == True))  # noqa: E712
        .select("id", "type", "changeset", "timestamp", "uid", "user", "version", "visible")
        .orderBy(prec, "id")
    )


# ---------------------------------------------------------------------------
# Way bounding boxes — the bbox-materialization pass Athena users run
# before spatial filtering (the README's bbox queries repeatedly re-derive
# node containment; materializing per-way envelopes is the standard
# downstream optimization).
# ---------------------------------------------------------------------------
@register(
    "osm_way_bbox",
    oracle=f"""
    WITH nodes AS (
      SELECT id, lat, lon FROM {_PLANET} WHERE type = 'node'
    ),
    ways AS (
      SELECT id, unnest(nds).ref AS ref FROM {_PLANET} WHERE type = 'way'
    )
    SELECT w.id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(MIN(n.lat) AS VARCHAR) AS min_lat,
           CAST(MAX(n.lat) AS VARCHAR) AS max_lat,
           CAST(MIN(n.lon) AS VARCHAR) AS min_lon,
           CAST(MAX(n.lon) AS VARCHAR) AS max_lon
    FROM ways w JOIN nodes n ON n.id = w.ref
    GROUP BY w.id
    """,
    doc="Per-way bounding-box materialization: explode way node-refs, "
    "join node coordinates (shuffle on node id -- uniform key), one "
    "groupBy(way id) with exact DECIMAL min/max envelopes, stringified "
    "via the exact decimal->string cast. Plan: two scans of the planet "
    "table with type pushdown, one join shuffle, one agg shuffle; at "
    "planet scale both keys are uniform and the agg is partial-ized "
    "map-side. Dangling refs (nodes outside the extract) drop via the "
    "inner join, matching Athena behavior on extracts.",
    tags=("osm",),
)
def osm_way_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    planet = _planet(spark)
    nodes = planet.filter(F.col("type") == "node").select(
        F.col("id").alias("nid"), "lat", "lon"
    )
    ways = planet.filter(F.col("type") == "way").select(
        "id", F.explode("nds").alias("nd")
    ).select("id", F.col("nd.ref").alias("ref"))
    return (
        ways.join(nodes, ways.ref == nodes.nid)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("lat").cast("string").alias("min_lat"),
            F.max("lat").cast("string").alias("max_lat"),
            F.min("lon").cast("string").alias("min_lon"),
            F.max("lon").cast("string").alias("max_lon"),
        )
    )


# ---------------------------------------------------------------------------
# Relation member resolution — the relation analog of ways-reassembly:
# explode members WITH ORDINALITY and resolve each (type, ref) against
# the planet entity table (composite-key join), reporting per-relation
# resolution completeness. Extract consumers run this to find relations
# broken by extract clipping.
# ---------------------------------------------------------------------------
@register(
    "osm_relation_members",
    oracle=f"""
    WITH rels AS (
      SELECT id, members FROM {_PLANET} WHERE type = 'relation'
    ),
    m AS (
      SELECT id,
             generate_subscripts(members, 1) AS idx,
             unnest(members).type AS mtype,
             unnest(members).ref AS mref,
             unnest(members).role AS mrole
      FROM rels
    ),
    resolved AS (
      SELECT m.id, m.idx, m.mtype, m.mrole,
             CASE WHEN p.id IS NOT NULL THEN 1 ELSE 0 END AS ok
      FROM m LEFT JOIN {_PLANET} p ON p.type = m.mtype AND p.id = m.mref
    )
    SELECT id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(ok) AS BIGINT) AS n_resolved,
           CAST(SUM(CASE WHEN mtype = 'node' THEN 1 ELSE 0 END) AS BIGINT) AS n_node_members,
           CAST(SUM(CASE WHEN mrole = 'stop' THEN 1 ELSE 0 END) AS BIGINT) AS n_stop_roles,
           string_agg(mtype || ':' || mrole, ';' ORDER BY idx) AS member_kinds
    FROM resolved
    GROUP BY id
    """,
    doc="Relation member resolution (composite-key join C10 on the OSM "
    "corpus): posexplode members WITH ORDINALITY, LEFT JOIN the planet "
    "table on (type, id) -- the discriminator column is part of the join "
    "key, so partition pruning on type applies to the probe side -- then "
    "per-relation completeness counts and an ordinal-ordered member-kind "
    "signature. Extract clipping shows up as n_resolved < n_members. "
    "Scale: relations are a tiny fraction of the planet; the resolve join "
    "shuffles on (type, id) with uniform keys.",
    tags=("osm",),
)
def osm_relation_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    planet = _planet(spark)
    rels = planet.filter(F.col("type") == "relation").select("id", "members")
    m = rels.select(
        "id", F.posexplode("members").alias("pos0", "mem")
    ).select(
        "id",
        (F.col("pos0") + 1).alias("idx"),
        F.col("mem.type").alias("mtype"),
        F.col("mem.ref").alias("mref"),
        F.col("mem.role").alias("mrole"),
    )
    ents = planet.select(F.col("type").alias("ptype"), F.col("id").alias("pid"))
    resolved = m.join(
        ents, (m.mtype == ents.ptype) & (m.mref == ents.pid), "left"
    ).select(
        "id",
        "idx",
        "mtype",
        "mrole",
        F.when(F.col("pid").isNotNull(), 1).otherwise(0).alias("ok"),
    )
    return resolved.groupBy("id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("ok").cast("bigint").alias("n_resolved"),
        F.sum(F.when(F.col("mtype") == "node", 1).otherwise(0))
        .cast("bigint")
        .alias("n_node_members"),
        F.sum(F.when(F.col("mrole") == "stop", 1).otherwise(0))
        .cast("bigint")
        .alias("n_stop_roles"),
        F.concat_ws(
            ";",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("idx", F.concat_ws(":", "mtype", "mrole").alias("kind"))
                    )
                ),
                lambda s: s.kind,
            ),
        ).alias("member_kinds"),
    )


# ---------------------------------------------------------------------------
# Changeset discussion (the reference's explicit TODO,
# OsmPbf2Orc.java:193-195: "changesets also include discussion, which is
# a list of comments (date, uid, user, text)") — ingested by
# read_changesets(include_discussion=True) through the same pipeline
# that builds the other fixture tables, landed as
# fixtures/changesets_discussion.parquet.  The query exercises the
# nested surface end-to-end: lateral explode WITH ORDINALITY over the
# struct array, struct-field access, per-commenter aggregation, a
# self-reply join-back against the changeset author, and unicode text
# lengths (comment texts carry multi-byte and XML-escaped characters by
# fixture design).
# ---------------------------------------------------------------------------
_DISCUSSION = f"read_parquet('{FIXTURES}/changesets_discussion.parquet/*.parquet')"


@register(
    "osm_changeset_discussions",
    oracle=f"""
    WITH x AS (
      SELECT id AS changeset_id, uid AS author_uid,
             CAST(generate_subscripts(comments, 1) AS BIGINT) AS ord,
             unnest(comments) AS comment
      FROM {_DISCUSSION}
    )
    SELECT comment.uid AS commenter_uid,
           CAST(COUNT(*) AS BIGINT) AS n_comments,
           CAST(COUNT(DISTINCT changeset_id) AS BIGINT) AS n_changesets,
           CAST(SUM(CASE WHEN ord = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_openers,
           CAST(SUM(CASE WHEN comment.uid = author_uid THEN 1 ELSE 0 END) AS BIGINT) AS n_self_replies,
           CAST(SUM(length(comment.text)) AS BIGINT) AS text_chars,
           MIN(comment.date) AS first_comment_at,
           MAX(comment.date) AS last_comment_at
    FROM x
    GROUP BY 1
    ORDER BY n_comments DESC, commenter_uid NULLS FIRST
    """,
    doc="Per-commenter discussion activity over the opt-in changeset "
    "comments array (reference TODO surface): posexplode WITH "
    "ORDINALITY of ARRAY<STRUCT<date,uid,user,text>>, struct-field "
    "projection, openers (ordinality = 1), self-replies (commenter = "
    "changeset author), unicode text lengths, comment-date range. "
    "Anonymous commenters (NULL uid) group as their own row. Scale: "
    "narrow per-row generate then one hash aggregate on commenter_uid "
    "— no join, no window.",
    tags=("osm", "explode"),
)
def osm_changeset_discussions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = spark.read.parquet(f"{FIXTURES}/changesets_discussion.parquet")
    ex = cs.select(
        F.col("id").alias("changeset_id"),
        F.col("uid").alias("author_uid"),
        F.posexplode("comments").alias("pos", "comment"),
    )
    return (
        ex.groupBy(F.col("comment.uid").alias("commenter_uid"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_comments"),
            F.countDistinct("changeset_id").cast("bigint").alias("n_changesets"),
            F.sum(F.when(F.col("pos") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_openers"),
            F.sum(
                F.when(F.col("comment.uid") == F.col("author_uid"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_self_replies"),
            F.sum(F.length(F.col("comment.text"))).cast("bigint").alias("text_chars"),
            F.min("comment.date").alias("first_comment_at"),
            F.max("comment.date").alias("last_comment_at"),
        )
        # NULLS FIRST explicitly on BOTH sides: Spark's ascending default
        # is nulls-first but DuckDB's is nulls-last — the anonymous
        # (NULL-uid) group must not depend on engine defaults if it ever
        # ties on n_comments (r13 review)
        .orderBy(F.desc("n_comments"), F.col("commenter_uid").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# ChangeSet entities in the entity table (the reference TODO's OTHER
# half, OsmPbf2Orc.java:193: "TODO changeset, in which case lat/lon need
# to be zeroed out") — PrimitiveGroup field 5 rows decoded by the PBF
# source with ZEROED (not NULL) coords, empty collections, and Info
# defaults.  fixtures/planet_cs_history.parquet is tiny_cs.osm.pbf
# (nodes+ways+relations+changesets) THROUGH read_pbf, so oracle
# agreement certifies the decode semantics end-to-end.
# ---------------------------------------------------------------------------
_CS_HISTORY = f"read_parquet('{FIXTURES}/planet_cs_history.parquet/*.parquet')"


@register(
    "osm_changeset_entities",
    oracle=f"""
    SELECT type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT id) AS BIGINT) AS n_ids,
           CAST(SUM(CASE WHEN lat = 0 AND lon = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_coord,
           CAST(SUM(CASE WHEN lat IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_coord,
           CAST(SUM(CASE WHEN uid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_anon,
           CAST(SUM(CASE WHEN cardinality(tags) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_untagged,
           CAST(SUM(CASE WHEN version < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_default_version,
           CAST(MIN(id) AS BIGINT) AS min_id,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM {_CS_HISTORY}
    GROUP BY type
    ORDER BY type
    """,
    doc="Per-entity-type profile of the mixed history table that "
    "includes ChangeSet entities (reference TODO surface, "
    "OsmPbf2Orc.java:193): changeset rows must show zeroed (not NULL) "
    "coords, empty tags, NULL uid, and default version; ways/relations "
    "NULL coords; the fixture's one deliberate (0,0) node lands in the "
    "node row's n_zero_coord. No join, no window; COUNT(DISTINCT id) "
    "makes Spark plan the standard distinct-aggregate rewrite — "
    "partial-distinct on (type, id) map-side, then an exchange "
    "proportional to the number of DISTINCT (type, id) pairs (not raw "
    "rows), then the per-type rollup. At planet scale that distinct "
    "exchange is the cost driver; every other measure rides the "
    "map-side partials.",
    tags=("osm", "ingest"),
)
def osm_changeset_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = spark.read.parquet(f"{FIXTURES}/planet_cs_history.parquet")
    zero = F.when(
        (F.col("lat") == 0) & (F.col("lon") == 0), 1
    ).otherwise(0)
    return (
        h.groupBy("type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("id").cast("bigint").alias("n_ids"),
            F.sum(zero).cast("bigint").alias("n_zero_coord"),
            F.sum(F.when(F.col("lat").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null_coord"),
            F.sum(F.when(F.col("uid").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_anon"),
            F.sum(F.when(F.size("tags") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_untagged"),
            F.sum(F.when(F.col("version") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_default_version"),
            F.min("id").cast("bigint").alias("min_id"),
            F.max("id").cast("bigint").alias("max_id"),
        )
        .orderBy("type")
    )
