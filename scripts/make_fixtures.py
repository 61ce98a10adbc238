"""Generate committed OSM fixtures under fixtures/.

Raw ingest files (tiny.osm.pbf, changesets.osm.xml) plus parquet copies
of the three OSM tables, produced BY the ingest pipeline itself (PBF/XML
-> DataFrame -> parquet), so the committed tables are also a regression
artifact of the sources. planet = latest visible version per (type,id)
of planet_history (snapshot semantics, reference README.md:30-47).

Run: python scripts/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from osm2orc_spark.fixtures import (
    write_pbf_cs_fixture,
    write_pbf_fixture,
    write_xml_fixture,
)
from osm2orc_spark.session import get_spark
from osm2orc_spark.sources.changeset_xml import read_changesets
from osm2orc_spark.sources.pbf import read_pbf

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def main() -> None:
    os.makedirs(FIXTURES, exist_ok=True)
    pbf = os.path.join(FIXTURES, "tiny.osm.pbf")
    xml = os.path.join(FIXTURES, "changesets.osm.xml")
    n_entities = write_pbf_fixture(pbf)
    n_changesets = write_xml_fixture(xml)

    spark = get_spark(app_name="make_fixtures")
    history = read_pbf(spark, pbf)
    history.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(FIXTURES, "planet_history.parquet")
    )

    w = W.partitionBy("type", "id").orderBy(F.desc("version"))
    planet = (
        history.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & F.col("visible"))
        .drop("rn")
    )
    planet.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(FIXTURES, "planet.parquet")
    )

    # mixed-entity history incl. ChangeSet entities (reference TODO's
    # entity-table half): separate small PBF so tiny.osm.pbf's row
    # counts (goldens, CLI 1788-row contract) stay untouched
    pbf_cs = os.path.join(FIXTURES, "tiny_cs.osm.pbf")
    n_cs_entities = write_pbf_cs_fixture(pbf_cs)
    cs_history = read_pbf(spark, pbf_cs)
    cs_history.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(FIXTURES, "planet_cs_history.parquet")
    )

    changesets = read_changesets(spark, xml)
    changesets.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(FIXTURES, "changesets.parquet")
    )
    # opt-in discussion surface (reference TODO, OsmPbf2Orc.java:193-195):
    # same XML through the same pipeline with include_discussion=True
    discussion = read_changesets(spark, xml, include_discussion=True)
    discussion.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(FIXTURES, "changesets_discussion.parquet")
    )
    print(
        f"fixtures: {n_entities} history rows, {planet.count()} snapshot rows, "
        f"{n_cs_entities} mixed-entity rows, "
        f"{n_changesets} changesets "
        f"({discussion.selectExpr('sum(size(comments))').collect()[0][0]} comments)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
