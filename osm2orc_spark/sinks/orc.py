"""ORC sink with the reference's writer options and user metadata.

Reference behavior reproduced:
- ORC output with block padding disabled (standalone/OsmPbf2Orc.java:85,
  OsmChangesetXml2Orc.java:71) -> write option orc.block.padding=false.
- Bloom filter on tags evaluated-but-disabled (OsmPbf2Orc.java:86,
  osmosis/OrcWriter.java:251) -> exposed as an opt-in flag, off by
  default like the reference shipped.
- ORC user metadata 'osm.schema.version=0.6' (OsmPbf2Orc.java:90) and
  'bounds' = "left, bottom, right, top" when the PBF header has a bbox
  (OsmPbf2Orc.java:122-125). Spark's DataFrameWriter has no user-metadata
  API, so after the distributed write a post-write step rewrites each
  part file through Spark's bundled ``org.apache.orc`` Java writer
  (py4j), stamping the SAME key/value user metadata the reference
  emits — readable by any ``OrcFile.createReader`` / Athena-side
  tooling, exactly like the reference's output. A sidecar
  ``_osm_metadata.json`` is kept as a convenience for non-JVM readers;
  ``read_metadata`` prefers the in-file metadata.

Sorted layout: the reference left 'Sort.Type_then_ID' as commented-out
intent (OsmPbf2Orc.java:93-94); sortWithinPartitions('type','id') is the
cheap Spark realization — it tightens ORC stripe min/max stats so
type/id predicates prune stripes at read time, with no global shuffle.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OSM_SCHEMA_VERSION = "0.6"


def embed_user_metadata(spark: SparkSession, path: str, metadata: dict[str, str]) -> None:
    """Stamp ORC *user metadata* into every ``*.orc`` part file under
    ``path``, matching the reference's ``writer.addUserMetadata`` calls
    (OsmPbf2Orc.java:90,122-125).

    ORC footers are immutable, so each part file is rewritten through
    Spark's bundled ``org.apache.orc`` Java API: stream row batches
    reader->writer (schema and compression preserved), re-add any
    existing user metadata, add ours, then atomically swap via the
    Hadoop FileSystem (works for local paths and object stores alike).

    Scale note (r8: now measured AND parallelized): the e2e_x10 bench
    attribution showed this rewrite — not the distributed ORC encode —
    dominating the PBF->ORC wall (~25s of a ~30s 9M-entity transcode
    when run as a sequential per-file loop; the distributed write itself
    is ~2s). Files are independent, so the rewrite now fans out over a
    driver-side thread pool: py4j gives each Python thread its own
    gateway connection, and the actual read/encode/write work happens in
    JVM threads that run concurrently (the GIL only gates the cheap
    proxy calls). One py4j call per 64k-row batch keeps gateway
    round-trips negligible. For a 100 TB output the same loop can run as
    one Spark task per file via a JVM-side helper; the per-file
    semantics certified here are identical.
    """
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    OrcFile = jvm.org.apache.orc.OrcFile
    jdir = HPath(path)
    fs = jdir.getFileSystem(conf)
    parts = [
        st.getPath()
        for st in fs.listStatus(jdir)
        if st.getPath().getName().endswith(".orc")
        and not st.getPath().getName().startswith((".", "_"))
    ]

    def _rewrite(p) -> None:
        name = p.getName()
        reader = OrcFile.createReader(p, OrcFile.readerOptions(conf))
        tmp = HPath(p.getParent(), f".{name}.meta.tmp")
        wopts = (
            OrcFile.writerOptions(conf)
            .setSchema(reader.getSchema())
            .compress(reader.getCompressionKind())
            .overwrite(True)
        )
        writer = OrcFile.createWriter(tmp, wopts)
        rows = reader.rows()
        # 64k-row batches: the copy loop crosses py4j twice per batch, so
        # the default 1024-row batch paid ~350 gateway round-trips per
        # bench file set — measured 1.07s of the warm e2e wall; 64k cuts
        # the crossings ~64x (JVM-side memory: one batch per column set)
        batch = reader.getSchema().createRowBatch(65536)
        while rows.nextBatch(batch):
            writer.addRowBatch(batch)
        rows.close()
        for k in reader.getMetadataKeys():
            writer.addUserMetadata(k, reader.getMetadataValue(k))
        for k, v in metadata.items():
            writer.addUserMetadata(
                k, jvm.java.nio.ByteBuffer.wrap(bytearray(v.encode("utf-8")))
            )
        writer.close()
        reader.close()
        fs.delete(p, False)
        if not fs.rename(tmp, p):
            raise IOError(f"rename {tmp} -> {p} failed")

    if len(parts) <= 1:
        for p in parts:
            _rewrite(p)
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(min(len(parts), 16)) as ex:
        # list() propagates the first worker exception to the caller
        list(ex.map(_rewrite, parts))


def read_user_metadata(spark: SparkSession, path: str) -> dict[str, str]:
    """Read ORC user metadata back through the JVM ``OrcFile.createReader``
    API (the way Athena/orc-tools see it) from the first part file."""
    jvm = spark._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    OrcFile = jvm.org.apache.orc.OrcFile
    jdir = HPath(path)
    fs = jdir.getFileSystem(conf)
    utf8 = jvm.java.nio.charset.StandardCharsets.UTF_8
    for st in fs.listStatus(jdir):
        p = st.getPath()
        name = p.getName()
        if not name.endswith(".orc") or name.startswith((".", "_")):
            continue
        reader = OrcFile.createReader(p, OrcFile.readerOptions(conf))
        try:
            return {
                k: utf8.decode(reader.getMetadataValue(k)).toString()
                for k in reader.getMetadataKeys()
            }
        finally:
            reader.close()
    return {}


def write_orc(
    df: DataFrame,
    path: str,
    bounds: tuple[float, float, float, float] | None = None,
    sort_type_then_id: bool = True,
    bloom_filter_tags: bool = False,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    embed_metadata: bool = True,
    compression: str = "zlib",
) -> None:
    """Write an OSM DataFrame as ORC with reference-equivalent options.

    ``compression`` defaults to zlib — the orc-core default the reference
    shipped, kept for byte-comparable parity.  The r8
    ``orc_e2e_x10_attribution`` micro measured zstd ~16% cheaper on the
    9M-entity encode (5.0s zlib vs 4.2s zstd, sorted) with comparable
    ratios; pass ``compression="zstd"`` when parity with the reference's
    output files is not required.
    """
    out = df
    if sort_type_then_id and {"type", "id"} <= set(df.columns):
        out = out.sortWithinPartitions("type", "id")
    writer = (
        out.write.mode(mode)
        .format("orc")
        .option("orc.block.padding", "false")
        .option("compression", compression)
    )
    if bloom_filter_tags:
        writer = writer.option("orc.bloom.filter.columns", "tags")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)

    metadata = {"osm.schema.version": OSM_SCHEMA_VERSION}
    if bounds is not None:
        # Reference format: "left, bottom, right, top" (OsmPbf2Orc.java:124).
        metadata["bounds"] = ", ".join(str(v) for v in bounds)
    if embed_metadata:
        embed_user_metadata(df.sparkSession, path, metadata)
    with open(os.path.join(path, "_osm_metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2, sort_keys=True)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "orc",
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned layout: one directory per partition value, rows
    sorted within files on ``sort_cols``.

    The 100 TB layout recipe: partition on the coarse pruning key (date,
    region), sort within partitions on the fine one (id, type) so scans
    prune whole directories via PartitionFilters and then skip stripes
    via min/max stats. ``repartition(partition_cols)`` before the write
    keeps one task per partition directory -> no small-file explosion
    (N_tasks x N_partitions files otherwise).
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.mode(mode)
        .format(fmt)
        .partitionBy(*partition_cols)
        .option("orc.block.padding", "false")
        .save(path)
    )


def read_metadata(path: str, spark: SparkSession | None = None) -> dict:
    """Read back user metadata written by write_orc: the real in-file ORC
    metadata when a session is supplied, else the sidecar JSON."""
    if spark is not None:
        meta = read_user_metadata(spark, path)
        if meta:
            return meta
    try:
        with open(os.path.join(path, "_osm_metadata.json")) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
