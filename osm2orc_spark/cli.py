"""Reference-compatible CLI: ``osm2orc [--changesets] <input> <output>``.

Mirrors the reference entrypoint contract (Osm2Orc.java:12-41):
- default mode: PBF -> ORC
- ``--changesets``: changeset XML -> ORC
- input ``-``: read stdin (staged to a temp file first — Spark sources
  need a seekable path; Osm2Orc.java:33-36 wraps System.in directly)
- ``--watch``: input is a LANDING DIRECTORY; run the Structured
  Streaming ingest instead of a batch job, appending ORC exactly-once
  as files arrive (the reference pipeline, made continuous — beyond
  the reference's batch-only surface). ``--once`` drains what is
  currently in the directory and exits (for cron-style incremental
  loads); without it the stream runs until interrupted.

Usage:
    python -m osm2orc_spark.cli [--changesets] <input> <output-orc-dir>
    python -m osm2orc_spark.cli [--changesets] --watch [--once] <in-dir> <out-orc-dir>
"""

from __future__ import annotations

import sys
import tempfile

from osm2orc_spark.session import get_spark
from osm2orc_spark.sinks.orc import write_orc
from osm2orc_spark.sources.changeset_xml import (
    read_changesets,
    read_changesets_stream,
    stream_changesets_to_orc,
)
from osm2orc_spark.sources.pbf import read_pbf, read_pbf_bounds, read_pbf_stream


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    changesets = watch = once = False
    while args and args[0] in ("--changesets", "--watch", "--once"):
        flag = args.pop(0)
        changesets |= flag == "--changesets"
        watch |= flag == "--watch"
        once |= flag == "--once"
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    inp, out = args
    if inp == "-":
        with tempfile.NamedTemporaryFile(delete=False, suffix=".stdin") as tmp:
            tmp.write(sys.stdin.buffer.read())
            inp = tmp.name

    from pyspark.sql import SparkSession

    # getOrCreate may hand back a caller's live session (tests, notebooks,
    # repeated in-process invocations) — only stop what this call created.
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="osm2orc")
    try:
        if watch:
            stream = (
                read_changesets_stream(spark, inp)
                if changesets
                else read_pbf_stream(spark, inp)
            )
            q = stream_changesets_to_orc(stream, out, out + "_checkpoint")
            try:
                if once:
                    q.processAllAvailable()
                else:
                    q.awaitTermination()
            finally:
                q.stop()
        elif changesets:
            write_orc(read_changesets(spark, inp), out, sort_type_then_id=False)
        else:
            write_orc(read_pbf(spark, inp), out, bounds=read_pbf_bounds(inp))
    finally:
        if owns_session:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
