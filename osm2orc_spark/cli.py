"""Reference-compatible CLI: ``osm2orc [--changesets] <input> <output>``.

Mirrors the reference entrypoint contract (Osm2Orc.java:12-41):
- default mode: PBF -> ORC
- ``--changesets``: changeset XML -> ORC
- input ``-``: read stdin (staged to a temp file first — Spark sources
  need a seekable path; Osm2Orc.java:33-36 wraps System.in directly)

Usage:
    python -m osm2orc_spark.cli [--changesets] <input> <output-orc-dir>
"""

from __future__ import annotations

import sys
import tempfile

from osm2orc_spark.session import get_spark
from osm2orc_spark.sinks.orc import write_orc
from osm2orc_spark.sources.changeset_xml import read_changesets
from osm2orc_spark.sources.pbf import read_pbf, read_pbf_bounds


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    changesets = False
    if args and args[0] == "--changesets":
        changesets = True
        args = args[1:]
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    inp, out = args
    if inp == "-":
        with tempfile.NamedTemporaryFile(delete=False, suffix=".stdin") as tmp:
            tmp.write(sys.stdin.buffer.read())
            inp = tmp.name

    spark = get_spark(app_name="osm2orc")
    try:
        if changesets:
            write_orc(read_changesets(spark, inp), out, sort_type_then_id=False)
        else:
            write_orc(read_pbf(spark, inp), out, bounds=read_pbf_bounds(inp))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
