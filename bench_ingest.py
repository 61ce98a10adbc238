"""PBF -> ORC ingest throughput benchmark (the reference's actual workload).

The reference (OsmPbf2Orc.java) transcodes single-threaded; this measures
our blob-parallel pipeline end-to-end: synthesize a deterministic multi-blob
PBF, then time read_pbf -> write_orc on local[N].

Prints ONE JSON line:
  {"metric": "pbf_ingest", "entities": N, "mb": F, "wall_sec": F,
   "entities_per_sec": F, "mb_per_sec": F}

Not part of the driver's bench.py contract — run manually:
  python bench_ingest.py [n_nodes]   # default 200_000
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from osm2orc_spark.fixtures import planet_history_entities
from osm2orc_spark.session import get_spark
from osm2orc_spark.sinks.orc import write_orc
from osm2orc_spark.sources.pbf import read_pbf, read_pbf_bounds
from osm2orc_spark.sources.pbf_codec import PbfWriter


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    tmp = tempfile.mkdtemp(prefix="bench_ingest_")
    pbf_path = os.path.join(tmp, "bench.osm.pbf")
    orc_path = os.path.join(tmp, "out_orc")

    # Deterministic synthetic planet: ~n_nodes nodes + proportional
    # ways/relations, multi-blob so the parallel decode path is exercised.
    entities = planet_history_entities(
        seed=7, n_nodes=n_nodes, n_ways=n_nodes // 15, n_rels=n_nodes // 100
    )
    w = PbfWriter()
    for e in entities:
        w.add(**e)
    w.write(pbf_path, nodes_per_block=8000)
    mb = os.path.getsize(pbf_path) / 1e6

    spark = get_spark(app_name="osm2orc-bench-ingest")
    try:
        # Warm-up pass: Python workers + codegen; timed pass measures the
        # steady-state pipeline (same policy as bench.py).
        write_orc(read_pbf(spark, pbf_path), orc_path)
        t0 = time.perf_counter()
        df = read_pbf(spark, pbf_path)
        write_orc(df, orc_path, bounds=read_pbf_bounds(pbf_path))
        wall = time.perf_counter() - t0
        n = spark.read.orc(orc_path).count()
    finally:
        spark.stop()

    print(
        json.dumps(
            {
                "metric": "pbf_ingest",
                "entities": n,
                "mb": round(mb, 2),
                "wall_sec": round(wall, 3),
                "entities_per_sec": round(n / wall),
                "mb_per_sec": round(mb / wall, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
