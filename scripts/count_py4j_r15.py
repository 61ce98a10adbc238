"""Count py4j round trips + driver wall time of PLAN BUILD per query.

Usage: python scripts/count_py4j_r15.py <label> <query> [query ...]
Instruments the gateway client's send_command (the single choke point
every Column/DataFrame driver call routes through) and calls the
registered query function — no action, so the count is pure plan
construction.  Run on two checkouts and diff the numbers.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as e  # noqa: E402

from osm2orc_spark.session import get_spark  # noqa: E402

label, names = sys.argv[1], sys.argv[2:]
qs = e.queries()
spark = get_spark(master="local[8]")

client = spark.sparkContext._gateway._gateway_client
orig = client.send_command
counter = {"n": 0}


def counting(*a, **kw):
    counter["n"] += 1
    return orig(*a, **kw)


client.send_command = counting

SF = "/root/testdata/sf0.001"
for name in names:
    qs[name](spark, SF)  # warm (probe/memo effects out of the timing)
    best_t, best_n = float("inf"), 0
    for _ in range(3):
        counter["n"] = 0
        t0 = time.time()
        qs[name](spark, SF)
        dt = time.time() - t0
        if dt < best_t:
            best_t, best_n = dt, counter["n"]
    print(f"{label} {name}: py4j={best_n} build={best_t:.3f}s", flush=True)
