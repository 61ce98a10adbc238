"""Capture formatted plans for the r14 broadcast-hint-removal queries.

Usage: python scripts/cap_r14_hints.py {before|after}
Writes plans/r14/<query>_<tag>.txt at sf0.01 (plan structure is
SF-independent; AQE finalizes join strategy at runtime).
"""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2orc_spark.registry import all_queries  # noqa: E402
from osm2orc_spark.session import get_spark  # noqa: E402

TAG = sys.argv[1]
SF = "/root/testdata/sf0.01"
NAMES = [
    "q3_shipping_priority",
    "q8_market_share",
    "q9_product_profit",
    "q17_small_quantity_revenue",
    "q19_discounted_revenue",
]

spark = get_spark("cap_r14_hints")
qs = all_queries()
for name in NAMES:
    df = qs[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = f"/root/repo/plans/r14/{name}_{TAG}.txt"
    with open(out, "w") as f:
        f.write(buf.getvalue())
    print(name, TAG, "->", out)
spark.stop()
