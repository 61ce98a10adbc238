"""Capture .explain('formatted') for named queries into plans/r15/.

Usage: python scripts/cap_plan_r15.py <suffix> <query> [<query> ...]
Plans at sf0.01 (structure SF-independent; r14 protocol).
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2orc_spark.registry import all_queries  # noqa: E402
from osm2orc_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("cap_plan_r15")
    qs = all_queries()
    for name in names:
        df = qs[name].fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = f"plans/r15/{name}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", out)
    spark.stop()


if __name__ == "__main__":
    main()
