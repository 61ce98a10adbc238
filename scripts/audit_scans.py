"""Repeated-subtree audit: how many times does each query's plan scan
the same parquet table?

Run from the repo root: ``python scripts/audit_scans.py``.

The r6 house rule this enforces: Catalyst does NOT dedup identical
subtrees — a frame a plan reads N times through a union/join fan-out
executes N times unless persisted.  Two real bugs were found this way
(dedup_components planned the whole LSH verify pipeline twice under
``pairs ∪ reversed(pairs)``; the PPJoin window chain executed up to 5×
per query), each worth 30-50%% of the query's wall.

Methodology: count ``Scan parquet`` nodes in the TREE section of
``explain('formatted')`` only — the details section additionally prints
every InMemoryRelation's cached child plan, which would double-count a
scan that the cache in fact absorbs.  ``InMemoryTableScan`` nodes are
reported alongside so a high raw-scan count with a matching cache is
distinguishable from a genuine N× execution.

A repeated scan is NOT automatically a bug: recall/eval queries scan
once per swept config by design, and two scans with DIFFERENT pushed
filters (e.g. type=node vs type=way branches) are better than one
unfiltered scan.  The audit surfaces candidates; the plan decides.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm2orc_spark.registry import all_queries  # noqa: E402
from osm2orc_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def tree_section(plan: str) -> str:
    """The numbered-tree part of a formatted explain (details start at
    the first '(1) ' node block)."""
    m = re.search(r"^\(1\) ", plan, flags=re.MULTILINE)
    return plan[: m.start()] if m else plan


def scan_multiplicity(plan: str) -> tuple[Counter, int]:
    """(scan-node-id -> tree occurrences OUTSIDE cache definitions,
    InMemoryTableScan tree count).

    Formatted explain gives identical subtree nodes ONE id and prints
    every tree occurrence — the occurrence count IS the execution
    multiplicity.  Scans nested under an InMemoryRelation are that
    cache's definition (they fill the cache once) and are excluded via
    indentation-based ancestor tracking."""
    scans: Counter = Counter()
    n_inmem = 0
    stack: list[tuple[int, str]] = []  # (marker column, node name)
    for line in tree_section(plan).splitlines():
        # Left children of binary operators (joins, unions) render with a
        # ':-' marker, not '+-' (r6 advice: the old '+-'-or-column-0 match
        # skipped scans on those branches — undercounting repeated
        # subtrees in exactly the join/union fan-out shapes this audit
        # exists to catch).
        m = re.search(r"(?::\-|\+\-|^)\s*\*?\s*(\w[\w ]*?)\s+\((\d+)\)", line)
        if not m:
            continue
        # marker column = the marker adjacent to the node name (rightmost).
        # Marker-less nodes (AQE's '== Final Plan ==' stage lines inside an
        # InMemoryRelation render e.g. 'ResultQueryStage (71)' with no
        # '+-'/':-') take their INDENTATION as the column — treating them
        # as column 0 popped the whole ancestor stack, dropping the
        # InMemoryRelation ancestor and misclassifying every cache-
        # definition scan beneath as a raw N-times-executed scan.
        marker_col = max(line.rfind("+-"), line.rfind(":-"))
        col = marker_col if marker_col >= 0 else len(line) - len(line.lstrip())
        while stack and stack[-1][0] >= col:
            stack.pop()
        name, node_id = m.group(1).strip(), m.group(2)
        if name == "InMemoryTableScan":
            n_inmem += 1
        if name == "Scan parquet" and not any(
            s_name == "InMemoryRelation" for _, s_name in stack
        ):
            scans[node_id] += 1
        stack.append((col, name))
    return scans, n_inmem


def scan_tables(plan: str) -> dict[str, str]:
    """scan-node-id -> table name, from the details blocks."""
    out = {}
    for m in re.finditer(
        r"^\((\d+)\) Scan parquet ?$.*?\[file:\S*?/(\w+)\.parquet\]",
        plan,
        flags=re.MULTILINE | re.DOTALL,
    ):
        out[m.group(1)] = m.group(2)
    return out


def main() -> None:
    spark = get_spark(
        app_name="audit_scans",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = all_queries()
    rows = []
    for name, q in qs.items():
        try:
            df = q.fn(spark, SF)
        except Exception as exc:  # noqa: BLE001 — audit everything runnable
            rows.append({"query": name, "error": f"{type(exc).__name__}"})
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        scans, n_inmem = scan_multiplicity(plan)
        tables = scan_tables(plan)
        per_table: Counter = Counter()
        for node_id, mult in scans.items():
            per_table[tables.get(node_id, f"node{node_id}")] += mult
        rows.append(
            {
                "query": name,
                "max_same_table": max(per_table.values(), default=0),
                "raw_scans": sum(scans.values()),
                "inmem_scans": n_inmem,
                "per_table": dict(per_table),
            }
        )
    rows.sort(key=lambda r: -r.get("max_same_table", 0))
    for r in rows:
        print(json.dumps(r), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
