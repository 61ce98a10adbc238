"""Structural pin of the SUITE_SHARD hook (tests/conftest.py): the claim
"N green shards == a green `pytest tests/`" requires the shard slices to
be pairwise disjoint AND exhaustive over the full collection.  This test
derives both properties from real child collections, so a hash change or
hook regression cannot silently drop tests from the sharded runner
(scripts/run_suite_sharded.py)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _collect(shard: str | None) -> set[str]:
    env = {k: v for k, v in os.environ.items() if k != "SUITE_SHARD"}
    if shard:
        env["SUITE_SHARD"] = shard
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    # -q prints one nodeid per line, then a blank line + summary
    return {
        line
        for line in out.stdout.splitlines()
        if line.startswith("tests/") and "::" in line
    }


def test_shards_are_disjoint_and_exhaustive():
    full = _collect(None)
    assert len(full) > 500  # sanity: the real suite, not a stub collection
    n = 3  # any N exercises the hook; 3 keeps the test under ~15s
    shards = [_collect(f"{i}/{n}") for i in range(n)]
    union = set().union(*shards)
    assert union == full, (
        f"sharding lost {len(full - union)} / invented {len(union - full)} tests"
    )
    for i in range(n):
        for j in range(i + 1, n):
            overlap = shards[i] & shards[j]
            assert not overlap, f"shards {i},{j} overlap: {sorted(overlap)[:3]}"


def test_bad_shard_spec_rejected():
    env = dict(os.environ, SUITE_SHARD="5/4")
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/test_guards.py"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
    )
    assert out.returncode != 0
    assert "SUITE_SHARD" in out.stdout + out.stderr
