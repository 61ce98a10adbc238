"""Guards on the tmpfs shuffle-scratch default (r15, VERDICT #3 + ADVICE).

The /dev/shm default is a LOCAL-MODE optimization: on a cluster node,
'disk' spill (external sort, MEMORY_AND_DISK cache spill, shuffle files)
landing in RAM-backed tmpfs competes with executor memory until the node
dies, so a non-local master must get NO spark.local.dir override unless
the operator names scratch explicitly via SPARK_GRAFT_LOCAL_DIR (or
SPARK_LOCAL_DIRS, which wins inside Spark).  The directory is also
per-user, 0700, and ownership-checked: /dev/shm is world-writable, so a
fixed shared path could be pre-owned by another local user.
"""

from __future__ import annotations

import os
import stat

import pytest

from osm2orc_spark.session import _scratch_local_dir


def test_cluster_master_gets_no_tmpfs_default(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    for master in ("spark://host:7077", "yarn", "k8s://https://host:6443"):
        assert _scratch_local_dir(master) is None


def test_env_override_wins_for_any_master(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/mnt/nvme/scratch")
    for master in ("spark://host:7077", "local[32]", "yarn"):
        assert _scratch_local_dir(master) == "/mnt/nvme/scratch"


@pytest.mark.skipif(
    not (os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)),
    reason="no writable /dev/shm on this host",
)
def test_local_master_default_is_per_user_0700(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    d = _scratch_local_dir("local[4]")
    assert d is not None
    assert d.endswith(f"osm2orc_spark_local_{os.getuid()}")
    st = os.stat(d)
    assert st.st_uid == os.getuid()
    assert stat.S_IMODE(st.st_mode) == 0o700
