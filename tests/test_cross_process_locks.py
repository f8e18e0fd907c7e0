"""Cross-PROCESS evidence for the warehouse append lock.

Every existing lock test exercises threads inside one interpreter; the
lock's design claims (O_CREAT|O_EXCL file + inode ownership + heartbeat
+ crashed-holder steal) are about separate OS processes — two drivers,
or a driver and a maintenance job, sharing one warehouse root. These
tests spawn real child interpreters (no Spark session needed: the lock
protocol is pure filesystem, and ``VersionedWarehouse(None, root)``
constructs without touching Spark).

1. Mutual exclusion: K children × R read-sleep-increment critical
   sections on a shared counter — any interleaving loses updates, so
   counter == K*R proves exclusion across processes.
2. Crashed holder: a child takes the lock and ``os._exit``s while
   holding it (heartbeat thread dies with the process); a parent with a
   shrunk steal horizon must acquire by stealing the stale lock.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])

_INCR_CHILD = """
import os, sys, time
sys.path.insert(0, sys.argv[1])
from end_to_end_azure_data_engineering_spark.engine.tableio import VersionedWarehouse

root, n_iter = sys.argv[2], int(sys.argv[3])
wh = VersionedWarehouse(None, root)
ctr = os.path.join(root, "counter.txt")
for _ in range(n_iter):
    with wh._append_lock("silver", "t"):
        v = int(open(ctr).read())
        time.sleep(0.02)
        with open(ctr, "w") as f:
            f.write(str(v + 1))
"""

_CRASH_CHILD = """
import os, sys
sys.path.insert(0, sys.argv[1])
from end_to_end_azure_data_engineering_spark.engine.tableio import VersionedWarehouse

wh = VersionedWarehouse(None, sys.argv[2])
lk = wh._append_lock("silver", "t")
lk.__enter__()
print("HELD", flush=True)
os._exit(1)  # crash while holding: no release, heartbeat thread dies too
"""


def test_append_lock_mutual_exclusion_across_processes(tmp_path):
    from end_to_end_azure_data_engineering_spark.engine.tableio import (
        VersionedWarehouse,
    )

    root = tmp_path / "xproc_wh"
    VersionedWarehouse(None, str(root))  # creates the root
    (root / "counter.txt").write_text("0")
    k, r = 4, 5
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _INCR_CHILD, REPO, str(root), str(r)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for _ in range(k)
    ]
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-2000:]
    assert int((root / "counter.txt").read_text()) == k * r


def test_append_lock_crashed_process_holder_is_stolen(tmp_path):
    from end_to_end_azure_data_engineering_spark.engine.tableio import (
        VersionedWarehouse,
    )

    root = tmp_path / "crash_wh"
    child = subprocess.Popen(
        [sys.executable, "-c", _CRASH_CHILD, REPO, str(root)],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    out, err = child.communicate(timeout=60)
    assert "HELD" in out, err[-2000:]
    assert child.returncode == 1  # crashed while holding

    lock = root / "silver" / "t" / ".append.lock"
    assert lock.exists()  # the orphaned lock file

    wh = VersionedWarehouse(None, str(root))
    wh.LOCK_STEAL_AFTER = 1.0  # instance shrink: the child cannot heartbeat
    time.sleep(1.1)  # age the orphan past the horizon
    t0 = time.monotonic()
    with wh._append_lock("silver", "t"):
        took = time.monotonic() - t0
    assert took < 30.0, took  # acquired by steal, not the 600s default
    assert not lock.exists()  # released cleanly by the new holder
