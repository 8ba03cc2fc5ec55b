"""Fresh-JVM runner for the stream/tx suite chunk (r13; r12 VERDICT
item 2). Named ``test_aa_...`` so it collects FIRST: the child JVM runs
and exits before the shared session fixture ever starts, so no two
Spark sessions do work concurrently and each JVM's lifetime stays well
under the environment's ~26-32 min single-JVM ceiling (SCALE.md
"~30-minute single-process ceiling").

The chunk files are deselected from the parent collection by
tests/conftest.py (``STREAM_TX_CHILD_FILES``) and collected normally
inside the child via the env guard — so `pytest tests/` is still ONE
pytest process whose exit code covers every test, and
`pytest tests/test_streaming.py` (etc.) still works directly when the
guard env var is set (the runner sets it for you; for a manual run:
``SPARK_GRAFT_STREAM_TX_CHILD=1 python -m pytest tests/test_tx_table.py``).
"""

from __future__ import annotations

import os
import subprocess
import sys

from .conftest import _CHILD_ENV, STREAM_TX_CHILD_FILES

_HERE = os.path.dirname(os.path.abspath(__file__))


def test_stream_tx_chunk_fresh_jvm():
    env = dict(
        os.environ,
        **{_CHILD_ENV: "1", "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "8")},
    )
    files = [os.path.join(_HERE, f) for f in STREAM_TX_CHILD_FILES]
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider", *files],
        capture_output=True,
        text=True,
        timeout=1800,
        env=env,
        cwd=os.path.dirname(_HERE),
    )
    assert proc.returncode == 0, (
        f"stream/tx chunk failed in child JVM (rc={proc.returncode})\n"
        f"stdout tail:\n{proc.stdout[-4000:]}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}"
    )
    # surface the child's summary line in the parent log
    tail = [l for l in proc.stdout.splitlines() if l.strip()][-1:]
    print(f"child JVM summary: {tail[0] if tail else '<no output>'}")
