"""The examples/quickstart.py script must keep running end to end —
it is the 'switching from the reference' walkthrough."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # full gate only: an end-to-end subprocess walkthrough of examples/quickstart.py; every operator it touches has its own default-profile test
def test_quickstart_runs_clean(tmp_path):
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", "quickstart.py"),
            os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
            str(tmp_path),
        ],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    assert "quickstart complete" in p.stdout
