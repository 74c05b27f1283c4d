"""Runnable-examples smoke tests (mirrors the reference's
tests/integration_tests/test_examples — SURVEY.md §5.3).

Each example owns its Ray session, so they run as subprocesses from the
repo root (the examples prepend "." to sys.path themselves).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = sorted(glob.glob(os.path.join(REPO, "examples", "[0-9]*.py")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(path):
    proc = subprocess.run(
        [sys.executable, path],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.strip(), "example printed nothing"
