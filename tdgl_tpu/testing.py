"""Self-test entry point (reference ``tdgl/testing.py:10``).

``tdgl_tpu.testing.run()`` executes the installed test suite so an
installation can verify itself.
"""

from __future__ import annotations

import os
import subprocess
import sys


def run() -> int:
    """Run the package test suite with pytest; returns the exit code."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests = os.path.join(repo_root, "tests")
    if not os.path.isdir(tests):
        print("Test directory not found; install from source to run tests.")
        return 1
    return subprocess.call(
        [sys.executable, "-m", "pytest", tests, "-v"], cwd=repo_root
    )
