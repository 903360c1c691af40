"""Lint gate (reference ships flake8/mypy/bandit in ci/build_and_test.sh —
here a dependency-free AST linter, ci/lint.py, wired next to pytest)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_lint_clean():
    proc = subprocess.run(
        [sys.executable, str(REPO / "ci" / "lint.py")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, f"lint gate failed:\n{proc.stdout}{proc.stderr}"
