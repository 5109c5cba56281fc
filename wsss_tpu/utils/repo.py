"""Repo provenance helpers shared by the bench entry points."""
from __future__ import annotations

import subprocess


def git_head(root) -> str:
    """Current commit hash of the checkout at `root`, or 'unknown'
    (bench artifacts are stamped with it for staleness checks)."""
    try:
        return subprocess.run(
            ['git', 'rev-parse', 'HEAD'], cwd=root, capture_output=True,
            text=True, check=True).stdout.strip()
    except Exception:
        return 'unknown'
