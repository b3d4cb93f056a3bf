"""Small shared utilities."""

from __future__ import annotations

import os
import tempfile

# All scratch output stays inside the repo (driver policy: nothing outside
# /root/repo is written). Gitignored.
REPO_TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


def scratch_dir(prefix: str) -> str:
    os.makedirs(REPO_TMP, exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir=REPO_TMP)


def scratch_path(name: str) -> str:
    os.makedirs(REPO_TMP, exist_ok=True)
    return os.path.join(REPO_TMP, name)
