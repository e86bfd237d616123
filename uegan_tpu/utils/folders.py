"""Result-directory layout (reference: utils.py:115-117, main.py:21-25)."""

from __future__ import annotations

import os


def create_folder(root_dir: str, path: str, version: str) -> str:
    full = os.path.join(root_dir, path, version)
    os.makedirs(full, exist_ok=True)
    return full
