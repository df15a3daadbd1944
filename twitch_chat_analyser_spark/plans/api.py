"""Read-path operators B1-B21 (SURVEY.md §2.B) — filled in phase 2."""

from __future__ import annotations

READ_PATH_QUERIES: dict = {}


def read_path_oracles() -> dict[str, str]:
    return {}
