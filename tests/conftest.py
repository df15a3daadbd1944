from __future__ import annotations

import os

import pytest

from twitch_chat_analyser_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

# Two-tier suite (VERDICT r13 item 1): tests named in slow_tests.txt
# (every test that measured >= 8 s in the round-14 full --durations=0
# run — 69 tests carrying ~1 700 s of the suite's ~2 300 s) get the
# `slow` marker here; pytest.ini's `addopts = -m "not slow"` keeps them
# out of the default tier so the driver's `pytest tests/ -x -q` verify
# finishes inside its window. The builder runs the slow tier with
# `python -m pytest tests/ -m slow` (CLI -m overrides the addopts
# default). List-driven so re-tiering is a data edit, not 69 decorator
# edits, and the tier membership is reviewable in one file.
_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
with open(_SLOW_FILE) as _fh:
    _SLOW_IDS = {line.strip() for line in _fh if line.strip()}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # nodeid relative to the tests/ dir, parametrization stripped:
        # one list entry marks every parametrized variant of a test
        rel = os.path.relpath(str(item.fspath), os.path.dirname(__file__))
        name = getattr(item, "originalname", None) or item.name
        if f"{rel}::{name}" in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
