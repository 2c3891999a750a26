"""Every example in examples/ actually runs (the r7 verdict ask: a
broken example is the first thing a new user hits, and nothing executed
them).

Each example's ``main()`` is imported and run IN-PROCESS — they all go
through ``zc.get_spark`` (getOrCreate), so they share the test session
instead of paying a JVM start each.  Environment mutations (the object-
store example exports emulator credentials) are snapshotted and rolled
back so examples cannot leak config into each other or later tests.
Writes go to each example's own mkdtemp, asserted by the examples
themselves; a test passes iff ``main()`` returns without raising.
"""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

import pytest

EXAMPLES = sorted(
    (Path(__file__).resolve().parent.parent / "examples").glob("ex_*.py"))


def _load(path: Path):
    # examples insert the repo root on sys.path themselves; the object
    # store example additionally imports the emulator from tests/
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    try:
        spec = importlib.util.spec_from_file_location(
            f"example_{path.stem}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("path", EXAMPLES, ids=[p.stem for p in EXAMPLES])
def test_example_runs(spark, path):
    env_before = dict(os.environ)
    # standalone examples legitimately spark.stop() on exit; in-process
    # they share the suite's session, and stopping it would kill every
    # test that runs after this module (the whole tail errors with
    # NoneType session failures) — neuter stop() for the duration
    from pyspark.sql import SparkSession
    real_stop = SparkSession.stop
    SparkSession.stop = lambda self: None
    try:
        mod = _load(path)
        assert hasattr(mod, "main"), f"{path.name} has no main()"
        mod.main()
    finally:
        SparkSession.stop = real_stop
        for k in set(os.environ) - set(env_before):
            del os.environ[k]
        os.environ.update(env_before)
