"""Driver-contract smoke: entry() runs, every queries() entry runs at
sf0.001 with a stable schema, and every oracle key has a query."""

from __future__ import annotations

import importlib.util
import sys

import pytest

SF = "/root/testdata/sf0.001"


def _entry_module():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _entry_module()
    df = mod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"event_id", "user_id", "view_event_id", "secs_diff"}


def test_oracle_keys_subset_of_queries():
    mod = _entry_module()
    assert set(mod.oracle_sql()) <= set(mod.queries())


@pytest.mark.parametrize("name", sorted(_entry_module().queries()))
def test_each_query_runs(spark, name):
    mod = _entry_module()
    df = mod.queries()[name](spark, SF)
    assert df.columns  # schema resolvable
    assert df.count() >= 0
