"""Every declared query must analyze against the REAL driver testdata.

Round-2 lesson: the driver's parquet stores events.ts as TIMESTAMP_NTZ
(isAdjustedToUTC=false), while locally-generated scale fixtures carried
TIMESTAMP_LTZ — so q59/q67 passed every local run and then blew up the
driver's sf0.1 bench with DATATYPE_MISMATCH on `unix_micros(ts)`
(BENCH_r02 rc=1, zero numbers recorded). Catalyst analysis (schema
resolution) is enough to catch that class of bug and costs milliseconds
per query, so this test analyzes the entire workload against
/root/testdata/sf0.001 — the same files, same types, the driver reads.
"""

from __future__ import annotations

import os

import pytest

from redskins_rule_spark import workload

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_all_queries_analyze_on_driver_testdata(spark):
    failures = {}
    for name, fn in workload.queries().items():
        try:
            fn(spark, SF_DIR).schema  # noqa: B018 — forces Catalyst analysis
        except Exception as e:  # noqa: BLE001
            failures[name] = str(e).splitlines()[0][:200]
    assert not failures, f"queries failing analysis on driver testdata: {failures}"


def test_oracles_subset_of_queries():
    q, o = workload.queries(), workload.oracles()
    assert set(o) <= set(q)
    missing = sorted(set(q) - set(o))
    # rows-only by design (non-SQL-expressible); keep this list deliberate.
    assert missing == [
        "q104_bpe_segment",
        "q25_simhash_pairs",
        "q37_packing",
        "q43_approx_distinct",
        "q97_pq_ann",
    ], f"unexpected oracle-less queries: {missing}"


def test_capability_map_is_current():
    """CAPABILITIES.md is GENERATED from the registry + test tree
    (tools/capability_map.py); this gate makes adding an operator or
    query without regenerating the map a test failure, so the index
    can never drift from the code (VERDICT r5 item 8)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "capability_map", "/root/repo/tools/capability_map.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    current = pathlib.Path("/root/repo/CAPABILITIES.md").read_text()
    assert current == mod.build_map(), (
        "CAPABILITIES.md stale — run `python tools/capability_map.py --write`"
    )


def test_q185_oracle_bound_in_code():
    """ADVICE r8: q185's gate-scale coupling (fixed 64-plane oracle
    valid only while srp_auto_band_bits(n, 8) == 8) is enforced by
    oracle_bounds(), not comments — both gate fixtures pass the
    bound, the sf0.1/skew count (2000) names its skip."""
    from redskins_rule_spark.workload import _q185_bound_reason, oracle_bounds

    assert _q185_bound_reason(500) is None
    assert _q185_bound_reason(1024) is None
    reason = _q185_bound_reason(2000)
    assert reason is not None and "n=2000" in reason
    assert "q185_ann_label_noise" in oracle_bounds()


def test_bounded_oracles_are_tagged_in_registry():
    """ADVICE r9: every oracle with an oracle_bounds() predicate must
    carry the bound as a leading SQL comment in the registry itself,
    so harnesses that iterate oracles() directly see it without
    knowing to consult oracle_bounds()."""
    from redskins_rule_spark import workload

    orc = workload.oracles()
    for name in workload.oracle_bounds():
        assert name in orc
        assert orc[name].lstrip().startswith("-- SCALE-BOUNDED ORACLE"), name
    # and the tag is still executable SQL: DuckDB ignores the comment
    import duckdb

    assert duckdb.sql("-- comment\nSELECT 1 AS x").fetchall() == [(1,)]
