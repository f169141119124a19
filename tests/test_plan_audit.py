"""Plan-lint regression gate: every workload query's physical plan is
audited for scale anti-patterns (cartesian products, nested-loop
joins, row-at-a-time Python UDFs, single-partition windows). Any hit
must be justified in tools/plan_audit.py's ALLOWLIST — a new query or
a plan regression that trips a rule fails HERE, at test time, instead
of melting down on a cluster.

Also pins the auditor itself: known-bad plan strings must be flagged,
and every allowlist entry must reference a registered query (no stale
justifications)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.plan_audit import ALLOWLIST, audit_all, audit_plan  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


def test_audit_plan_flags_known_bad_patterns():
    assert audit_plan("+- CartesianProduct\n") == ["cartesian"]
    assert audit_plan("+- BroadcastNestedLoopJoin BuildRight, Inner\n") == [
        "nested_loop_join"
    ]
    assert audit_plan("+- BatchEvalPython [f(x)]\n") == ["python_udf_rowwise"]
    assert "single_partition_window" in audit_plan(
        "Window [lag(x) ...]\n +- Sort\n  +- Exchange SinglePartition\n"
    )
    assert audit_plan("+- ArrowEvalPython [g(x)]\n +- MapInPandas\n") == []


def test_allowlist_entries_reference_registered_queries():
    from redskins_rule_spark import workload

    registered = set(workload.QUERIES)
    for pattern, entries in ALLOWLIST.items():
        stale = set(entries) - registered
        assert not stale, f"stale allowlist entries under {pattern}: {stale}"


def test_no_unjustified_plan_violations(spark):
    failures = audit_all(SF_DIR, spark=spark)
    assert failures == {}, f"unjustified plan anti-patterns: {failures}"
