"""Generate CAPABILITIES.md — the operator → query → test index —
FROM the code, so the map can't drift from it (VERDICT r5 item 8).

For every public function in the operator-bearing packages
(`operators/`, `functions/`, `streaming/`, `pipelines/`), the tool
records:

- where it is defined,
- the first line of its docstring (the capability one-liner),
- every workload query whose SOURCE calls it (and whether that query
  is oracle-hash-checked or rows-only),
- every test file that calls it.

Everything is derived by static inspection of the registry and the
test tree — no Spark session. A pytest (`tests/test_workload_analysis
.py::test_capability_map_is_current`) runs `--check`, so adding an
operator or query without regenerating the map fails the suite:

    python tools/capability_map.py --write   # regenerate
    python tools/capability_map.py --check   # exit 1 on drift
"""

from __future__ import annotations

import inspect
import pathlib
import re
import sys

sys.path.insert(0, "/root/repo")

REPO = pathlib.Path("/root/repo")
OUT = REPO / "CAPABILITIES.md"
PACKAGES = ["operators", "functions", "streaming", "pipelines"]


def collect_operators() -> dict[str, list[str]]:
    """public function name -> [module paths defining it]"""
    import importlib

    out: dict[str, list[str]] = {}
    for pkg in PACKAGES:
        for path in sorted((REPO / "redskins_rule_spark" / pkg).glob("*.py")):
            if path.name.startswith("_"):
                continue
            mod_name = f"redskins_rule_spark.{pkg}.{path.stem}"
            mod = importlib.import_module(mod_name)
            for name, obj in vars(mod).items():
                if (
                    name.startswith("_")
                    or not inspect.isfunction(obj)
                    or obj.__module__ != mod_name
                ):
                    continue
                out.setdefault(name, []).append(f"{pkg}/{path.name}")
    return out


def first_doc_line(name: str, modules: list[str]) -> str:
    import importlib

    pkg, fname = modules[0].split("/")
    mod = importlib.import_module(
        f"redskins_rule_spark.{pkg}.{fname.removesuffix('.py')}"
    )
    doc = inspect.getdoc(getattr(mod, name)) or ""
    line = doc.split("\n", 1)[0].strip()
    return line[:110] + ("…" if len(line) > 110 else "")


def build_map() -> str:
    from redskins_rule_spark import workload

    ops = collect_operators()
    query_src = {
        qname: inspect.getsource(fn) for qname, fn in workload.QUERIES.items()
    }
    test_src = {
        p.name: p.read_text() for p in sorted((REPO / "tests").glob("test_*.py"))
    }

    lines = [
        "# Capability map",
        "",
        "Operator → workload query → test index, GENERATED from the code",
        "by `tools/capability_map.py` (checked current by",
        "`tests/test_workload_analysis.py::test_capability_map_is_current`",
        "— regenerate with `python tools/capability_map.py --write`).",
        "`hash` = the query has a DuckDB oracle and is value-hash-checked",
        "by the differential driver; `rows` = rows-only by design",
        "(non-SQL-expressible; each has an oracle-checked sibling — see",
        "SURVEY.md §2).",
        "",
        "| operator | defined in | what it does | queries | tests |",
        "|---|---|---|---|---|",
    ]
    n_unqueried = 0
    for name in sorted(ops):
        call = re.compile(rf"\b{re.escape(name)}\s*\(")
        queries = sorted(
            q for q, src in query_src.items() if call.search(src)
        )
        qcell = ", ".join(
            f"{q} ({'hash' if q in workload.ORACLES else 'rows'})"
            for q in queries
        ) or "—"
        tests = sorted(t for t, src in test_src.items() if call.search(src))
        tcell = ", ".join(t.removeprefix("test_").removesuffix(".py")
                          for t in tests) or "—"
        if not queries:
            n_unqueried += 1
        doc = first_doc_line(name, ops[name]).replace("|", "\\|")
        lines.append(
            f"| `{name}` | {', '.join(ops[name])} | {doc} | {qcell} | {tcell} |"
        )
    lines += [
        "",
        f"{len(ops)} public operators; {len(query_src)} workload queries; "
        f"{n_unqueried} operators reached only via tests/pipelines "
        "(composition helpers and faces exercised inside other operators).",
        "",
    ]
    return "\n".join(lines)


def main() -> int:
    content = build_map()
    if "--check" in sys.argv:
        current = OUT.read_text() if OUT.exists() else ""
        if current != content:
            print("CAPABILITIES.md is stale — run "
                  "`python tools/capability_map.py --write`")
            return 1
        print("CAPABILITIES.md is current")
        return 0
    OUT.write_text(content)
    print(f"wrote {OUT} ({len(content.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
