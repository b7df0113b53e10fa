"""Contract surface consistency: every queries() entry is callable,
oracle keys are a subset of query keys, and the README coverage table
stays in sync with the registry."""

from __future__ import annotations

import re
from pathlib import Path


def test_oracles_subset_of_queries():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert len(q) >= 50
    # every oracle is non-empty SQL mentioning SELECT
    for name, sql in o.items():
        assert "SELECT" in sql.upper(), name


def test_readme_coverage_table_matches_registry():
    import __spark_entry__ as e

    q = set(e.queries())
    readme = Path(__file__).resolve().parent.parent / "README.md"
    text = readme.read_text()
    table = text.split("## Operator coverage")[1]
    words = set(re.findall(r"[a-z0-9_]+", table))
    missing = {name for name in q if name not in words}
    assert not missing, f"registry queries missing from README: {sorted(missing)}"
