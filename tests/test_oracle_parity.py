"""Driver-gate rehearsal: every queries() entry with an oracle_sql()
twin must match DuckDB at sf0.001 (the driver re-checks at sf0.01).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, duck, ORACLES[name])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


def test_driver_window_names_resolve_and_have_checks():
    """Meta-invariant on the driver contract: every name in the
    first-50 hash-checked window must (a) exist in queries() and
    (b) either have an oracle_sql() twin or carry an explicit
    rows-only rationale in its callable's docstring — so no query
    silently degrades to an unchecked row."""
    import re

    import __spark_entry__ as E

    src = open("/root/repo/__spark_entry__.py").read()
    m = re.search(r"_DRIVER_CHECK_ORDER = \[(.*?)\n\]", src, re.S)
    names = re.findall(r'"([a-z0-9_]+)"', m.group(1))
    assert len(names) == len(set(names)), "duplicate names shift the window"
    q = E.queries()
    o = E.oracle_sql()
    window = names[:50]
    missing = [n for n in window if n not in q]
    assert not missing, missing
    for n in window:
        if n in o:
            continue
        fn = q[n]
        doc = (getattr(fn, "__doc__", None) or "") + (
            getattr(getattr(fn, "__wrapped__", None), "__doc__", None) or ""
        )
        doc = " ".join(doc.lower().split())
        assert "rows-only" in doc or "rows only" in doc, (
            f"{n} has no oracle and no rows-only rationale"
        )
