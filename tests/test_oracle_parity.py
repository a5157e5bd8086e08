"""Every queries() entry with an oracle must match it at sf0.001.

This mirrors the driver's CORRECTNESS gate (row-count + schema +
order-insensitive values) so regressions surface in `pytest` before the
round's verify pass.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duckdb_conn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF)
    yield c
    c.close()


def _oracle_cases():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    return [(name, qs[name], sqls[name]) for name in qs if name in sqls]


@pytest.mark.parametrize("name,fn,sql", _oracle_cases(), ids=lambda x: x if isinstance(x, str) else "")
def test_oracle_parity(spark, con, name, fn, sql):
    sdf = fn(spark, SF)
    odf = con.execute(sql).fetchdf()
    errs = compare(sdf, odf, float_tol=1e-6)
    assert not errs, f"{name}: " + "; ".join(errs[:5])


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a schema."""
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    for name, fn in qs.items():
        if name in sqls:
            continue
        df = fn(spark, SF)
        assert df.columns, f"{name} returned no columns"
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
