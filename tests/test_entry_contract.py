"""Driver-contract guard: __spark_entry__ must expose entry/queries/
oracle_sql with the shapes the round driver consumes, and the oracle
set must stay consistent with the query set."""

from __future__ import annotations

import __spark_entry__ as E


def test_contract_shapes(spark):
    qs = E.queries()
    osql = E.oracle_sql()
    assert isinstance(qs, dict) and isinstance(osql, dict)
    assert len(qs) >= 70
    # every oracle belongs to a query; rows-only set stays small+known
    assert set(osql) <= set(qs)
    rows_only = set(qs) - set(osql)
    assert rows_only == {"approx_distinct_users"}
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in osql.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_runs(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "product_id" in df.columns and "close" in df.columns
