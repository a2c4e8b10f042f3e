"""t1 smoke: the driver contract itself."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_returns_rows(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_registry_entry():
    qs = e.queries()
    assert "pricing_summary" in qs
    # every oracle key must correspond to a query
    assert set(e.oracle_sql()) <= set(qs)
