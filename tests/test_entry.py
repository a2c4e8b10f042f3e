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


def test_cli_catalog_list_and_run(spark):
    """--list prints every registered query; --run parses args (exercised
    in-process to avoid a second JVM)."""
    from network_iq_spark.__main__ import _catalog_main
    from network_iq_spark.registry import QUERIES

    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _catalog_main(["--list"])
    out = buf.getvalue()
    for name in QUERIES:
        assert name in out
    assert f"{len(QUERIES)} queries" in out

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _catalog_main(["--run", "not_a_query"])
