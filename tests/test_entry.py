"""Driver-contract conformance: entry() smoke, queries()/oracle_sql() shape."""

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_registry_shape(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) > 0
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
