"""Every registry query must RUN end-to-end at sf0.001.

The oracle gate (tools/oracle_check.py, driver t2) proves values; this
smoke proves availability — a refactor that breaks a query's plan
construction or execution fails here in seconds instead of surfacing in
the next oracle sweep. One Spark action per query, schema sanity only.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"


def test_every_registry_query_executes(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)
            assert df.columns, f"{name}: no columns"
            df.limit(5).collect()
        except Exception as ex:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, "\n".join(failures)
    # EVERY query has an oracle (zero rows-only as of round 5 — the TDA
    # invariant contract closed the last one); stray oracle keys with no
    # query are dead weight
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracles: {missing}"
    stray = [n for n in oracles if n not in qs]
    assert not stray, f"oracles without queries: {stray}"


def test_entry_contract(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "l_returnflag" in df.columns
