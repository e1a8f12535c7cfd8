"""Every registered oracle query must match DuckDB at the DRIVER's
scale factor (sf0.01 by default — see conftest.ORACLE_SF_DIR) — the
local replica of the driver's CORRECTNESS gate (schema + rows +
values), run at the same SF so local green predicts driver green.
Rows-only queries are smoke-checked (runs, stable schema)."""

from __future__ import annotations

import pytest

from recipes_spark.registry import all_oracles, all_queries
from tests.oracle_harness import compare, run_oracle

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, oracle_sf_dir, name):
    sdf = QUERIES[name](spark, oracle_sf_dir)
    odf = run_oracle(ORACLES[name], oracle_sf_dir)
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # stable schema
    df.limit(5).collect()  # executes without error


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
