"""Differential oracle test: every registered query with a DuckDB twin is
run on both engines at SF_DIR and compared order-insensitively — the local
mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from etl_caic_spark.registry import all_specs
from tests.conftest import compare_with_oracle

SPECS = all_specs()
ORACLED = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, sf_dir, name):
    compare_with_oracle(spark, duck, SPECS[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = SPECS[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shapes():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(SPECS)
