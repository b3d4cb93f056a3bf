"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real content lives in the ``etl_caic_spark`` package; this module is a
thin shim over its query registry (etl_caic_spark/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's CWD.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from etl_caic_spark.registry import all_specs  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query; driver checks rows>0 and a stable schema.

    Runs the reference-faithful CAIC pipeline (SURVEY.md §2.D — decode →
    filters → last-wins dedup → broadcast join → worst-severity ordinal →
    styled projection → Multi* posexplode → union) on deterministic
    fixtures, exercising 13 of the 17 reference operators end-to-end
    (134 rows, pinned by tests/test_caic_golden.py)."""
    specs = all_specs()
    return specs["caic_pipeline"].fn(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; queries without one get a rows-only check."""
    return {
        name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None
    }
