"""Capabilities introspection (reference R17, task.ts:54-83): the
reference publishes its config + output schemas to the host on request
("Implement Capabilities", CHANGELOG.md:73). The engine's analogue:
enumerate every registered query with its tags, oracle coverage, and —
resolved against a live session — its result schema.

The DEBUG toggle (task.ts:65-67, "Print results in logs") maps to
explain_query()."""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_caic_spark.registry import all_specs


def capabilities(spark: SparkSession | None = None, sf_dir: str | None = None) -> dict:
    """Static catalog of the engine surface; with a session + sf_dir also
    resolves each query's output schema (the schema() endpoint analogue)."""
    out = {}
    for name, spec in sorted(all_specs().items()):
        entry = {
            "tags": list(spec.tags),
            "oracle_checked": spec.oracle is not None,
            "doc": (spec.doc or "").strip().split("\n")[0],
        }
        if spark is not None and sf_dir is not None and name != "stream_watermark":
            try:
                entry["schema"] = spec.fn(spark, sf_dir).schema.simpleString()
            except Exception as exc:  # pragma: no cover
                entry["schema_error"] = str(exc)[:200]
        out[name] = entry
    return out


def explain_query(spark: SparkSession, sf_dir: str, name: str, mode: str = "formatted") -> str:
    """The DEBUG toggle: formatted physical plan for one named query."""
    spec = all_specs()[name]
    df = spec.fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )
