"""etl_caic_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the data-processing capabilities of the
reference ETL (``dfpc-coe/etl-caic``, surveyed in SURVEY.md) as an idiomatic
Spark DataFrame operator library: schema-enforced JSON/Parquet sources,
filters/projections, broadcast + shuffle joins, ordinal and group-by
aggregations, map-literal lookups, conditional posexplode, window and
streaming operators, a UDF surface, and LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing).

Every operator is registered in :mod:`etl_caic_spark.plans` with a named
query builder and (where SQL-expressible) a DuckDB oracle twin, consumed by
``/root/repo/__spark_entry__.py``.
"""

__version__ = "0.1.0"
