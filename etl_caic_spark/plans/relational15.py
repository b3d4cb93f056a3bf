"""Wave 37 (round 5): embedded-record parsers — from_xml and from_csv
over STRING COLUMNS (not files): the mid-pipeline decode step for
message queues and log lines that carry a serialized record per row.
Both queries build the serialized form from table columns, parse it
back with the schema'd parser, and emit the extracted fields — the
oracle recomputes them straight from the source columns, so a hash
match proves the serialize→parse roundtrip is lossless (the same proof
style as the file-format roundtrip sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "fn_xml_parse",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d') AS day
    FROM orders WHERE o_orderkey % 40 = 0
    """,
    tags=("fn", "format", "xml"),
)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row XML decode with from_xml (Spark 4): each order is
    serialized to an <order> element (status attribute-free element
    form), then parsed back under an explicit struct schema and the
    fields extracted. The oracle reads the source columns directly —
    equality proves the XML writer/parser pair loses nothing, the
    contract a queue consumer needs before trusting xpath-less
    struct extraction. XML is built with concat (not a sink) because
    the operator under test is the COLUMN parser, not the file reader
    (sink_xml_roundtrip covers files).

    Scale: pure per-row codegen + one UDF-free parser call per row; no
    shuffle. Malformed rows surface as NULL structs (PERMISSIVE) — the
    quarantine patterns (scan_jsonl_corrupt) compose on top."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 40 == 0)
    xml = F.concat(
        F.lit("<order><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><cents>"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
        F.lit("</cents><day>"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        F.lit("</day></order>"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_xml(xml, "status string, cents bigint, day string").alias("r"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("r.status").alias("status"),
        F.col("r.cents").alias("cents"),
        F.col("r.day").alias("day"),
    )


@register(
    "fn_from_csv",
    oracle="""
    SELECT event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS cents,
           user_id
    FROM events WHERE event_id % 25 = 0
    """,
    tags=("fn", "format", "csv"),
)
def fn_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row CSV decode with from_csv: each event serializes to a
    quoted CSV line (the event_type field is quote-wrapped so the
    dialect machinery actually engages), is parsed back under an
    explicit schema, and the fields are extracted — hash-matched
    against the source columns. This is the log-line decode path:
    Kafka/syslog payloads carrying one CSV record per message are
    parsed mid-query without touching the file-source CSV reader
    (scan_csv_malformed / scan_csv_dialect cover that surface).

    Scale: per-row parser in codegen, no shuffle; schema is explicit
    so no inference pass exists to poison."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 25 == 0)
    line = F.concat(
        F.col("event_id").cast("string"),
        F.lit(',"'),
        F.col("event_type"),
        F.lit('",'),
        F.round(F.col("value") * 100).cast("bigint").cast("string"),
        F.lit(","),
        F.col("user_id").cast("string"),
    )
    parsed = ev.select(
        F.from_csv(
            line,
            "event_id bigint, event_type string, cents bigint, user_id bigint",
        ).alias("r")
    )
    return parsed.select(
        F.col("r.event_id").alias("event_id"),
        F.col("r.event_type").alias("event_type"),
        F.col("r.cents").alias("cents"),
        F.col("r.user_id").alias("user_id"),
    )
