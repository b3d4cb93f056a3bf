"""Pipeline-composition queries (milestone M14): MERGE/upsert emulation
(no Delta in this environment — anti-join + union, the classic recipe),
quality-threshold corpus filtering, and PII redaction — the remaining
staples of a production training-data ETL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "scd_upsert",
    oracle="""
    WITH updates AS (
      SELECT c_custkey, c_name, c_nationkey,
             round(c_acctbal + 1000, 2) AS c_acctbal,
             'UPDATED' AS c_mktsegment
      FROM customer WHERE c_custkey % 5 = 0
    ), inserts AS (
      SELECT c_custkey + 1000000 AS c_custkey, c_name, c_nationkey,
             0.0 AS c_acctbal, 'NEW' AS c_mktsegment
      FROM customer WHERE c_custkey % 50 = 0
    ), upd AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts)
    SELECT b.c_custkey, b.c_name, b.c_nationkey,
           round(b.c_acctbal, 2) AS c_acctbal, b.c_mktsegment
    FROM customer b
    WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = b.c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2), c_mktsegment
    FROM upd
    """,
    tags=("pipeline", "merge"),
)
def scd_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation without a table format: base rows not matched
    by updates (left anti) + all update rows (updates win). The updates
    frame contains both modified rows and brand-new keys, so both MERGE
    arms (UPDATE and INSERT) are exercised.

    Scale: one anti-join shuffle on the key + a union — the same shape a
    Delta/Iceberg MERGE plans under the hood (minus file-level pruning,
    which the table formats add)."""
    base = load_table(spark, sf_dir, "customer")
    updates = base.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 1000, 2).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    inserts = base.filter(F.col("c_custkey") % 50 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    upd = updates.unionByName(inserts)
    kept = base.join(upd, "c_custkey", "left_anti").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    return kept.unionByName(upd)


@register(
    "text_quality_filter",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             round(least(len(string_split(text, ' ')) / 60.0, 1.0) * 0.4
                   + (len(list_distinct(string_split(text, ' '))) * 1.0
                      / len(string_split(text, ' '))) * 0.4
                   + (1 - len(list_filter(string_split(text, ' '),
                        w -> list_contains(['a','the','of','to','and','row','key'], w)))
                        * 1.0 / len(string_split(text, ' '))) * 0.2, 6) AS q
      FROM documents
    )
    SELECT doc_id, lang, q AS quality_score
    FROM scored
    WHERE q >= (SELECT round(quantile_cont(q, 0.25), 6) FROM scored)
    """,
    tags=("pipeline", "text"),
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-threshold corpus filter: keep documents whose composite
    quality score clears the corpus 25th percentile — scoring + scalar
    percentile subquery + filter, the canonical pretraining quality gate.
    (Exact percentile here for the oracle; at 100 TB the threshold comes
    from percentile_approx and is broadcast.)"""
    from etl_caic_spark.operators.text_analysis import quality_features

    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", quality_features(F.col("text"))["quality_score"].alias("q")
    )
    scored.createOrReplaceTempView("scored_quality_tmp")
    return spark.sql(
        """
        SELECT doc_id, lang, q AS quality_score
        FROM scored_quality_tmp
        WHERE q >= (SELECT round(percentile(q, 0.25), 6)
                    FROM scored_quality_tmp)
        """
    )


@register(
    "text_redact_pii",
    oracle="""
    WITH enriched AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1-303-555-01' || CAST(doc_id % 100 AS VARCHAR)
                  ELSE text END AS text
      FROM documents WHERE doc_id % 15 = 0
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9()\\-]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
             AS n_emails
    FROM enriched
    """,
    tags=("pipeline", "text"),
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: email + phone patterns replaced with placeholder
    tokens (deterministic synthetic PII is injected into a slice of docs
    so the redaction paths actually fire). Pure regexp_replace — codegen,
    partition-parallel, the standard pre-training scrub."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 15 == 0)
    enriched = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact: user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or +1-303-555-01"),
                (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    email_re = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    phone_re = "\\+?[0-9][0-9()\\-]{7,}[0-9]"
    return enriched.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("redacted"),
        F.regexp_count("text", F.lit(email_re)).cast("int").alias("n_emails"),
    )


@register(
    "scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type,
           CAST(row_number() OVER w AS BIGINT) AS version,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM changes
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("pipeline", "scd", "window"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history build from a change
    stream: consecutive duplicate states collapse, each surviving change
    opens a version row with [valid_from, valid_to) bounds and an
    is_current flag (valid_to = next change's timestamp via lead()).

    Scale: two windows over the SAME (user_id, ts) partitioning — the
    sort is reused across both (one shuffle); this is the standard
    warehouse pattern for dimension snapshots from CDC feeds."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_all))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@register(
    "mv_incremental_refresh",
    oracle="""
    SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d')
             AS day,
           event_type,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 / 100.0, 2) AS sum_value,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 / 100.0 / count(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("pipeline", "incremental", "agg"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh: the daily-aggregate MV is
    NOT recomputed from scratch — the stored base partials are merged
    with a late-arriving delta batch's partials by re-aggregating
    sum-of-sums / sum-of-counts. The delta is a slice CUTTING ACROSS all
    days (event_id % 7 — late events land in old days, the hard case),
    so nearly every (day, type) key exists on BOTH sides and the merge
    genuinely combines partials rather than concatenating disjoint key
    ranges. The oracle aggregates the whole table directly: equality
    proves merge(partials(base), partials(delta)) == full recompute, the
    property every incremental pipeline depends on. Measures ride as
    integer cents (exact, order-independent); avg is derived at read
    time, never averaged. At 100 TB the base partials are the stored MV
    and the merge shuffles only partial rows (|days| x |types|), not
    facts."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        "event_type",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
    )

    def partials(df):
        return df.groupBy("day", "event_type").agg(
            F.sum("vc").alias("sv"), F.count("*").alias("n")
        )

    base = partials(ev.filter(F.col("event_id") % 7 != 0))
    delta = partials(ev.filter(F.col("event_id") % 7 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(F.sum("sv").alias("sv"), F.sum("n").alias("n"))
    )
    return merged.select(
        "day",
        "event_type",
        F.round(F.col("sv") / 100.0, 2).alias("sum_value"),
        "n",
        F.round(F.col("sv") / 100.0 / F.col("n"), 6).alias("avg_value"),
    )
