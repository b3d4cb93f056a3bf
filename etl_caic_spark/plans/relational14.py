"""Wave 32b (round 5): two Spark-4 API surfaces — nested-struct
rewriting with Column.withField/dropFields (schema evolution INSIDE a
nested column, no unpack-repack) and collation-aware string matching
(UNICODE_CI equality without lowercasing the stored data).

Exactness: the struct rewrite outputs flattened fields the oracle
recomputes; collated grouping is oracled via lower() (equivalent for
this ASCII fixture — the collation applies locale rules lower() does
not, stated in the docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "fn_struct_withfield",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS hdr_status,
           CAST(round(o_totalprice * 100) AS BIGINT) AS hdr_cents,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CAST(o_orderkey % 100 AS BIGINT) AS hdr_adjusted_cents,
           upper(o_orderpriority) AS hdr_priority_norm
    FROM orders WHERE o_orderkey % 50 = 0
    """,
    tags=("fn", "nested"),
)
def fn_struct_withfield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct surgery with Column.withField / dropFields — the
    Spark-native way to evolve a nested payload IN PLACE: a header
    struct is built, then (a) a derived field is ADDED
    (withField('adjusted_cents', …)), (b) an existing field is
    REWRITTEN (withField('priority_norm', upper(...)) after
    dropFields('priority')) — all without exploding the struct into
    top-level columns and re-assembling it, which is what pre-3.1
    pipelines (and naive ports) do. The final struct is flattened for
    output so the oracle can recompute each field scalar-for-scalar.

    Scale: withField compiles to an UpdateFields expression inside
    whole-stage codegen — a pure projection, zero shuffles; on deeply
    nested parquet this is the difference between rewriting one leaf
    and reconstructing the whole tree (and it preserves column pruning
    for untouched siblings)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 50 == 0)
    hdr = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderpriority").alias("priority"),
    )
    evolved = (
        o.withColumn("hdr", hdr)
        .withColumn(
            "hdr",
            F.col("hdr").withField(
                "adjusted_cents",
                F.col("hdr.cents") + (F.col("o_orderkey") % 100).cast("bigint"),
            ),
        )
        .withColumn(
            "hdr",
            F.col("hdr")
            .withField("priority_norm", F.upper(F.col("hdr.priority")))
            .dropFields("priority"),
        )
    )
    return evolved.select(
        "o_orderkey",
        F.col("hdr.status").alias("hdr_status"),
        F.col("hdr.cents").alias("hdr_cents"),
        F.col("hdr.adjusted_cents").alias("hdr_adjusted_cents"),
        F.col("hdr.priority_norm").alias("hdr_priority_norm"),
    )


@register(
    "fn_collation_ci",
    oracle="""
    WITH noisy AS (
      SELECT o_orderkey,
             CASE o_orderkey % 3
               WHEN 0 THEN upper(o_orderpriority)
               WHEN 1 THEN lower(o_orderpriority)
               ELSE o_orderpriority END AS pri_cased
      FROM orders
    )
    SELECT lower(pri_cased) AS pri_ci,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT pri_cased) AS BIGINT) AS n_case_variants
    FROM noisy GROUP BY 1
    """,
    tags=("fn", "string"),
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATIONS: keys arrive
    with inconsistent casing (the classic hand-entered-data problem),
    and grouping on collate(key, 'UNICODE_CI') unifies them WITHOUT
    destroying the stored values — count(DISTINCT raw) per group shows
    exactly how many case variants were folded, the audit a
    lowercase-normalize would erase. The group key is re-exposed as
    lower() so both engines emit identical bytes (UNICODE_CI also
    folds locale cases like İ/i that lower() alone does not — on this
    ASCII fixture the two coincide, which is what makes the oracle
    valid).

    Scale: collation-aware comparison happens inside codegen on the
    shuffle key — same plan shape as any groupBy; no double-pass
    normalize-then-group."""
    o = load_table(spark, sf_dir, "orders")
    noisy = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.upper("o_orderpriority"))
        .when(F.col("o_orderkey") % 3 == 1, F.lower("o_orderpriority"))
        .otherwise(F.col("o_orderpriority"))
        .alias("pri_cased"),
    )
    return (
        noisy.groupBy(F.collate(F.col("pri_cased"), "UNICODE_CI").alias("k"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.countDistinct("pri_cased").cast("bigint").alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("k").cast("string")).alias("pri_ci"),
            "n",
            "n_case_variants",
        )
    )
