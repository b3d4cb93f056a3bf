"""Round-6 extension wave: distributed order statistics, time-decay
attribution, deterministic negative sampling, and length-grouped
batching.

Each query keeps the repo's conventions (registry.py): identical column
aliases on both engines, accumulated floats frozen to integer micro
units before any sum, per-row IEEE arithmetic left exact, BIGINT casts
in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "agg_median_selection",
    oracle="""
    WITH t AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
    k AS (
      SELECT (n + 1) // 2 AS km, (n * 99 + 99) // 100 AS kp FROM n
    ), r AS (
      SELECT c, CAST(row_number() OVER (ORDER BY c) AS BIGINT) AS rn FROM t
    )
    SELECT n.n AS n, rm.c AS median_cents, rp.c AS p99_cents
    FROM n, k, r rm, r rp
    WHERE rm.rn = k.km AND rp.rn = k.kp
    """,
    tags=("agg", "stat", "scale"),
)
def agg_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median and p99 of order value with NO global sort
    and no window anywhere: operators/selection.py histogram bisection —
    per round one map-side-partial aggregate whose output is <= 4096
    rows, with the narrowing range filter PUSHED DOWN to the parquet
    reader (later rounds skip row groups by min/max stats). <= 6 rounds
    cover a full 64-bit domain.

    The oracle is the sort-based rank definition (k-th smallest, lower
    median at k=(n+1)//2, p99 at k=ceil(0.99n)) — the hash match proves
    the bisection finds the EXACT order statistic, not an approximation.
    This is the scale formulation of exact percentiles: the sort-based
    form is O(n log n) with a global shuffle; this is O(rounds) scans
    with only cell-count rows ever crossing the wire. agg_percentile_
    exact (per-group) and agg_approx_quantile (GK sketch) are the
    siblings; this anchors the exact-global case they cannot cover at
    100 TB."""
    from etl_caic_spark.operators.selection import kth_smallest_multi

    t = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    # multi-k bisection (round 11): both order statistics narrow from
    # the SAME histogram scan each round, and n comes from the bounds
    # job — 1 + rounds + 1 jobs total where the two independent
    # bisections plus count() used to take ~9.
    n, (med, p99) = kth_smallest_multi(
        t, "c", lambda n: [(n + 1) // 2, (n * 99 + 99) // 100]
    )
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("median_cents", T.LongType()),
            T.StructField("p99_cents", T.LongType()),
        ]
    )
    return spark.createDataFrame([(n, med, p99)], schema)


@register(
    "attrib_time_decay",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT event_id AS touch_id, user_id, ts AS t_ts, event_type
      FROM events WHERE event_type IN ('click', 'view')
    ), pt AS (
      SELECT purchase_id, p.user_id AS user_id, touch_id, event_type,
             CAST(round(1000000.0 / (1.0 +
               (epoch_us(CAST(p_ts AS TIMESTAMP))
                - epoch_us(CAST(t_ts AS TIMESTAMP))) / 86400000000.0))
               AS BIGINT) AS w_micro
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t_ts < p_ts AND t_ts >= p_ts - INTERVAL 7 DAY
    )
    SELECT purchase_id, user_id, touch_id, event_type AS touch_type,
           w_micro,
           round(w_micro * 1.0
                 / (sum(w_micro) OVER (PARTITION BY purchase_id)), 6)
             AS credit
    FROM pt
    """,
    tags=("analytics", "clickstream"),
)
def attrib_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution — the third standard model
    beside attrib_last_touch and attrib_linear_multi_touch: each touch
    in the 7-day lookback earns weight 1/(1 + age_days), normalized per
    purchase. The rational decay (not exp) is chosen for cross-engine
    bit-exactness: division is IEEE-exact-rounded on both engines while
    libm pow/exp may differ in the last ulp; age is microsecond-exact
    (unix_micros / epoch_us — the fixture has sub-second timestamps, so
    second-floored diffs would diverge between engines). Weights freeze
    to integer micro BEFORE the per-purchase sum (registry.py
    discipline).

    Plan: the same user-equi + time-range join as the linear model
    (shuffle on user, range as post-join filter; per-bucket zipper at
    100 TB), then one purchase-partitioned window for the normalizer.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        "event_type",
    )
    age_days = (
        (F.unix_micros("p_ts") - F.unix_micros("t_ts"))
        / F.lit(86400000000.0)
    )
    joined = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select(
        "purchase_id",
        "user_id",
        "touch_id",
        F.col("event_type").alias("touch_type"),
        F.round(F.lit(1000000.0) / (F.lit(1.0) + age_days))
        .cast("bigint")
        .alias("w_micro"),
    )
    w = Window.partitionBy("purchase_id")
    return joined.withColumn(
        "credit",
        F.round(F.col("w_micro") * F.lit(1.0) / F.sum("w_micro").over(w), 6),
    )


@register(
    "ml_negative_sampling",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
    cand AS (
      SELECT e.vec_id, e.label, j.j,
             CAST(('0x' || substr(md5('negs-v1|' || CAST(e.vec_id AS VARCHAR)
                   || '|' || CAST(j.j AS VARCHAR)), 1, 8)) AS BIGINT)
               % n.n AS neg_vec_id
      FROM embeddings e
      CROSS JOIN n
      CROSS JOIN (SELECT unnest(generate_series(1, 4)) AS j) j
    )
    SELECT c.vec_id, CAST(c.j AS INT) AS j, c.neg_vec_id,
           c.label AS anchor_label, g.label AS neg_label,
           (c.label <> g.label) AS is_valid
    FROM cand c JOIN embeddings g ON g.vec_id = c.neg_vec_id
    """,
    tags=("ml", "llm", "embeddings"),
)
def ml_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor vector draws k=4 candidate negatives by keyed hash
    (md5('negs-v1|vec_id|j') mod pool size — dense vec_ids make the
    draw a direct index, no pool ranking needed), joins the candidate's
    label back, and flags collisions with the anchor's own label
    (is_valid=false) instead of resampling — the standard
    sample-then-filter scheme, kept deterministic so the draw is
    hash-verifiable cross-engine.

    Plan: the draw is pure map-side scalar hashing; the only shuffle is
    the equi-join on neg_vec_id (co-partitioned by id at 100 TB, where
    the embedding table is already bucketed by vec_id). Resampling
    loops, the nondeterministic alternative, would need per-row RNG
    state and an unbounded retry join — rejected."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    n = e.count()
    cand = (
        e.withColumn("j", F.explode(F.sequence(F.lit(1), F.lit(4))))
        .withColumn(
            "neg_vec_id",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("negs-v1|"),
                            F.col("vec_id").cast("string"),
                            F.lit("|"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % F.lit(n),
        )
        .select(
            "vec_id",
            F.col("j").cast("int").alias("j"),
            "neg_vec_id",
            F.col("label").alias("anchor_label"),
        )
    )
    g = e.select(
        F.col("vec_id").alias("neg_vec_id"), F.col("label").alias("neg_label")
    )
    return cand.join(g, "neg_vec_id").select(
        "vec_id",
        "j",
        "neg_vec_id",
        "anchor_label",
        "neg_label",
        (F.col("anchor_label") != F.col("neg_label")).alias("is_valid"),
    )


@register(
    "token_length_batches",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, n_tokens,
             CAST(row_number() OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
               AS rn
      FROM d
    )
    SELECT (rn - 1) // 32 AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS real_tokens,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
             AS padding_tokens
    FROM r GROUP BY 1
    """,
    tags=("text", "llm", "scale"),
)
def token_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batching for inference/training: sort documents
    by token count globally, cut into fixed batches of 32, and report
    each batch's padding cost (docs x batch-max minus real tokens) —
    the batching that minimizes padding waste subject to fixed batch
    size (the sortish/length-grouped sampler every serving stack uses;
    token_bucket_padding prices the fixed-grid alternative).

    The global length ranking uses operators/prefix.py (range partition
    + boundary offsets — partitioned windows only), making this a
    practical consumer of the distributed-rank machinery rather than a
    single-task ntile: the oracle's global row_number proves the
    distributed ranking bit-exact."""
    from etl_caic_spark.operators.prefix import with_global_order

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    r = with_global_order(
        d, ["n_tokens", "doc_id"], rn_col="rn", num_partitions=16
    )
    return (
        r.withColumn("batch_id", F.expr("(rn - 1) div 32"))
        .groupBy("batch_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").cast("bigint").alias("real_tokens"),
            (F.count("*") * F.max("n_tokens") - F.sum("n_tokens"))
            .cast("bigint")
            .alias("padding_tokens"),
        )
    )
