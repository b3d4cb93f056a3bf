"""Wave 14 (round 5): weighted shortest paths, haversine kNN, exact
higher-moment statistics, and a declarative data-quality rule suite —
four more families a warehouse-plus-training-data engine needs.

Oracle strategies: Bellman-Ford over integer weights is unrolled into
the same fixed rounds as CTEs (the graph_bfs_hops technique, with
min-plus instead of hop counts); haversine distances are frozen to 6
decimals before ranking with a total-order tiebreak (the ln-freeze
precedent from text_unigram_logprob applied to trig); skew/kurtosis
come from order-independent exact DECIMAL power sums converted once to
double through an identical expression tree; the DQ suite is a UNION of
exact violation counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_SSSP_ROUNDS = 4
_SSSP_SEED_MOD = 29


def _sssp_oracle() -> str:
    head = f"""
    WITH seq AS (
      SELECT lag(user_id) OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS src,
             user_id AS dst
      FROM events
    ),
    edges AS (
      SELECT src, dst, CAST((src + dst) % 9 + 1 AS BIGINT) AS w
      FROM (SELECT DISTINCT src, dst FROM seq
            WHERE src IS NOT NULL AND src <> dst)
    ),
    nodes AS (
      SELECT DISTINCT v FROM (
        SELECT src AS v FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    d0 AS (SELECT v, CAST(0 AS BIGINT) AS dist FROM nodes
           WHERE v % {_SSSP_SEED_MOD} = 0)"""
    body = ""
    for i in range(1, _SSSP_ROUNDS + 1):
        body += f""",
    d{i} AS (
      SELECT v, min(dist) AS dist FROM (
        SELECT v, dist FROM d{i - 1}
        UNION ALL
        SELECT e.dst AS v, d.dist + e.w AS dist
        FROM d{i - 1} d JOIN edges e ON d.v = e.src
      ) GROUP BY v
    )"""
    return (
        head
        + body
        + f"""
    SELECT v AS user_id, CAST(dist AS BIGINT) AS dist
    FROM d{_SSSP_ROUNDS}
    """
    )


@register("graph_sssp_weighted", oracle=_sssp_oracle(), tags=("graph", "iterative"))
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source weighted shortest paths (Bellman-Ford, 4 rounds)
    over the deterministic event-interaction graph, with an integer
    weight derived from the endpoints ((src+dst)%9+1) so relaxation is
    exact min-plus arithmetic — hash-matchable, unlike float weights.
    Each round is one join (frontier ⋈ edges on src) plus a min-combine:
    the same per-round shuffle cost as graph_bfs_hops, but distances can
    IMPROVE after a vertex is first reached (the weighted difference BFS
    can't express — a 3-edge cheap path beats a 1-edge expensive one),
    so the min-combine must union the previous distances rather than
    only the frontier. The oracle unrolls the identical rounds as CTEs.
    At 100 TB: edges cache across rounds, the frontier is bounded by
    |V|, and 4 rounds = 4 shuffles — the standard doubling/bounded-hop
    compromise every distributed SSSP makes."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    edges = (
        seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
        .withColumn("w", ((F.col("src") + F.col("dst")) % 9 + 1).cast("bigint"))
    )
    nodes = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    dist = nodes.filter(F.col("v") % _SSSP_SEED_MOD == 0).select(
        "v", F.lit(0).cast("bigint").alias("dist")
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = dist.join(edges, dist["v"] == edges["src"]).select(
            F.col("dst").alias("v"), (F.col("dist") + F.col("w")).alias("dist")
        )
        dist = (
            dist.unionByName(relaxed).groupBy("v").agg(F.min("dist").alias("dist"))
        )
    return dist.select(F.col("v").alias("user_id"), "dist")


@register(
    "geo_haversine_knn",
    oracle="""
    WITH pts AS (
      SELECT vec_id,
             CAST(embedding[1] AS DOUBLE) * 90.0 AS lat,
             CAST(embedding[2] AS DOUBLE) * 180.0 AS lon
      FROM embeddings
    ),
    q AS (SELECT * FROM pts WHERE vec_id % 100 = 0),
    pairs AS (
      SELECT q.vec_id AS query_id, p.vec_id AS neighbor_id,
             round(
               12742.0 * asin(sqrt(
                 pow(sin(radians(p.lat - q.lat) / 2), 2)
                 + cos(radians(q.lat)) * cos(radians(p.lat))
                   * pow(sin(radians(p.lon - q.lon) / 2), 2)
               )),
               6) AS dist_km
      FROM q JOIN pts p ON p.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist_km, neighbor_id) AS rnk
      FROM pairs
    )
    SELECT query_id, neighbor_id, dist_km, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
    tags=("geo", "join", "ann"),
)
def geo_haversine_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle k-nearest-neighbors (k=3) from a small query set to
    the full point corpus (coordinates derived from the first two
    embedding dims scaled to degrees). The haversine distance is frozen
    to 6 decimals BEFORE ranking and the rank tiebreaks on neighbor_id —
    the same freeze-then-compare technique that makes ln-based oracles
    exact, applied to trig. The query side (1%) is broadcast, so the
    plan is one scan of the corpus with a nested-loop against ~|Q| rows
    and a per-query top-k — the brute-force correctness anchor for the
    geo family, same role sim_topk_cosine plays for ANN. At 100 TB you
    prune candidates with geo_grid_join's cell binning first and run
    THIS distance only on the survivors; the docstringed pairing of
    anchor + pruned path is the contract."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        (F.element_at("embedding", 1).cast("double") * 90.0).alias("lat"),
        (F.element_at("embedding", 2).cast("double") * 180.0).alias("lon"),
    )
    q = pts.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("lat").alias("qlat"),
        F.col("lon").alias("qlon"),
    )
    j = pts.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    dlat = F.radians(F.col("lat") - F.col("qlat")) / 2
    dlon = F.radians(F.col("lon") - F.col("qlon")) / 2
    h = (
        F.pow(F.sin(dlat), 2)
        + F.cos(F.radians("qlat")) * F.cos(F.radians("lat")) * F.pow(F.sin(dlon), 2)
    )
    pairs = j.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(12742.0 * F.asin(F.sqrt(h)), 6).alias("dist_km"),
    )
    wn = Window.partitionBy("query_id").orderBy("dist_km", "neighbor_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(wn).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "dist_km", "rnk")
    )


@register(
    "agg_skew_kurtosis",
    oracle="""
    WITH y AS (
      SELECT o_orderpriority AS prio,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT) AS c
      FROM orders
    ),
    s AS (
      SELECT prio,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS DOUBLE) AS s1,
             CAST(sum(c * c) AS DOUBLE) AS s2,
             CAST(sum(c * c * c) AS DOUBLE) AS s3,
             CAST(sum((c * c) * (c * c)) AS DOUBLE) AS s4
      FROM y GROUP BY 1
    )
    SELECT prio, n,
           round((s3 / n - 3 * (s1 / n) * (s2 / n)
                  + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * sqrt(s2 / n - (s1 / n) * (s1 / n))), 6) AS skewness,
           round((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                 / ((s2 / n - (s1 / n) * (s1 / n))
                    * (s2 / n - (s1 / n) * (s1 / n))) - 3, 6)
             AS excess_kurtosis
    FROM s
    """,
    tags=("agg", "stats"),
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group skewness and excess kurtosis from EXACT power sums:
    Σc, Σc², Σc³, Σc⁴ of integer cents accumulate in DECIMAL(38,0)
    (c⁴ ≈ 6e18 per row already brushes int64, and the sums blow far
    past it — the decimal accumulator is the whole trick), then convert
    ONCE to double and evaluate the central-moment formulas through an
    expression tree written identically on both engines. This is the
    distributed-safe version of the built-in skewness()/kurtosis(),
    whose streaming double updates are partitioning-order-dependent and
    can never hash-match. One map-side-combinable aggregate; at 100 TB
    the decimal sums cost a few extra bytes per partial and nothing
    else."""
    o = load_table(spark, sf_dir, "orders")
    c = F.round(F.col("o_totalprice") * 100).cast("bigint")
    y = o.select(F.col("o_orderpriority").alias("prio"), c.alias("c"))
    dec = "decimal(38,0)"
    cc = F.col("c").cast(dec)
    s = y.groupBy("prio").agg(
        F.count("*").alias("n"),
        F.sum(cc).cast("double").alias("s1"),
        F.sum(cc * cc).cast("double").alias("s2"),
        F.sum(cc * cc * cc).cast("double").alias("s3"),
        F.sum((cc * cc) * (cc * cc)).cast("double").alias("s4"),
    )
    n = F.col("n")
    m1 = F.col("s1") / n
    r2 = F.col("s2") / n
    r3 = F.col("s3") / n
    r4 = F.col("s4") / n
    m2 = r2 - m1 * m1
    m3 = r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1
    m4 = r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1
    return s.select(
        "prio",
        "n",
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    )


@register(
    "dq_constraint_suite",
    oracle="""
    SELECT 'orders_totalprice_positive' AS rule,
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT)
             AS violations,
           CAST(count(*) AS BIGINT) AS checked
    FROM orders
    UNION ALL
    SELECT 'orders_status_in_domain',
           CAST(count(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P'))
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_date_in_range',
           CAST(count(*) FILTER (WHERE o_orderdate < TIMESTAMP '1990-01-01'
                                    OR o_orderdate >= TIMESTAMP '2030-01-01')
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST(count(*) FILTER (
             WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
             AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_orderkey_unique',
           CAST((SELECT coalesce(sum(cnt - 1), 0) FROM (
              SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey
              HAVING count(*) > 1)) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    """,
    tags=("dq", "agg"),
)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule suite (the Deequ/expectations
    pattern): five constraint classes — positivity, domain membership,
    range, referential integrity, key uniqueness — each reported as
    (rule, violations, checked). Everything is computed in ONE pass
    shape: the scalar rules share a single scan via conditional counts,
    the FK check is a broadcast anti-join counted, and uniqueness is a
    keyed aggregate; the row-per-rule report then unions tiny 1-row
    frames. At 100 TB you run exactly this as the post-ingest gate —
    conditional aggregation keeps it one fact scan + one groupBy, and
    the report is O(rules), not O(rows)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    total = o.count()

    def rule(name: str, viol_col) -> DataFrame:
        return o.agg(
            F.lit(name).alias("rule"),
            F.sum(F.when(viol_col, 1).otherwise(0)).alias("violations"),
            F.count("*").alias("checked"),
        )

    scalar_rules = [
        rule("orders_totalprice_positive", F.col("o_totalprice") <= 0),
        rule(
            "orders_status_in_domain",
            ~F.col("o_orderstatus").isin("F", "O", "P"),
        ),
        rule(
            "orders_date_in_range",
            (F.col("o_orderdate") < "1990-01-01")
            | (F.col("o_orderdate") >= "2030-01-01"),
        ),
    ]
    fk_viol = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(
            F.lit("orders_custkey_fk").alias("rule"),
            F.count("*").alias("violations"),
        )
        .withColumn("checked", F.lit(total))
    )
    uniq_viol = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(
            F.lit("orders_orderkey_unique").alias("rule"),
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).alias("violations"),
        )
        .withColumn("checked", F.lit(total))
    )
    out = scalar_rules[0]
    for r in scalar_rules[1:] + [fk_viol, uniq_viol]:
        out = out.unionByName(r)
    return out
