"""Round-6 second wave: rank/likelihood statistics, ranking-quality
evaluation, community detection, autocorrelation, a distributed
gradient-descent trainer, and a RAG chunk-index flagship.

Conventions (registry.py): identical aliases both engines, doubles that
cross an aggregation frozen to integer micro per row first, BIGINT casts
in DuckDB, divisions mirrored in the exact same order so per-row IEEE
arithmetic is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table


@register(
    "stat_mann_whitney",
    oracle="""
    WITH pooled AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS in_a
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), per_v AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(in_a) AS BIGINT) AS cnt_a
      FROM pooled GROUP BY v
    ), ranked AS (
      SELECT a.v, a.cnt, a.cnt_a,
             2 * CAST(coalesce(sum(b.cnt), 0) AS BIGINT) + a.cnt + 1
               AS rank2
      FROM per_v a LEFT JOIN per_v b ON b.v < a.v
      GROUP BY a.v, a.cnt, a.cnt_a
    ), agg AS (
      SELECT CAST(sum(cnt_a) AS BIGINT) AS n1,
             CAST(sum(cnt - cnt_a) AS BIGINT) AS n2,
             CAST(sum(cnt_a * rank2) AS BIGINT) AS r_a2,
             CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie
      FROM ranked
    )
    SELECT n1, n2, r_a2 - n1 * (n1 + 1) AS u2,
           round((r_a2 - n1 * (n1 + 1) - n1 * n2)
                 / (2.0 * sqrt((n1 * n2) / 12.0
                    * ((n1 + n2 + 1)
                       - tie / ((n1 + n2) * ((n1 + n2) - 1.0))))), 6) AS z,
           round((r_a2 - n1 * (n1 + 1)) / (2.0 * (n1 * n2)), 6) AS auc
    FROM agg
    """,
    tags=("stat", "scale"),
)
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (rank-sum) test comparing l_quantity between the
    'A' and 'R' return-flag populations, with the full tie correction —
    the standard nonparametric two-sample location test, plus its AUC
    effect-size reading (U / n1*n2 is exactly P(X > Y) + 0.5*P(X = Y)).

    ZERO WindowExec anywhere: average ranks come from per-value counts
    (a bounded groupBy on the value support) plus a broadcast triangular
    self-join for the cumulative count-below — the same windowless
    cumulative the binned KS uses (stat_ks_binned). All rank algebra is
    kept in integers (rank2 = twice the average rank is always integral;
    u2 = 2*U likewise), so the statistic is bit-exact cross-engine; only
    the final z / AUC divisions are doubles, mirrored operation-for-
    operation against the oracle. At 100 TB: one map-side-combined
    groupBy on the value column; the triangular join is support² rows —
    for continuous supports, pre-bin to a fixed grid first (the KS
    pattern) and the tie correction prices the binning."""
    pooled = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_quantity").cast("bigint").alias("v"),
            F.when(F.col("l_returnflag") == "A", 1).otherwise(0).alias("in_a"),
        )
    )
    per_v = pooled.groupBy("v").agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum("in_a").cast("bigint").alias("cnt_a"),
    )
    below = per_v.select(
        F.col("v").alias("bv"), F.col("cnt").alias("bcnt")
    )
    ranked = (
        per_v.join(F.broadcast(below), F.col("bv") < F.col("v"), "left")
        .groupBy("v", "cnt", "cnt_a")
        .agg(
            (
                F.lit(2) * F.coalesce(F.sum("bcnt"), F.lit(0)).cast("bigint")
                + F.col("cnt")
                + F.lit(1)
            ).alias("rank2")
        )
    )
    agg = ranked.agg(
        F.sum("cnt_a").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("bigint").alias("n2"),
        F.sum(F.col("cnt_a") * F.col("rank2")).cast("bigint").alias("r_a2"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tie"),
    )
    n1, n2, r_a2, tie = F.col("n1"), F.col("n2"), F.col("r_a2"), F.col("tie")
    nn = n1 + n2
    var_u = (n1 * n2) / F.lit(12.0) * (
        (nn + F.lit(1)) - tie / (nn * (nn - F.lit(1.0)))
    )
    return agg.select(
        "n1",
        "n2",
        (r_a2 - n1 * (n1 + F.lit(1))).alias("u2"),
        F.round(
            (r_a2 - n1 * (n1 + F.lit(1)) - n1 * n2)
            / (F.lit(2.0) * F.sqrt(var_u)),
            6,
        ).alias("z"),
        F.round(
            (r_a2 - n1 * (n1 + F.lit(1))) / (F.lit(2.0) * (n1 * n2)), 6
        ).alias("auc"),
    )


@register(
    "stat_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS ss
      FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1
    ), w AS (
      SELECT
        (SELECT n FROM g WHERE flag = 'A') AS n1,
        (SELECT s FROM g WHERE flag = 'A') AS s1,
        (SELECT ss FROM g WHERE flag = 'A') AS ss1,
        (SELECT n FROM g WHERE flag = 'R') AS n2,
        (SELECT s FROM g WHERE flag = 'R') AS s2,
        (SELECT ss FROM g WHERE flag = 'R') AS ss2
    ), v AS (
      SELECT n1, n2,
             s1 / (n1 * 1.0) AS m1, s2 / (n2 * 1.0) AS m2,
             (n1 * ss1 - s1 * s1) / ((n1 * (n1 - 1)) * 1.0) / (n1 * 1.0)
               AS vn1,
             (n2 * ss2 - s2 * s2) / ((n2 * (n2 - 1)) * 1.0) / (n2 * 1.0)
               AS vn2
      FROM w
    )
    SELECT n1, n2, round(m1, 6) AS mean_a, round(m2, 6) AS mean_r,
           round((m1 - m2) / sqrt(vn1 + vn2), 6) AS t_stat,
           round((vn1 + vn2) * (vn1 + vn2)
                 / (vn1 * vn1 / (n1 - 1.0) + vn2 * vn2 / (n2 - 1.0)), 3)
             AS df
    FROM v
    """,
    tags=("stat",),
)
def stat_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on l_quantity between the 'A' and
    'R' populations, with the Welch-Satterthwaite degrees of freedom.

    One map-side-combined groupBy produces (n, sum, sum-of-squares) per
    group as exact BIGINTs (quantities are integral, so no float enters
    any aggregation); the t statistic and df come from those six integers
    by the numerically-stable n*ss - s*s form, every double op mirrored
    against the oracle. This is the canonical single-pass two-sample
    test: at 100 TB it is one partial-aggregate scan, no shuffle beyond
    the 2-row combine."""
    q = F.col("l_quantity").cast("bigint")
    g = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(q).cast("bigint").alias("s"),
            F.sum(q * q).cast("bigint").alias("ss"),
        )
    )
    a = g.filter(F.col("flag") == "A").select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    r = g.filter(F.col("flag") == "R").select(
        F.col("n").alias("n2"), F.col("s").alias("s2"), F.col("ss").alias("ss2")
    )
    w = a.crossJoin(r)
    n1, n2 = F.col("n1"), F.col("n2")
    m1 = F.col("s1") / (n1 * F.lit(1.0))
    m2 = F.col("s2") / (n2 * F.lit(1.0))
    vn1 = (
        (n1 * F.col("ss1") - F.col("s1") * F.col("s1"))
        / ((n1 * (n1 - F.lit(1))) * F.lit(1.0))
        / (n1 * F.lit(1.0))
    )
    vn2 = (
        (n2 * F.col("ss2") - F.col("s2") * F.col("s2"))
        / ((n2 * (n2 - F.lit(1))) * F.lit(1.0))
        / (n2 * F.lit(1.0))
    )
    return w.select(
        "n1",
        "n2",
        F.round(m1, 6).alias("mean_a"),
        F.round(m2, 6).alias("mean_r"),
        F.round((m1 - m2) / F.sqrt(vn1 + vn2), 6).alias("t_stat"),
        F.round(
            (vn1 + vn2) * (vn1 + vn2)
            / (
                vn1 * vn1 / (n1 - F.lit(1.0))
                + vn2 * vn2 / (n2 - F.lit(1.0))
            ),
            3,
        ).alias("df"),
    )


_NDCG_SCORE_SALT = "ndcg-v1|"


def _pseudo_score(col, salt: str):
    """Deterministic 'model score' from a keyed md5 — the stand-in for a
    learned ranker, hash-verifiable cross-engine."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")


@register(
    "eval_ndcg_at_k",
    oracle="""
    WITH scored AS (
      SELECT o_custkey, o_orderkey,
             CAST(('0x' || substr(md5('ndcg-v1|'
                   || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
               AS score,
             least(CAST(floor(o_totalprice / 100000) AS BIGINT), 4) AS rel
      FROM orders
    ), ranked AS (
      SELECT o_custkey, rel,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY score DESC, o_orderkey) AS BIGINT) AS rn
      FROM scored
    ), ideal AS (
      SELECT o_custkey, rel,
             CAST(row_number() OVER (PARTITION BY o_custkey
                  ORDER BY rel DESC, o_orderkey) AS BIGINT) AS rn
      FROM scored
    ), dcg AS (
      SELECT o_custkey,
             CAST(sum(CAST(round((power(2, rel) - 1) * 1000000.0
                  / ln(rn + 1.0)) AS BIGINT)) AS BIGINT) AS dcg_micro
      FROM ranked WHERE rn <= 10 GROUP BY 1
    ), idcg AS (
      SELECT o_custkey,
             CAST(sum(CAST(round((power(2, rel) - 1) * 1000000.0
                  / ln(rn + 1.0)) AS BIGINT)) AS BIGINT) AS idcg_micro
      FROM ideal WHERE rn <= 10 GROUP BY 1
    )
    SELECT d.o_custkey, d.dcg_micro, i.idcg_micro,
           CASE WHEN i.idcg_micro > 0
                THEN round(d.dcg_micro * 1.0 / i.idcg_micro, 6) END AS ndcg
    FROM dcg d JOIN idcg i ON d.o_custkey = i.o_custkey
    """,
    tags=("eval", "ml", "retrieval"),
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per customer: orders are the per-customer candidate list,
    a keyed-hash pseudo-score plays the learned ranker, and graded
    relevance is the price tier (0..4). DCG uses the exponential-gain
    form; the log-base constant cancels in the DCG/IDCG ratio, so ln
    replaces log2 with identical NDCG. Per-position gains freeze to
    integer micro BEFORE the per-customer sum (registry.py discipline —
    ln is libm, whose last-ulp may differ across engines; the BM25
    family proved the micro-freeze absorbs it).

    Plan: both rankings are windows PARTITIONED by customer with a
    rank<=k filter — Spark 4 compiles these to WindowGroupLimit partial
    top-k, so no customer's candidate list is ever globally sorted. At
    100 TB this is the standard offline ranking-eval shape: shuffle on
    the query key, top-k within, two bounded aggregates."""
    scored = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        _pseudo_score(F.col("o_orderkey"), _NDCG_SCORE_SALT).alias("score"),
        F.least(
            F.floor(F.col("o_totalprice") / 100000).cast("bigint"), F.lit(4)
        ).alias("rel"),
    )

    def _dcg(df: DataFrame, order, out: str) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(*order)
        term = F.round(
            (F.pow(F.lit(2), F.col("rel")) - F.lit(1))
            * F.lit(1000000.0)
            / F.log(F.col("rn") + F.lit(1.0))
        ).cast("bigint")
        return (
            df.withColumn("rn", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rn") <= 10)
            .groupBy("o_custkey")
            .agg(F.sum(term).cast("bigint").alias(out))
        )

    dcg = _dcg(
        scored, [F.col("score").desc(), F.col("o_orderkey")], "dcg_micro"
    )
    idcg = _dcg(
        scored, [F.col("rel").desc(), F.col("o_orderkey")], "idcg_micro"
    )
    return dcg.join(idcg, "o_custkey").select(
        "o_custkey",
        "dcg_micro",
        "idcg_micro",
        F.when(
            F.col("idcg_micro") > 0,
            F.round(F.col("dcg_micro") * F.lit(1.0) / F.col("idcg_micro"), 6),
        ).alias("ndcg"),
    )


@register(
    "eval_pr_at_k",
    oracle="""
    WITH scored AS (
      SELECT o_custkey, o_orderkey,
             CAST(('0x' || substr(md5('prk-v1|'
                   || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
               AS score,
             CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END AS rel
      FROM orders
    ), ranked AS (
      SELECT o_custkey, rel,
             row_number() OVER (PARTITION BY o_custkey
                ORDER BY score DESC, o_orderkey) AS rn
      FROM scored
    )
    SELECT o_custkey,
           CAST(sum(rel) AS BIGINT) AS rel_total,
           CAST(sum(CASE WHEN rn <= 5 THEN rel ELSE 0 END) AS BIGINT)
             AS hits,
           round(sum(CASE WHEN rn <= 5 THEN rel ELSE 0 END) / 5.0, 6)
             AS precision_at_5,
           CASE WHEN sum(rel) > 0
                THEN round(sum(CASE WHEN rn <= 5 THEN rel ELSE 0 END) * 1.0
                           / sum(rel), 6) END AS recall_at_5
    FROM ranked GROUP BY o_custkey
    """,
    tags=("eval", "ml", "retrieval"),
)
def eval_pr_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision@5 / Recall@5 per customer over the same pseudo-ranker
    as eval_ndcg_at_k, with binary relevance (order value > 300k).
    Customers with zero relevant orders get NULL recall (0/0), mirrored
    as CASE/when on both engines so neither produces NaN.

    Plan: one customer-partitioned window (rank only — the aggregation
    happens in the same grouped pass via conditional sums, so the top-k
    slice never materializes separately), then a single groupBy. Counts
    are integers end-to-end; only the two final ratios are doubles."""
    scored = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        _pseudo_score(F.col("o_orderkey"), "prk-v1|").alias("score"),
        F.when(F.col("o_totalprice") > 300000, 1).otherwise(0).alias("rel"),
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("score").desc(), F.col("o_orderkey")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    hits = F.sum(F.when(F.col("rn") <= 5, F.col("rel")).otherwise(0))
    return ranked.groupBy("o_custkey").agg(
        F.sum("rel").cast("bigint").alias("rel_total"),
        hits.cast("bigint").alias("hits"),
        F.round(hits / F.lit(5.0), 6).alias("precision_at_5"),
        F.when(
            F.sum("rel") > 0,
            F.round(hits * F.lit(1.0) / F.sum("rel"), 6),
        ).alias("recall_at_5"),
    )


def _event_edges_sym_sql() -> str:
    return """
    seq AS (
      SELECT lag(user_id) OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS src,
             user_id AS dst
      FROM events
    ), pc AS (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE src IS NOT NULL AND src <> dst
      GROUP BY 1, 2
    ), kept AS (
      SELECT pc.a, pc.b FROM pc
      JOIN customer ca ON pc.a = ca.c_custkey
      JOIN customer cb ON pc.b = cb.c_custkey
      WHERE ca.c_nationkey = cb.c_nationkey OR pc.c >= 5
    ), edges AS (
      SELECT a AS u, b AS v FROM kept
      UNION
      SELECT b AS u, a AS v FROM kept
    )"""


def _lpa_round_sql(prev: str, cur: str) -> str:
    return f""", {cur} AS (
      SELECT e.v, l.label
      FROM edges e JOIN {prev} l ON e.u = l.v
      GROUP BY e.v, l.label
      QUALIFY row_number() OVER (PARTITION BY e.v
        ORDER BY count(*) DESC, l.label ASC) = 1
    )"""


@register(
    "graph_label_propagation",
    oracle="WITH "
    + _event_edges_sym_sql()
    + """, l0 AS (
      SELECT u AS v, u AS label FROM edges GROUP BY u
    )"""
    + _lpa_round_sql("l0", "l1")
    + _lpa_round_sql("l1", "l2")
    + _lpa_round_sql("l2", "l3")
    + """
    SELECT v AS user_id, label AS community FROM l3
    """,
    tags=("graph", "iterative"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (3 rounds) over the undirected
    user-affinity graph: every vertex starts as its own label; each
    round it adopts the most frequent label among its neighbors, ties
    broken by the smallest label — the deterministic variant of LPA
    community detection (raw LPA's random tie-breaks can't be
    hash-verified).

    Edge rule (planted-partition sparsifier): consecutive-event user
    pairs (lag per event_type) are counted; a pair becomes an edge when
    BOTH endpoint user_ids are customer keys (inner joins to the
    customer dim — non-customer event users are dropped regardless of
    co-occurrence count) AND the users either share a nation (homophily
    edges) or co-occur >= 5 times (strong cross-community ties). The raw
    consecutive-pair graph is near-complete at any density (avg degree
    ~n), so every partition scores modularity ~0 on it; restricting to
    same-market + heavy pairs yields a graph whose community structure
    LPA can actually recover — the standard benchmark construction.

    Plan per round: one join (labels ⋈ edges on the source endpoint),
    one count groupBy, one vertex-partitioned top-1 window (compiled to
    WindowGroupLimit — no global sort). The oracle unrolls the same 3
    rounds as QUALIFY CTEs. At 100 TB: edges cache across rounds
    partitioned by u; each round's shuffle is linear in edge count, the
    same profile as the pagerank/BFS/SSSP siblings. Fixed rounds rather
    than convergence detection keeps the plan static; real deployments
    pick rounds ~ graph diameter."""
    _, labels = lpa_communities(spark, sf_dir)
    return labels.select(
        F.col("v").alias("user_id"), F.col("label").alias("community")
    )


def lpa_communities(
    spark: SparkSession, sf_dir: str, rounds: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Shared LPA machinery: (symmetric edge set, labels after `rounds`
    synchronous min-label rounds). Used by graph_label_propagation and
    the modularity scorer (round6d).

    Edges: consecutive-event user pairs kept when same-nation (customer
    dim broadcast) or co-occurrence count >= 5 — see the
    graph_label_propagation docstring for why the raw pair graph is
    unusable (near-complete)."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("user_id").over(w).alias("src"), F.col("user_id").alias("dst")
    )
    pc = (
        seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    kept = (
        pc.join(
            F.broadcast(cust.select(F.col("c_custkey").alias("a"),
                                    F.col("c_nationkey").alias("na"))),
            "a",
        )
        .join(
            F.broadcast(cust.select(F.col("c_custkey").alias("b"),
                                    F.col("c_nationkey").alias("nb"))),
            "b",
        )
        .filter((F.col("na") == F.col("nb")) | (F.col("c") >= 5))
        .select("a", "b")
    )
    edges = (
        kept.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .union(kept.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    labels = edges.select(F.col("u").alias("v")).distinct().select(
        "v", F.col("v").alias("label")
    )
    for _ in range(rounds):
        nb = edges.join(
            labels.select(F.col("v").alias("u"), "label"), "u"
        ).select("v", "label")
        cnt = nb.groupBy("v", "label").agg(F.count("*").alias("cnt"))
        tw = Window.partitionBy("v").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(tw))
            .filter(F.col("rn") == 1)
            .select("v", "label")
        )
    return edges, labels


@register(
    "ts_acf",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM d
    ), st AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s
      FROM idx
    ), c AS (
      SELECT t, n * x - s AS xc FROM idx CROSS JOIN st
    ), den AS (
      SELECT CAST(sum(xc * xc) AS BIGINT) AS den FROM c
    ), lags AS (SELECT unnest(generate_series(1, 7)) AS lag)
    SELECT CAST(l.lag AS INT) AS lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(CAST(sum(a.xc * b.xc) AS BIGINT) / (den * 1.0), 6) AS acf
    FROM lags l
    JOIN c a ON TRUE
    JOIN c b ON b.t = a.t + l.lag
    CROSS JOIN den
    GROUP BY l.lag, den
    """,
    tags=("ts", "stat"),
)
def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-count series at lags 1..7 —
    the seasonality probe behind ts_seasonal_decompose (a weekly cycle
    shows as a lag-7 peak). Uses the full-series-mean ACF estimator,
    kept EXACT in integers by clearing denominators: with S = Σx and
    n days, centered value xc_t = n*x_t - S is integral, num_k =
    Σ xc_t*xc_{t+k} and den = Σ xc_t² are exact BIGINTs, and
    acf_k = num_k/den is one mirrored double division.

    The series is day-grain (bounded cardinality — the accepted class
    for a global index window); the lagged pairing is an equi-join on
    the day index, not a window, so the 7 lags come from one join
    against a 7-row generated dimension. At 100 TB the daily rollup is
    the only data-scale pass."""
    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    idx = d.select(
        "x",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
    )
    st = idx.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    c = idx.crossJoin(F.broadcast(st)).select(
        "t", (F.col("n") * F.col("x") - F.col("s")).alias("xc")
    )
    den = c.agg(F.sum(F.col("xc") * F.col("xc")).cast("bigint").alias("den"))
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = c.select(F.col("t").alias("at"), F.col("xc").alias("axc"))
    b = c.select(F.col("t").alias("bt"), F.col("xc").alias("bxc"))
    return (
        F.broadcast(lags)
        .join(a)
        .join(b, F.col("bt") == F.col("at") + F.col("lag"))
        .crossJoin(F.broadcast(den))
        .groupBy(F.col("lag").cast("int").alias("lag"), F.col("den"))
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.col("axc") * F.col("bxc")).cast("bigint")
                / (F.col("den") * F.lit(1.0)),
                6,
            ).alias("acf"),
        )
        .select("lag", "n_pairs", "acf")
    )


_GD_ITERS = 3
_GD_LR = 0.5


def _gd_oracle() -> str:
    """Unroll the fast-sigmoid GD iterations as DuckDB CTEs, each
    recomputing the gradient from the previous weights."""
    base = """
    WITH b AS (
      SELECT l_quantity / 50.0 AS x1, l_discount * 10.0 AS x2,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
    w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"""
    parts = [base]
    prev = "w0"
    for i in range(_GD_ITERS):
        cur = f"it{i + 1}"
        parts.append(f""",
    {cur} AS (
      SELECT round(max(pw0) - {_GD_LR} * (sum(CAST(round(
               (p - y) * 1000000.0) AS BIGINT)) / (max(nn) * 1000000.0)),
               9) AS w0,
             round(max(pw1) - {_GD_LR} * (sum(CAST(round(
               (p - y) * x1 * 1000000.0) AS BIGINT)) / (max(nn)
               * 1000000.0)), 9) AS w1,
             round(max(pw2) - {_GD_LR} * (sum(CAST(round(
               (p - y) * x2 * 1000000.0) AS BIGINT)) / (max(nn)
               * 1000000.0)), 9) AS w2
      FROM (
        SELECT b.x1, b.x2, b.y, w.w0 AS pw0, w.w1 AS pw1, w.w2 AS pw2,
               n.n AS nn,
               0.5 * (1.0 + (w.w0 + w.w1 * b.x1 + w.w2 * b.x2)
                 / (1.0 + abs(w.w0 + w.w1 * b.x1 + w.w2 * b.x2))) AS p
        FROM b CROSS JOIN {prev} w CROSS JOIN n
      )
    )""")
        prev = cur
    parts.append(f"""
    SELECT {prev}.w0, {prev}.w1, {prev}.w2,
           CAST(sum(CASE WHEN (CASE WHEN ({prev}.w0 + {prev}.w1 * b.x1
                + {prev}.w2 * b.x2) > 0.0 THEN 1 ELSE 0 END) = b.y
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(count(*) AS BIGINT) AS n
    FROM b CROSS JOIN {prev}
    GROUP BY {prev}.w0, {prev}.w1, {prev}.w2
    """)
    return "".join(parts)


@register(
    "ml_logreg_gd",
    oracle=_gd_oracle(),
    tags=("ml", "iterative", "scale"),
)
def ml_logreg_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-batch gradient-descent classifier (3 iterations, lr=0.5)
    predicting returnflag='R' from scaled quantity and discount — the
    canonical distributed training loop: each iteration is ONE
    map-side-combined aggregate producing a 3-number gradient, weights
    live on the driver (the kmeans/ PCA-power precedent for bounded
    driver state).

    Two bit-exactness choices make an iterative float algorithm
    hash-verifiable cross-engine: (1) the link is the ALGEBRAIC sigmoid
    sigma(z) = (1 + z/(1+|z|))/2 — rational arithmetic only, so per-row
    IEEE results are identical where libm exp() could differ in the last
    ulp; (2) per-row gradient terms freeze to integer micro before the
    sum and weights round to 9 dp each iteration, so accumulation order
    can't leak. The oracle unrolls the identical 3 iterations as CTEs.
    At 100 TB: iterations scan the (cached) feature relation; gradient
    traffic is O(features) per partition — the textbook Spark GD shape."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity") / F.lit(50.0)).alias("x1"),
        (F.col("l_discount") * F.lit(10.0)).alias("x2"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    ).localCheckpoint()
    n = li.count()
    w = [0.0, 0.0, 0.0]
    for _ in range(_GD_ITERS):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
        )
        p = F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))
        err = p - F.col("y")
        row = li.agg(
            F.sum(F.round(err * F.lit(1000000.0)).cast("bigint")).alias("g0"),
            F.sum(
                F.round(err * F.col("x1") * F.lit(1000000.0)).cast("bigint")
            ).alias("g1"),
            F.sum(
                F.round(err * F.col("x2") * F.lit(1000000.0)).cast("bigint")
            ).alias("g2"),
        ).collect()[0]
        w = [
            round(w[j] - _GD_LR * (row[f"g{j}"] / (n * 1000000.0)), 9)
            for j in range(3)
        ]
    zf = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    pred = F.when(zf > 0.0, 1).otherwise(0)
    return li.agg(
        F.min(F.lit(w[0])).alias("w0"),
        F.min(F.lit(w[1])).alias("w1"),
        F.min(F.lit(w[2])).alias("w2"),
        F.sum(F.when(pred == F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.count("*").cast("bigint").alias("n"),
    )


@register(
    "rag_chunk_index",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE doc_id % 5 = 0
    ), s AS (
      SELECT doc_id, words,
             unnest(generate_series(1, greatest(len(words) - 10, 1), 30))
               AS start
      FROM w
    ), chunks AS (
      SELECT doc_id, CAST((start - 1) // 30 AS INT) AS chunk_idx,
             words[start:start+39] AS cw
      FROM s
    ), tfx AS (
      SELECT doc_id, chunk_idx, term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, chunk_idx, unnest(cw) AS term FROM chunks)
      GROUP BY 1, 2, 3
    ), dl AS (
      SELECT doc_id, chunk_idx, CAST(len(cw) AS BIGINT) AS dl FROM chunks
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_chunks,
             sum(dl) * 1.0 / count(*) AS avgdl
      FROM dl
    ), dfs AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfx GROUP BY 1
    ), qterms AS (
      SELECT term FROM tfx GROUP BY term
      ORDER BY sum(tf) DESC, term ASC LIMIT 10
    ), wgt AS (
      SELECT tfx.doc_id, tfx.chunk_idx,
             CAST(round(
               ln(1 + (n_chunks - df + 0.5) / (df + 0.5))
               * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               * 1000000) AS BIGINT) AS w_micro
      FROM tfx
      JOIN qterms USING (term)
      JOIN dfs ON tfx.term = dfs.term
      JOIN dl ON tfx.doc_id = dl.doc_id AND tfx.chunk_idx = dl.chunk_idx
      CROSS JOIN stats
    )
    SELECT doc_id, chunk_idx, CAST(sum(w_micro) AS BIGINT) AS score_micro
    FROM wgt GROUP BY doc_id, chunk_idx
    ORDER BY score_micro DESC, doc_id ASC, chunk_idx ASC LIMIT 20
    """,
    tags=("text", "llm", "retrieval", "pipeline"),
)
def rag_chunk_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG indexing flagship: split documents into overlapping 40-token
    chunks (stride 30 — operators/text_analysis.chunk_documents, the
    retrieval-unit granularity every RAG stack uses), score each CHUNK
    with BM25 (k1=1.2, b=0.75) against the corpus's 10 heaviest terms as
    the standing query, and return the global top-20 chunks — the
    chunk-level retrieval index build that precedes embedding / serving.

    Plan: explode chunks → explode terms → tf groupBy (map-side
    combined); df / avgdl / query terms are vocab-or-scalar-sized
    broadcast dims; weights are integer-micro before the per-chunk sum;
    the global top-20 compiles to TakeOrderedAndProject. Identical scale
    profile to text_bm25_topk, one granularity down: every shuffle is
    linear in token count, nothing global but the bounded top-k."""
    from etl_caic_spark.operators.text_analysis import chunk_documents

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    chunks = chunk_documents(d, "doc_id", "text", window=40, stride=30)
    terms = chunks.select(
        "doc_id",
        "chunk_idx",
        F.explode(F.split("chunk_text", " ")).alias("term"),
    )
    tf = terms.groupBy("doc_id", "chunk_idx", "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    dl = chunks.select(
        "doc_id", "chunk_idx", F.col("chunk_tokens").cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        (F.sum("dl") * F.lit(1.0) / F.count("*")).alias("avgdl"),
    )
    dfs = tf.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
    qterms = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("_wt"))
        .orderBy(F.col("_wt").desc(), F.col("term").asc())
        .limit(10)
        .select("term")
    )
    wgt = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfs), "term")
        .join(dl, ["doc_id", "chunk_idx"])
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "chunk_idx",
            F.round(
                F.log(
                    F.lit(1)
                    + (F.col("n_chunks") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(2.2))
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75) * F.col("dl") / F.col("avgdl")
                    )
                )
                * F.lit(1000000)
            )
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    return (
        wgt.groupBy("doc_id", "chunk_idx")
        .agg(F.sum("w_micro").cast("bigint").alias("score_micro"))
        .orderBy(
            F.col("score_micro").desc(),
            F.col("doc_id").asc(),
            F.col("chunk_idx").asc(),
        )
        .limit(20)
    )
