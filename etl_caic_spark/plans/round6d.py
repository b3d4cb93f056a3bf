"""Round-6 fourth wave: item-item recommendation, community-quality
scoring (modularity), WOE/IV categorical encoding, k-NN classification,
position-based attribution, a hash-deterministic permutation test, and
the Theil-Sen robust trend estimator.

Conventions (registry.py): identical aliases both engines; everything
that crosses an aggregation is exact integers; libm outputs (ln, sqrt)
freeze to integer micro before any sum or ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from etl_caic_spark.plans.round6b import (
    _event_edges_sym_sql,
    _lpa_round_sql,
    lpa_communities,
)
from etl_caic_spark.operators.hashmix import md5_words_sql, mix, with_md5_words
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import widen_narrow_scan


@register(
    "rec_item_knn",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, p_brand AS item
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), ci AS (
      SELECT item, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY 1
    ), co AS (
      SELECT a.item AS i, b.item AS j, CAST(count(*) AS BIGINT) AS cij
      FROM items a JOIN items b ON a.okey = b.okey AND a.item <> b.item
      GROUP BY 1, 2
    ), scored AS (
      SELECT i, j, cij,
             CAST(round(cij * 1000000.0 / sqrt(ca.c * 1.0 * cb.c))
                  AS BIGINT) AS cos_micro
      FROM co JOIN ci ca ON co.i = ca.item JOIN ci cb ON co.j = cb.item
    )
    SELECT i AS item, j AS neighbor, cij, cos_micro,
           CAST(row_number() OVER (PARTITION BY i
                ORDER BY cos_micro DESC, j ASC) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
    tags=("analytics", "recommendation", "similarity"),
)
def rec_item_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-5 nearest neighbors per
    item by co-occurrence cosine, sim(i,j) = c_ij / sqrt(c_i * c_j) —
    the classic neighborhood recommender built from basket
    co-occurrence counts alone (Sarwar et al., WWW'01). Similarity
    freezes to integer micro before ranking; ties break on neighbor id.

    Plan: identical scale skeleton to basket_assoc_rules — broadcast
    part dim, distinct to basket grain, okey self-join bounded by
    basket size k (O(orders*k^2)), then a per-item top-5 window that
    Spark 4 compiles to WindowGroupLimit (partial top-k, no global
    sort). Item-count dim is broadcast-sized at any scale."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "part").select(
                    "p_partkey", "p_brand"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
    )
    ci = items.groupBy("item").agg(F.count("*").cast("bigint").alias("c"))
    b = items.select(F.col("okey").alias("bokey"), F.col("item").alias("bitem"))
    co = (
        items.join(
            b,
            (F.col("okey") == F.col("bokey")) & (F.col("item") != F.col("bitem")),
        )
        .groupBy(F.col("item").alias("i"), F.col("bitem").alias("j"))
        .agg(F.count("*").cast("bigint").alias("cij"))
    )
    ca = ci.select(F.col("item").alias("i"), F.col("c").alias("c_i"))
    cb = ci.select(F.col("item").alias("j"), F.col("c").alias("c_j"))
    scored = (
        co.join(F.broadcast(ca), "i")
        .join(F.broadcast(cb), "j")
        .select(
            "i",
            "j",
            "cij",
            F.round(
                F.col("cij")
                * F.lit(1000000.0)
                / F.sqrt(F.col("c_i") * F.lit(1.0) * F.col("c_j"))
            )
            .cast("bigint")
            .alias("cos_micro"),
        )
    )
    w = Window.partitionBy("i").orderBy(
        F.col("cos_micro").desc(), F.col("j").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("neighbor"),
            "cij",
            "cos_micro",
            "rank",
        )
    )


@register(
    "graph_modularity",
    oracle="WITH "
    + _event_edges_sym_sql()
    + """, l0 AS (
      SELECT u AS v, u AS label FROM edges GROUP BY u
    )"""
    + _lpa_round_sql("l0", "l1")
    + _lpa_round_sql("l1", "l2")
    + _lpa_round_sql("l2", "l3")
    + """, deg AS (
      SELECT u AS v, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1
    ), m AS (
      SELECT CAST(count(*) AS BIGINT) AS m_dir FROM edges
    ), within AS (
      SELECT ca.label AS community, CAST(count(*) AS BIGINT) AS e_within
      FROM edges e
      JOIN l3 ca ON e.u = ca.v
      JOIN l3 cb ON e.v = cb.v AND ca.label = cb.label
      GROUP BY 1
    ), dsum AS (
      SELECT label AS community, CAST(count(*) AS BIGINT) AS size,
             CAST(sum(d) AS BIGINT) AS d_c
      FROM l3 JOIN deg USING (v) GROUP BY 1
    ), terms AS (
      SELECT ds.community, ds.size, coalesce(w.e_within, 0) AS e_within,
             ds.d_c,
             coalesce(w.e_within, 0) * m_dir - ds.d_c * ds.d_c AS q_num,
             m_dir
      FROM dsum ds LEFT JOIN within w USING (community) CROSS JOIN m
    )
    SELECT community, size, e_within, d_c, q_num,
           round(CAST(sum(q_num) OVER () AS BIGINT)
                 / (m_dir * 1.0 * m_dir), 6) AS modularity
    FROM terms
    """,
    tags=("graph", "eval"),
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the label-propagation communities — the
    standard community-quality score: Q = sum_c [ e_c/m - (d_c/2m)^2 ]
    over the undirected graph. With the symmetric directed edge set
    (|E_dir| = 2m, within-community directed count = 2*e_c), Q
    rearranges to sum_c (e_within_dir*m_dir - d_c^2) / m_dir^2 whose
    NUMERATOR is an exact integer per community — the only double is
    the final division. Degree sums fit BIGINT to ~3e9 edges; above
    that the d_c^2 term rides DECIMAL(38,0) (the moment-query ladder).

    Plan: reuses the LPA machinery (edges cached, 3 label rounds), then
    two linear joins: edges->labels on both endpoints for the within
    count (shuffle on vertex, same profile as an LPA round) and
    labels->degrees for d_c. Community-grain output; the OVER () total
    runs on community cardinality, the accepted bounded class."""
    edges, labels = lpa_communities(spark, sf_dir, rounds=3)
    deg = edges.groupBy(F.col("u").alias("v")).agg(
        F.count("*").cast("bigint").alias("d")
    )
    m = edges.agg(F.count("*").cast("bigint").alias("m_dir"))
    ca = labels.select(F.col("v").alias("u"), F.col("label").alias("la"))
    cb = labels.select(F.col("v").alias("vv"), F.col("label").alias("lb"))
    within = (
        edges.join(ca, "u")
        .join(cb, F.col("v") == F.col("vv"))
        .filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("community"))
        .agg(F.count("*").cast("bigint").alias("e_within"))
    )
    dsum = (
        labels.join(deg, "v")
        .groupBy(F.col("label").alias("community"))
        .agg(
            F.count("*").cast("bigint").alias("size"),
            F.sum("d").cast("bigint").alias("d_c"),
        )
    )
    terms = (
        dsum.join(within, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "size",
            F.coalesce(F.col("e_within"), F.lit(0)).alias("e_within"),
            "d_c",
            (
                F.coalesce(F.col("e_within"), F.lit(0)) * F.col("m_dir")
                - F.col("d_c") * F.col("d_c")
            ).alias("q_num"),
            "m_dir",
        )
    )
    return terms.select(
        "community",
        "size",
        "e_within",
        "d_c",
        "q_num",
        F.round(
            F.sum("q_num").over(Window.partitionBy()).cast("bigint")
            / (F.col("m_dir") * F.lit(1.0) * F.col("m_dir")),
            6,
        ).alias("modularity"),
    )


@register(
    "feat_woe_iv",
    oracle="""
    WITH cells AS (
      SELECT o_orderpriority AS category,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS pos_c,
             CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
                  AS BIGINT) AS neg_c
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(pos_c) AS BIGINT) AS pos_t,
             CAST(sum(neg_c) AS BIGINT) AS neg_t
      FROM cells
    ), t AS (
      SELECT category, pos_c, neg_c,
             CAST(round(ln(((pos_c + 0.5) * neg_t)
                  / ((neg_c + 0.5) * 1.0 * pos_t)) * 1000000.0)
                  AS BIGINT) AS woe_micro,
             pos_t, neg_t
      FROM cells CROSS JOIN tot
    ), iv AS (
      SELECT category, pos_c, neg_c, woe_micro,
             CAST(round((pos_c * 1.0 / pos_t - neg_c * 1.0 / neg_t)
                  * woe_micro) AS BIGINT) AS iv_term_micro
      FROM t
    )
    SELECT category, pos_c, neg_c, woe_micro, iv_term_micro,
           round(CAST(sum(iv_term_micro) OVER () AS BIGINT) / 1000000.0, 6)
             AS iv_total
    FROM iv
    """,
    tags=("feature", "ml"),
)
def feat_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-Evidence encoding + Information Value for the order
    priority feature against the finished-status target — the standard
    credit-scoring categorical encoder: WOE_c = ln((pos_c/POS)/
    (neg_c/NEG)) with +0.5 Laplace smoothing on the cell counts (so
    empty cells stay finite), IV = sum (pos share - neg share) * WOE.

    WOE freezes to integer micro (ln is libm) and the IV terms multiply
    the FROZEN woe_micro so both engines accumulate identical integers;
    iv_total is the only unfrozen double, a single mirrored division.
    One groupBy to cells, margins re-aggregated from cells, category-
    grain OVER () — the stat_mutual_info scale profile: one scan."""
    cells = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("category"))
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("pos_c"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 0).otherwise(1))
            .cast("bigint")
            .alias("neg_c"),
        )
    )
    tot = cells.agg(
        F.sum("pos_c").cast("bigint").alias("pos_t"),
        F.sum("neg_c").cast("bigint").alias("neg_t"),
    )
    t = cells.crossJoin(F.broadcast(tot)).select(
        "category",
        "pos_c",
        "neg_c",
        F.round(
            F.log(
                ((F.col("pos_c") + F.lit(0.5)) * F.col("neg_t"))
                / ((F.col("neg_c") + F.lit(0.5)) * F.lit(1.0) * F.col("pos_t"))
            )
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("woe_micro"),
        "pos_t",
        "neg_t",
    )
    iv = t.select(
        "category",
        "pos_c",
        "neg_c",
        "woe_micro",
        F.round(
            (
                F.col("pos_c") * F.lit(1.0) / F.col("pos_t")
                - F.col("neg_c") * F.lit(1.0) / F.col("neg_t")
            )
            * F.col("woe_micro")
        )
        .cast("bigint")
        .alias("iv_term_micro"),
    )
    return iv.select(
        "category",
        "pos_c",
        "neg_c",
        "woe_micro",
        "iv_term_micro",
        F.round(
            F.sum("iv_term_micro").over(Window.partitionBy()).cast("bigint")
            / F.lit(1000000.0),
            6,
        ).alias("iv_total"),
    )


@register(
    "ml_knn_classify",
    oracle="""
    WITH n AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
             sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                     CAST(embedding AS DOUBLE[]))) AS nrm
      FROM embeddings
    ), test AS (SELECT * FROM n WHERE vec_id % 10 = 0),
    train AS (SELECT * FROM n WHERE vec_id % 10 <> 0),
    nn AS (
      SELECT t.vec_id, t.label AS label_true, c.label AS nn_label,
             CAST(row_number() OVER (PARTITION BY t.vec_id
                ORDER BY round(list_inner_product(t.e, c.e)
                         / (t.nrm * c.nrm), 6) DESC, c.vec_id)
               AS BIGINT) AS rank
      FROM test t JOIN train c ON TRUE
      QUALIFY rank <= 5
    ), votes AS (
      SELECT vec_id, label_true, nn_label,
             CAST(count(*) AS BIGINT) AS votes
      FROM nn GROUP BY 1, 2, 3
    )
    SELECT vec_id, label_true, nn_label AS label_pred, votes,
           CASE WHEN nn_label = label_true THEN 1 ELSE 0 END AS correct
    FROM votes
    QUALIFY row_number() OVER (PARTITION BY vec_id
      ORDER BY votes DESC, nn_label ASC) = 1
    """,
    tags=("ml", "similarity"),
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN classification over the embeddings table: every tenth
    vector is a test point, its 5 nearest training neighbors by cosine
    vote on the label (majority, ties to the smallest label) — the
    distributed eval loop for an embedding-space classifier.

    Similarities round to 6 dp before ranking (the brute_force_topk
    discipline) so near-ties order identically; both the per-test top-5
    and the top-vote pick are PARTITIONED windows that compile to
    WindowGroupLimit. The test side broadcasts (it is the small side by
    construction); at 100 TB the recall stage swaps to the IVF index
    (sim_topk_ivf) with the same vote tail."""
    from etl_caic_spark.operators.similarity import _dot, with_norm

    n = with_norm(load_table(spark, sf_dir, "embeddings"))
    test = n.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("t_id"),
        F.col("label").alias("label_true"),
        F.col("_vec").alias("t_vec"),
        F.col("_norm").alias("t_norm"),
    )
    # widen_narrow_scan (r15 optimization): embeddings.parquet is ONE
    # file -> ONE partition, so the 360k-pair cosine projection AND the
    # per-test partial top-5 (Sort + WindowGroupLimit below the first
    # exchange) ran in a single task. Widening the train side spreads
    # the whole pre-exchange pipeline across the cluster; the broadcast
    # test side stays narrow. Result-identical: cosine is per-row and
    # the top-5 window re-sorts post-shuffle.
    train = widen_narrow_scan(
        n.filter(F.col("vec_id") % 10 != 0).select(
            F.col("vec_id").alias("c_id"),
            F.col("label").alias("nn_label"),
            F.col("_vec").alias("c_vec"),
            F.col("_norm").alias("c_norm"),
        )
    )
    scored = train.crossJoin(F.broadcast(test)).select(
        F.col("t_id").alias("vec_id"),
        "label_true",
        "nn_label",
        "c_id",
        F.round(
            _dot(F.col("t_vec"), F.col("c_vec"))
            / (F.col("t_norm") * F.col("c_norm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    nn = scored.withColumn(
        "rank", F.row_number().over(w).cast("bigint")
    ).filter(F.col("rank") <= 5)
    votes = nn.groupBy("vec_id", "label_true", "nn_label").agg(
        F.count("*").cast("bigint").alias("votes")
    )
    vw = Window.partitionBy("vec_id").orderBy(
        F.col("votes").desc(), F.col("nn_label").asc()
    )
    return (
        votes.withColumn("vr", F.row_number().over(vw))
        .filter(F.col("vr") == 1)
        .select(
            "vec_id",
            "label_true",
            F.col("nn_label").alias("label_pred"),
            "votes",
            F.when(F.col("nn_label") == F.col("label_true"), 1)
            .otherwise(0)
            .alias("correct"),
        )
    )


@register(
    "attrib_position_based",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ), touches AS (
      SELECT event_id AS touch_id, user_id, ts AS t_ts, event_type
      FROM events WHERE event_type IN ('click', 'view')
    ), pt AS (
      SELECT purchase_id, p.user_id AS user_id, touch_id,
             event_type AS touch_type, t_ts
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t_ts < p_ts AND t_ts >= p_ts - INTERVAL 7 DAY
    ), pos AS (
      SELECT purchase_id, user_id, touch_id, touch_type,
             CAST(row_number() OVER (PARTITION BY purchase_id
                  ORDER BY t_ts, touch_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS k
      FROM pt
    )
    SELECT purchase_id, user_id, touch_id, touch_type, rn, k,
           CASE WHEN k = 1 THEN 1000000
                WHEN k = 2 THEN 500000
                WHEN rn = 1 OR rn = k THEN 400000
                ELSE CAST(round(200000.0 / (k - 2)) AS BIGINT)
           END AS credit_micro
    FROM pos
    """,
    tags=("analytics", "clickstream"),
)
def attrib_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — the fourth
    standard model beside last-touch / linear / time-decay: first and
    last touch in the 7-day lookback each earn 40%, the middle splits
    the remaining 20% evenly (k=1 -> 100%, k=2 -> 50/50). Credits are
    integer micro; the middle share's single rounded division is
    mirrored, so the whole credit column is engine-exact.

    Plan: same user-equi + time-range join as the sibling models, then
    ONE purchase-partitioned window pass computing both the position
    and the touch count (no second shuffle — rn and k share the
    partition)."""
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
        F.col("event_type").alias("touch_type"),
    )
    pt = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    ).select("purchase_id", "user_id", "touch_id", "touch_type", "t_ts")
    wp = Window.partitionBy("purchase_id")
    pos = pt.select(
        "purchase_id",
        "user_id",
        "touch_id",
        "touch_type",
        F.row_number()
        .over(wp.orderBy("t_ts", "touch_id"))
        .cast("bigint")
        .alias("rn"),
        F.count("*").over(wp).cast("bigint").alias("k"),
    )
    return pos.select(
        "purchase_id",
        "user_id",
        "touch_id",
        "touch_type",
        "rn",
        "k",
        F.when(F.col("k") == 1, F.lit(1000000).cast("bigint"))
        .when(F.col("k") == 2, F.lit(500000).cast("bigint"))
        .when(
            (F.col("rn") == 1) | (F.col("rn") == F.col("k")),
            F.lit(400000).cast("bigint"),
        )
        .otherwise(
            F.round(F.lit(200000.0) / (F.col("k") - 2)).cast("bigint")
        )
        .alias("credit_micro"),
    )


_PERM_R = 19


@register(
    "stat_permutation_test",
    oracle=f"""
    WITH b AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS in_a,
             CAST(l_orderkey AS VARCHAR) || '-'
               || CAST(l_linenumber AS VARCHAR) AS rk
      FROM lineitem WHERE l_returnflag IN ('A', 'R')
    ), words AS (
      SELECT q, in_a, {md5_words_sql("rk", "perm-v2")} FROM b
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(in_a) AS BIGINT) AS n1
      FROM b
    ), s AS (
      SELECT perm, (5 * perm + 1) % 32 AS s1, (11 * perm + 17) % 32 AS s2
      FROM (SELECT unnest(generate_series(0, {_PERM_R})) AS perm)
    ), assigned AS (
      SELECT perm, q,
             CASE WHEN perm = 0 THEN in_a
                  WHEN xor(xor(w1,
                       ((w2 & ((1::BIGINT << (32 - s1)) - 1)) << s1)
                         + (w2 >> (32 - s1))),
                       ((w3 & ((1::BIGINT << (32 - s2)) - 1)) << s2)
                         + (w3 >> (32 - s2)))
                     < (n1 * 4294967296) // n THEN 1
                  ELSE 0 END AS a
      FROM words CROSS JOIN s CROSS JOIN tot
    ), stats AS (
      SELECT perm,
             CAST(sum(a) AS BIGINT) AS n_a,
             CAST(count(*) - sum(a) AS BIGINT) AS n_b,
             CAST(round((sum(a * q) * 1.0 / sum(a)
                  - sum((1 - a) * q) * 1.0 / (count(*) - sum(a)))
                  * 1000000.0) AS BIGINT) AS diff_micro
      FROM assigned GROUP BY 1
    ), obs AS (
      SELECT CAST(max(CASE WHEN perm = 0 THEN abs(diff_micro) END)
                  AS BIGINT) AS obs_abs
      FROM stats
    ), pv AS (
      SELECT round((1.0 + sum(CASE WHEN perm > 0
                    AND abs(diff_micro) >= obs_abs THEN 1 ELSE 0 END))
                   / {_PERM_R + 1}.0, 6) AS p_value
      FROM stats CROSS JOIN obs
    )
    SELECT CAST(perm AS INT) AS perm, n_a, n_b, diff_micro, p_value
    FROM stats CROSS JOIN pv
    """,
    tags=("stat", "scale"),
)
def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization (approximate permutation) test for the quantity
    mean difference between the 'A' and 'R' populations: 19 label
    reshuffles, each assigning rows to pseudo-group A with probability
    n1/n via a hash threshold (exact integer `(n1 * 2^32) div n` —
    integer division on both engines, so no double-mantissa boundary
    flips; exact while n1 < 2^31, i.e. up to ~sf500), plus the observed
    labeling as permutation 0. The p-value is the standard add-one
    Monte Carlo estimate (1 + #{|diff_r| >= |diff_obs|}) / (R+1).
    Binomial group sizes (rather than exactly n1) make this the
    large-sample randomization variant — the only version that needs
    no global shuffle of labels.

    Round-8 rewrite (r7 verdict asks #2/#3): ONE md5 per row — the
    digest's three 32-bit words seed the rotate-XOR replicate mixer
    (operators/hashmix.py), replacing the 20-md5 ladder — and ZERO row
    expansion: all 19 permuted (n_a, sum_aq) pairs plus the observed
    pair are 40 columns of a single aggregate pass (map-side partial
    -> one combined row), so shuffle volume is one row per partition
    regardless of input size. The diffs, observed |diff|, and p-value
    are then scalar expressions over that single row, unpivoted to the
    20 output rows at the end. The DuckDB oracle keeps the row-expanded
    formulation (clearer in SQL, identical semantics) with the mixer
    inlined exactly as stat_bootstrap_ci's oracle does."""
    b = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.col("l_quantity").cast("bigint").alias("q"),
            F.when(F.col("l_returnflag") == "A", 1).otherwise(0).alias("in_a"),
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("-"),
                F.col("l_linenumber").cast("string"),
            ).alias("rk"),
        )
    )
    # widen_narrow_scan (r15 optimization): same narrow-scan hazard as
    # stat_bootstrap_ci — the 3-partition lineitem scan serialized the
    # md5 + 19-replicate mixer ladder onto 3 cores; widening the narrow
    # base rows moves the heavy expressions above the exchange to full
    # width. The `tot` aggregate keeps reading the un-widened b (two
    # trivial scalar sums). with_md5_words materializes the digest once
    # (the expression form ran md5 3x per row — see hashmix.py).
    # Result-identical: order-independent sums, bit-identical words.
    rows = with_md5_words(
        widen_narrow_scan(b), F.col("rk"), "perm-v2", ["q", "in_a"]
    )
    tot = b.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("in_a").cast("bigint").alias("n1"),
    )
    joined = rows.crossJoin(F.broadcast(tot))
    thr = F.expr("(n1 * 4294967296) div n")
    aggs = []
    for r in range(_PERM_R + 1):
        if r == 0:
            a = F.col("in_a")
        else:
            hv = mix(F.col("w1"), F.col("w2"), F.col("w3"), r)
            a = F.when(hv < thr, 1).otherwise(0)
        aggs.append(F.sum(a).cast("bigint").alias(f"na_{r}"))
        aggs.append(
            F.sum(a * F.col("q")).cast("bigint").alias(f"saq_{r}")
        )
    aggs.append(F.count("*").cast("bigint").alias("n_all"))
    aggs.append(F.sum("q").cast("bigint").alias("sq_all"))
    one = joined.agg(*aggs)

    def diff_micro(r: int):
        na = F.col(f"na_{r}")
        saq = F.col(f"saq_{r}")
        return (
            F.round(
                (
                    saq * F.lit(1.0) / na
                    - (F.col("sq_all") - saq)
                    * F.lit(1.0)
                    / (F.col("n_all") - na)
                )
                * F.lit(1000000.0)
            )
            .cast("bigint")
        )

    one = one.select(
        "*", *[diff_micro(r).alias(f"d_{r}") for r in range(_PERM_R + 1)]
    )
    exceed = sum(
        (
            F.when(F.abs(F.col(f"d_{r}")) >= F.abs(F.col("d_0")), 1).otherwise(0)
            for r in range(1, _PERM_R + 1)
        ),
        F.lit(0),
    )
    one = one.select(
        "*",
        F.round((F.lit(1.0) + exceed) / F.lit(float(_PERM_R + 1)), 6).alias(
            "p_value"
        ),
    )
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("perm"),
                        F.col(f"na_{r}").alias("n_a"),
                        (F.col("n_all") - F.col(f"na_{r}"))
                        .cast("bigint")
                        .alias("n_b"),
                        F.col(f"d_{r}").alias("diff_micro"),
                        F.col("p_value").alias("p_value"),
                    )
                    for r in range(_PERM_R + 1)
                ]
            )
        ).alias("s")
    ).select("s.*")


@register(
    "ts_theil_sen",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), idx AS (
      SELECT x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
      FROM d
    ), pairs AS (
      SELECT CAST(round((b.x - a.x) * 1000000.0 / (b.t - a.t))
                  AS BIGINT) AS slope_micro
      FROM idx a JOIN idx b ON b.t > a.t
    ), med AS (
      SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(quantile_disc(slope_micro, 0.5) AS BIGINT)
               AS slope_micro_med
      FROM pairs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n_days,
           n_pairs, slope_micro_med,
           (SELECT CAST(quantile_disc(x * 1000000 - slope_micro_med * t,
                                      0.5) AS BIGINT)
            FROM idx CROSS JOIN med) AS intercept_micro_med
    FROM med
    """,
    tags=("ts", "stat", "scale"),
)
def ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily order-count series: the
    median over all C(n,2) pairwise slopes, with the intercept as the
    median residual — the breakdown-point-0.29 alternative to OLS that
    one outlier day cannot move. Slopes freeze to integer micro (one
    mirrored division each), so the median is over exact integers;
    both medians are LOWER medians (k = (n+1)//2), which DuckDB's
    quantile_disc(0.5) computes identically.

    Plan: the pair join runs at DAY grain (bounded cardinality — n
    days gives n^2/2 slope rows, independent of fact-table size), and
    both medians use the windowless selection operator
    (operators/selection.kth_smallest: histogram bisection, bounded
    4096-row aggregates) — no global sort anywhere. At 100 TB the
    daily rollup is the only data-scale pass."""
    from etl_caic_spark.operators.selection import kth_smallest_multi

    d = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    idx = d.select(
        "x",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("t"),
    ).localCheckpoint()
    a = idx.select(F.col("t").alias("at"), F.col("x").alias("ax"))
    b = idx.select(F.col("t").alias("bt"), F.col("x").alias("bx"))
    pairs = a.join(b, F.col("bt") > F.col("at")).select(
        F.round(
            (F.col("bx") - F.col("ax"))
            * F.lit(1000000.0)
            / (F.col("bt") - F.col("at"))
        )
        .cast("bigint")
        .alias("slope_micro")
    )
    pairs = pairs.localCheckpoint()
    # n_pairs / n_days ride the selection's bounds jobs (round 11) —
    # no separate count() actions.
    n_pairs, (slope,) = kth_smallest_multi(
        pairs, "slope_micro", lambda n: [(n + 1) // 2]
    )
    resid = idx.select(
        (F.col("x") * F.lit(1000000) - F.lit(slope) * F.col("t")).alias(
            "r"
        )
    )
    n_days, (intercept,) = kth_smallest_multi(
        resid, "r", lambda n: [(n + 1) // 2]
    )
    schema = T.StructType(
        [
            T.StructField("n_days", T.LongType()),
            T.StructField("n_pairs", T.LongType()),
            T.StructField("slope_micro_med", T.LongType()),
            T.StructField("intercept_micro_med", T.LongType()),
        ]
    )
    return spark.createDataFrame(
        [(n_days, n_pairs, slope, intercept)], schema
    )
