"""Sketch queries (round 5): a fully-oracled count-min sketch.

The CMS is THE streaming/distributed frequency-estimation sketch: a
d x w counter table where item i increments cell (row, h_row(i)) in each
of d rows, and the frequency estimate is the MIN over the d cells — an
upper bound that overcounts only via hash collisions. At 100 TB the
table is d*w counters regardless of corpus size: the build is a plain
two-level groupBy (partial-aggregatable map-side), and probing is a
broadcast join against the tiny table.

Portability trick (same family as dedup_minhash_md5 / dedup_simhash_md5,
plans/llm3.py / llm4.py): the cell key is the first two hex chars of
md5(row ':' token) — a STRING, so both engines index cells identically
with no hex->int conversion at all. d=4 rows x w=256 cells.

Reference parity: the reference has no sketches (197-line Lambda ETL,
/root/reference/task.ts); this extends the training-data surface
(SURVEY.md §2.C) alongside the rows-only agg_hll_sketch /
agg_approx_quantile — CMS is the family member whose exact construction
is cheap enough to replay, so it gets a hash-matched oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_DEPTH = 4  # hash rows
# probe set: deterministic ~1/16 vocabulary sample (md5 prefix '0')
_PROBE_PREFIX = "0"


@register(
    "sketch_countmin_freq",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    t AS (SELECT tok FROM toks WHERE len(tok) > 0),
    keyed AS (
      SELECT tok, i,
             substr(md5(CAST(i AS VARCHAR) || ':' || tok), 1, 2) AS cell
      FROM t, generate_series(0, {_DEPTH - 1}) g(i)
    ),
    cms AS (
      SELECT i, cell, CAST(count(*) AS BIGINT) AS n
      FROM keyed GROUP BY 1, 2
    ),
    probes AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS exact
      FROM t
      WHERE substr(md5('p:' || tok), 1, 1) = '{_PROBE_PREFIX}'
      GROUP BY 1
    ),
    probe_cells AS (
      SELECT p.tok, p.exact, c.n
      FROM probes p
      CROSS JOIN generate_series(0, {_DEPTH - 1}) g(i)
      JOIN cms c ON c.i = g.i
      WHERE c.cell = substr(md5(CAST(g.i AS VARCHAR) || ':' || p.tok), 1, 2)
    )
    SELECT tok, exact, CAST(min(n) AS BIGINT) AS est
    FROM probe_cells
    GROUP BY tok, exact
    """,
    tags=("sketch", "text", "scale"),
)
def sketch_countmin_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the documents token stream, probed with a
    deterministic 1/16 vocabulary sample: build the 4x256 counter table
    (two-level groupBy — constant-size output), then estimate each probe
    token's frequency as the min over its 4 cells, next to the exact
    count. est >= exact ALWAYS holds (collisions only add); the oracle
    replays the identical md5-cell construction so the whole sketch is
    hash-matched, not just property-tested.

    Scale: the token scan dominates and is one pass; the CMS table is
    1024 rows regardless of corpus size and broadcast for probing. The
    probe-side exact count exists only to exhibit the error bound —
    a production probe joins the sketch alone."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.length("tok") > 0
    )
    rows_arr = F.array(*[F.lit(i) for i in range(_DEPTH)])
    keyed = toks.select("tok", F.explode(rows_arr).alias("i")).withColumn(
        "cell",
        F.substring(F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), "tok")), 1, 2),
    )
    cms = keyed.groupBy("i", "cell").agg(F.count("*").alias("n"))
    probes = (
        toks.filter(
            F.substring(F.md5(F.concat(F.lit("p:"), "tok")), 1, 1) == _PROBE_PREFIX
        )
        .groupBy("tok")
        .agg(F.count("*").alias("exact"))
    )
    probe_cells = (
        probes.select("tok", "exact", F.explode(rows_arr).alias("i"))
        .withColumn(
            "cell",
            F.substring(
                F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), "tok")), 1, 2
            ),
        )
        .join(F.broadcast(cms), ["i", "cell"])
    )
    return probe_cells.groupBy("tok", "exact").agg(F.min("n").alias("est"))


@register(
    "sketch_bloom_membership",
    oracle="""
    WITH s AS (
      SELECT DISTINCT c_name AS key FROM customer
      WHERE c_mktsegment = 'BUILDING'
    ),
    bloom AS (
      SELECT DISTINCT i,
             substr(md5(CAST(i AS VARCHAR) || '#' || key), 1, 3) AS cell
      FROM s, generate_series(0, 2) g(i)
    ),
    probes AS (
      SELECT DISTINCT c_name AS probe FROM customer
      UNION
      SELECT DISTINCT s_name FROM supplier
    ),
    hits AS (
      SELECT p.probe, count(*) AS k_hits
      FROM probes p
      CROSS JOIN generate_series(0, 2) g(i)
      JOIN bloom b ON b.i = g.i
      WHERE b.cell = substr(md5(CAST(g.i AS VARCHAR) || '#' || p.probe), 1, 3)
      GROUP BY 1
    )
    SELECT p.probe,
           coalesce(h.k_hits, 0) = 3 AS bloom_hit,
           (p.probe IN (SELECT key FROM s)) AS exact_member
    FROM probes p LEFT JOIN hits h ON h.probe = p.probe
    """,
    tags=("sketch", "scale"),
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Application-level Bloom filter, fully oracled: k=3 md5-derived
    cells per key over w=4096 cells per hash row (3-hex-char cell ids —
    portable strings, no bit arithmetic), membership = all 3 cells
    present. Sized at ~40 bits/key for the BUILDING-segment name set, so
    the false-positive rate is ~3e-4; false NEGATIVES are impossible by
    construction and the supplier names are guaranteed negatives — both
    properties pinned in tests.

    This complements join_runtime_bloom (Spark's engine-side runtime
    filter, plans/scaleq.py): here the filter is an explicit, portable
    artifact you can persist and ship to another system. Scale: the
    filter is O(k x distinct cells) rows regardless of corpus size,
    built by a distinct (partial-aggregatable) and probed via a
    broadcast join."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    s = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_name").alias("key")
    ).distinct()
    rows_arr = F.array(*[F.lit(i) for i in range(3)])

    def cell_of(col):
        return F.substring(
            F.md5(F.concat(F.col("i").cast("string"), F.lit("#"), col)), 1, 3
        )

    bloom = (
        s.select("key", F.explode(rows_arr).alias("i"))
        .select("i", cell_of(F.col("key")).alias("cell"))
        .distinct()
    )
    probes = (
        cust.select(F.col("c_name").alias("probe"))
        .union(supp.select(F.col("s_name").alias("probe")))
        .distinct()
    )
    hits = (
        probes.select("probe", F.explode(rows_arr).alias("i"))
        .withColumn("cell", cell_of(F.col("probe")))
        .join(F.broadcast(bloom), ["i", "cell"])
        .groupBy("probe")
        .agg(F.count("*").alias("k_hits"))
    )
    return (
        probes.join(hits, "probe", "left")
        .join(
            s.select(F.col("key").alias("probe"), F.lit(True).alias("m")),
            "probe",
            "left",
        )
        .select(
            "probe",
            (F.coalesce(F.col("k_hits"), F.lit(0)) == 3).alias("bloom_hit"),
            F.coalesce(F.col("m"), F.lit(False)).alias("exact_member"),
        )
    )


@register(
    "sketch_histogram_quantile",
    oracle="""
    WITH src AS (SELECT o_totalprice AS p FROM orders),
    h AS (
      SELECT least(CAST(floor(p / 7812.5) AS BIGINT), 63) AS b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM src GROUP BY 1
    ),
    cum AS (
      SELECT b, cnt,
             CAST(sum(cnt) OVER (ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c,
             CAST(sum(cnt) OVER () AS BIGINT) AS total
      FROM h
    ),
    qs AS (SELECT unnest(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS q),
    est AS (
      SELECT q,
             b * 7812.5
               + 7812.5 * (CAST(ceil(q * total) AS BIGINT) - (c - cnt))
                 / cnt AS est
      FROM qs JOIN cum
        ON c >= CAST(ceil(q * total) AS BIGINT)
       AND c - cnt < CAST(ceil(q * total) AS BIGINT)
    ),
    ex AS (
      SELECT CAST(0.5 AS DOUBLE) AS q, round(quantile_cont(p, 0.5), 6) AS exact FROM src
      UNION ALL
      SELECT CAST(0.9 AS DOUBLE), round(quantile_cont(p, 0.9), 6) FROM src
      UNION ALL
      SELECT CAST(0.99 AS DOUBLE), round(quantile_cont(p, 0.99), 6) FROM src
    )
    SELECT est.q, est.est, ex.exact
    FROM est JOIN ex ON est.q = ex.q
    """,
    tags=("sketch", "agg", "scale"),
)
def sketch_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles, fully oracled: a 64-bucket equi-width
    histogram of o_totalprice (bucket width 7812.5 over [0, 500k] —
    exactly representable, so bucketing is bit-identical), cumulated
    once, then P50/P90/P99 estimated by linear interpolation inside the
    covering bucket. The exact quantile_cont/percentile twin rides along
    for the error comparison. This is how engines estimate NDV/quantile
    stats from table histograms — the third hash-matched sketch family
    after count-min and Bloom (the t-digest style sketch stays
    approx-only as agg_approx_quantile).

    Scale: ONE aggregation pass (64-cell partial-aggregatable groupBy) +
    a 64-row window — vs exact quantiles which buffer and sort every
    group. The exact twin here is the sf-scale correctness anchor."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("p"))
    w = 7812.5
    h = o.groupBy(
        F.least(F.floor(F.col("p") / w).cast("bigint"), F.lit(63)).alias("b")
    ).agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = h.select(
        "b",
        "cnt",
        F.sum("cnt").over(wcum).alias("c"),
        F.sum("cnt").over(Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("total"),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    t = F.ceil(F.col("q") * F.col("total")).cast("bigint")
    est = (
        qs.join(
            F.broadcast(cum),
            (F.col("c") >= F.ceil(F.col("q") * F.col("total")).cast("bigint"))
            & (
                (F.col("c") - F.col("cnt"))
                < F.ceil(F.col("q") * F.col("total")).cast("bigint")
            ),
        )
        .select(
            "q",
            (
                F.col("b") * w
                + w * (t - (F.col("c") - F.col("cnt"))) / F.col("cnt")
            ).alias("est"),
        )
    )
    ex = (
        o.agg(
            F.percentile("p", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias(
                "_e"
            )
        )
        .select(
            F.posexplode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias(
                "i", "q"
            ),
            F.col("_e"),
        )
        .select("q", F.round(F.element_at("_e", F.col("i") + 1), 6).alias("exact"))
    )
    return est.join(ex, "q")
