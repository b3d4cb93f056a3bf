"""Round-11 wave A (file wave15a): evaluation + preference-data ops the
registry still lacked — per-class classifier diagnostics, held-out LM
perplexity, DPO preference-pair construction, exact per-group mode, and
CUSUM changepoint detection.

Reference parity: the reference (task.ts:88-189) has no eval/ML surface —
these are SURVEY §2.C extension-mandate ops (the LLM-training-pipeline
family the north star grades as first-class).

Engine-exactness notes (the registry conventions, see SCALE.md):
- every log is a micro-nat over integer counts with the identical SQL
  text on both engines (operators/micronat discipline);
- argmax/argmin never uses a bare window: min_by/max_by over a
  zero-padded composite string key (the rendezvous-shard pattern — the
  tiebreak lives INSIDE the key) or min(struct(...)) over a bounded
  frame;
- money stays integer cents; each published rate/mean takes exactly one
  rounded division ("*_micro" columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# ---------------------------------------------------------------------------
# eval_confusion_prf — per-class precision/recall/F1 from a confusion matrix
# ---------------------------------------------------------------------------

_PRF_SQL = """
    WITH lab AS (
      SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS t,
             CAST(CAST(round(o_totalprice * 100) AS BIGINT) % 5 + 1 AS INT)
               AS p
      FROM orders
    ),
    conf AS (
      SELECT t, p, CAST(count(*) AS BIGINT) AS n FROM lab GROUP BY 1, 2
    ),
    tpf AS (SELECT t AS cls, n AS tp FROM conf WHERE t = p),
    tn AS (SELECT t AS cls, CAST(sum(n) AS BIGINT) AS true_n
           FROM conf GROUP BY 1),
    pn AS (SELECT p AS cls, CAST(sum(n) AS BIGINT) AS pred_n
           FROM conf GROUP BY 1),
    base AS (
      SELECT cls,
             CAST(coalesce(tp, 0) AS BIGINT) AS tp,
             CAST(coalesce(pred_n, 0) - coalesce(tp, 0) AS BIGINT) AS fp,
             CAST(coalesce(true_n, 0) - coalesce(tp, 0) AS BIGINT) AS fn
      FROM tn FULL JOIN pn USING (cls) LEFT JOIN tpf USING (cls)
    )
    SELECT CAST(cls AS INT) AS cls, tp, fp, fn,
           CASE WHEN tp + fp > 0
                THEN CAST(round(tp * 1000000.0 / (tp + fp)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS precision_micro,
           CASE WHEN tp + fn > 0
                THEN CAST(round(tp * 1000000.0 / (tp + fn)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS recall_micro,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN CAST(round(2 * tp * 1000000.0 / (2 * tp + fp + fn))
                     AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS f1_micro
    FROM base
"""


@register("eval_confusion_prf", oracle=_PRF_SQL, tags=("eval", "ml"))
def eval_confusion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision / recall / F1 from the confusion matrix — the
    classifier diagnostic the eval family lacked (it had AUC, MCC, kappa,
    ECE but no P/R/F1). True class = order priority's leading digit;
    "predicted" class = a deterministic stand-in (cents % 5 + 1 — the op
    under test is the confusion-matrix computation, not the model).

    F1 is computed directly as 2tp/(2tp+fp+fn) — ONE rounded division,
    never from already-rounded P and R (compounded rounding would drift
    from any downstream exact recomputation).

    Plan: one fact groupBy to the (true, pred) confusion grain (<= k²
    rows, map-side combinable), then three tiny re-groupings full-outer
    joined on class. At 100 TB only the first groupBy touches data;
    everything after is k²-bounded. No window, no fact join."""
    o = load_table(spark, sf_dir, "orders")
    lab = o.select(
        F.substring("o_orderpriority", 1, 1).cast("int").alias("t"),
        (
            F.round(F.col("o_totalprice") * 100).cast("bigint") % 5 + 1
        )
        .cast("int")
        .alias("p"),
    )
    conf = lab.groupBy("t", "p").agg(F.count("*").cast("bigint").alias("n"))
    tpf = conf.filter(F.col("t") == F.col("p")).select(
        F.col("t").alias("cls"), F.col("n").alias("tp")
    )
    tn = conf.groupBy(F.col("t").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("true_n")
    )
    pn = conf.groupBy(F.col("p").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("pred_n")
    )
    base = (
        tn.join(pn, "cls", "full")
        .join(tpf, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            (F.coalesce("pred_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fp"),
            (F.coalesce("true_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return base.select(
        F.col("cls").cast("int").alias("cls"),
        "tp",
        "fp",
        "fn",
        F.when(
            tp + fp > 0, F.round(tp * 1000000.0 / (tp + fp)).cast("bigint")
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("precision_micro"),
        F.when(
            tp + fn > 0, F.round(tp * 1000000.0 / (tp + fn)).cast("bigint")
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("recall_micro"),
        F.when(
            2 * tp + fp + fn > 0,
            F.round(2 * tp * 1000000.0 / (2 * tp + fp + fn)).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("f1_micro"),
    )


# ---------------------------------------------------------------------------
# eval_perplexity_heldout — held-out bigram LM perplexity (micro-nats/token)
# ---------------------------------------------------------------------------

_PPL_SQL = """
    WITH split AS (
      SELECT doc_id, string_split(text, ' ') AS l,
             substr(md5('ppl-v1|' || CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('0', '1') AS is_test
      FROM documents
    ),
    train_uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cu FROM (
        SELECT unnest(l) AS w FROM split WHERE NOT is_test
      ) GROUP BY 1
    ),
    v AS (SELECT CAST(count(*) AS BIGINT) AS vocab FROM train_uni),
    train_bg AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM (
        SELECT l[i] AS w1, l[i + 1] AS w2
        FROM split,
             LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
        WHERE NOT is_test
      ) GROUP BY 1, 2
    ),
    test_bg AS (
      SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
      FROM split,
           LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
      WHERE is_test
    ),
    scored AS (
      SELECT doc_id,
             CAST(round(round(ln((coalesce(cb, 0) + 1.0)
                                 / (coalesce(cu, 0) + vocab)), 6) * 1e6)
                  AS BIGINT) AS lp_micro
      FROM test_bg
      LEFT JOIN train_bg USING (w1, w2)
      LEFT JOIN train_uni ON train_uni.w = test_bg.w1
      CROSS JOIN v
    )
    SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_test_docs,
           CAST(count(*) AS BIGINT) AS n_test_bigrams,
           CAST(sum(lp_micro) AS BIGINT) AS logprob_micro,
           CAST(round(-sum(lp_micro) * 1.0 / count(*)) AS BIGINT)
             AS ppl_micronat_per_token
    FROM scored
"""


@register(
    "eval_perplexity_heldout", oracle=_PPL_SQL, tags=("eval", "text", "llm")
)
def eval_perplexity_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram language-model perplexity — the train/test
    discipline text_bigram_logprob (regressionq.py) lacks: an md5
    doc-level split (~1/8 test, the portable-draw convention) trains
    add-one-smoothed bigram counts on TRAIN tokens only and scores TEST
    bigrams, publishing total log-probability and micro-nats/token
    (exp(micronats/1e6) = perplexity). Unseen test bigrams/contexts
    coalesce to c=0 and cost ln(1/(0+V)) — the add-one floor, exact on
    both engines because the smoothed ratio is a ratio of integers under
    the frozen micro-nat log.

    This is THE data-quality loop for corpus curation: re-run per
    candidate corpus slice, keep slices that lower held-out perplexity.

    Plan: two map-side-combinable model aggregates over train tokens
    (bigram + unigram), one scalar vocab broadcast, the test stream
    left-joined against the model (shuffle join on w1/w2 — the model
    table is the big object at 100 TB, exactly like the serving-time
    layout), one global reduce. The md5 split is a scan-local predicate
    — no shuffle to split."""
    d = load_table(spark, sf_dir, "documents")
    split = d.select(
        "doc_id",
        F.split("text", " ").alias("l"),
        F.substring(
            F.md5(F.concat(F.lit("ppl-v1|"), F.col("doc_id").cast("string"))),
            1,
            1,
        )
        .isin("0", "1")
        .alias("is_test"),
    )
    pairs = F.when(
        F.size("l") >= 2,
        F.expr(
            "transform(sequence(1, size(l) - 1),"
            " i -> struct(l[i - 1] AS w1, l[i] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    train = split.filter(~F.col("is_test"))
    test = split.filter(F.col("is_test"))
    train_uni = (
        train.select(F.explode("l").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cu"))
    )
    vocab = train_uni.agg(F.count("*").cast("bigint").alias("vocab"))
    train_bg = (
        train.select(F.explode(pairs).alias("pr"))
        .select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("cb"))
    )
    test_bg = test.select("doc_id", F.explode(pairs).alias("pr")).select(
        "doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2")
    )
    scored = (
        test_bg.join(train_bg, ["w1", "w2"], "left")
        .join(
            train_uni, test_bg["w1"] == train_uni["w"], "left"
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                F.round(
                    F.log(
                        (F.coalesce("cb", F.lit(0)) + 1.0)
                        / (F.coalesce("cu", F.lit(0)) + F.col("vocab"))
                    ),
                    6,
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    return scored.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_test_docs"),
        F.count("*").cast("bigint").alias("n_test_bigrams"),
        F.sum("lp_micro").cast("bigint").alias("logprob_micro"),
        F.round(-F.sum("lp_micro") * 1.0 / F.count("*"))
        .cast("bigint")
        .alias("ppl_micronat_per_token"),
    )


# ---------------------------------------------------------------------------
# data_dpo_pairs — preference-pair construction (chosen/rejected per group)
# ---------------------------------------------------------------------------

_DPO_SQL = """
    WITH cand AS (
      SELECT source, lang, doc_id, n_chars,
             lpad(CAST(n_chars AS VARCHAR), 12, '0') || '|' ||
               lpad(CAST(999999999999 - doc_id AS VARCHAR), 12, '0') AS ck,
             lpad(CAST(n_chars AS VARCHAR), 12, '0') || '|' ||
               lpad(CAST(999999999999 - doc_id AS VARCHAR), 12, '0') AS rk
      FROM documents
    )
    SELECT source, lang,
           CAST(max_by(doc_id, ck) AS BIGINT) AS chosen_doc_id,
           CAST(min_by(doc_id, rk) AS BIGINT) AS rejected_doc_id,
           CAST(max(n_chars) AS BIGINT) AS chosen_chars,
           CAST(min(n_chars) AS BIGINT) AS rejected_chars,
           CAST(max(n_chars) - min(n_chars) AS BIGINT) AS margin_chars,
           CAST(count(*) AS BIGINT) AS n_candidates
    FROM cand
    GROUP BY 1, 2
    HAVING count(*) >= 2
"""


@register("data_dpo_pairs", oracle=_DPO_SQL, tags=("data", "llm"))
def data_dpo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style training: per
    (source, lang) candidate group, emit the best-scored document as
    `chosen` and the worst as `rejected` (score proxy: n_chars — the
    op under test is deterministic pair extraction, the scorer is
    pluggable). The argmax/argmin keys are zero-padded composite
    strings (the rendezvous-shard convention — tiebreak inside the
    key): chosen breaks score ties toward the SMALLER doc_id, rejected
    toward the LARGER, so a group of identical scores still yields a
    valid chosen != rejected pair whenever the group has >= 2 docs.

    Plan: ONE map-side-combinable groupBy carrying both max_by and
    min_by — no window, no self-join, no per-group sort. At 100 TB
    this is a single shuffle at prompt-group grain; skewed mega-groups
    combine map-side because max_by/min_by are associative.

    Key-domain bound (r11 ADVICE): the zero-padded encoding is
    order-isomorphic only for 0 <= n_chars < 1e12 and
    0 <= doc_id < 1e12; out-of-domain rows would silently corrupt the
    ordering identically on both engines, so the Spark side raises
    loudly instead of emitting a key."""
    d = load_table(spark, sf_dir, "documents")
    in_domain = (
        (F.col("n_chars") >= 0)
        & (F.col("n_chars") < 1000000000000)
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < 1000000000000)
    )
    key = F.when(
        in_domain,
        F.concat(
            F.lpad(F.col("n_chars").cast("string"), 12, "0"),
            F.lit("|"),
            F.lpad((F.lit(999999999999) - F.col("doc_id")).cast("string"), 12, "0"),
        ),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("data_dpo_pairs: key domain exceeded (doc_id="),
                F.col("doc_id").cast("string"),
                F.lit(", n_chars="),
                F.col("n_chars").cast("string"),
                F.lit(")"),
            )
        )
    )
    cand = d.select("source", "lang", "doc_id", "n_chars", key.alias("k"))
    return (
        cand.groupBy("source", "lang")
        .agg(
            F.expr("max_by(doc_id, k)").cast("bigint").alias("chosen_doc_id"),
            F.expr("min_by(doc_id, k)")
            .cast("bigint")
            .alias("rejected_doc_id"),
            F.max("n_chars").cast("bigint").alias("chosen_chars"),
            F.min("n_chars").cast("bigint").alias("rejected_chars"),
            (F.max("n_chars") - F.min("n_chars"))
            .cast("bigint")
            .alias("margin_chars"),
            F.count("*").cast("bigint").alias("n_candidates"),
        )
        .filter(F.col("n_candidates") >= 2)
    )


# ---------------------------------------------------------------------------
# agg_mode_exact — exact per-group mode with a frozen tiebreak
# ---------------------------------------------------------------------------

_MODE_SQL = """
    WITH ec AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    keyed AS (
      SELECT user_id, event_type, cnt,
             lpad(CAST(999999999999 - cnt AS VARCHAR), 12, '0') || event_type
               AS k
      FROM ec
    )
    SELECT user_id,
           min_by(event_type, k) AS mode_event_type,
           CAST(max(cnt) AS BIGINT) AS mode_cnt,
           CAST(sum(cnt) AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_distinct_types
    FROM keyed GROUP BY 1
"""


@register("agg_mode_exact", oracle=_MODE_SQL, tags=("agg", "relational"))
def agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode (most frequent event_type per user) with a
    frozen tiebreak — the one classic aggregate the agg family lacked
    (approx twins exist: countmin/hll). SQL MODE() is
    engine/tie-undefined; here the argmin key is the zero-padded
    INVERTED count concatenated with the value, so min_by picks
    (highest count, then lexicographically smallest type) identically
    on both engines.

    Plan: two stacked map-side-combinable groupBys — (user, type) grain
    then user grain; no window, no join. At 100 TB the first groupBy is
    the only fact-scale shuffle and partial-aggregates to the distinct
    grain map-side; the second works on |users x types| which combines
    down to |users|.

    Key-domain bound (r11 ADVICE): the inverted-count encoding is
    order-isomorphic only for cnt < 1e12 (a trillion events per
    (user, type) cell); beyond that the Spark side raises loudly
    instead of silently corrupting the tiebreak on both engines."""
    e = load_table(spark, sf_dir, "events")
    ec = e.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    keyed = ec.select(
        "user_id",
        "event_type",
        "cnt",
        F.concat(
            F.when(
                F.col("cnt") < 1000000000000,
                F.lpad((F.lit(999999999999) - F.col("cnt")).cast("string"), 12, "0"),
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("agg_mode_exact: cnt exceeds key domain: "),
                        F.col("cnt").cast("string"),
                    )
                )
            ),
            F.col("event_type"),
        ).alias("k"),
    )
    return keyed.groupBy("user_id").agg(
        F.expr("min_by(event_type, k)").alias("mode_event_type"),
        F.max("cnt").cast("bigint").alias("mode_cnt"),
        F.sum("cnt").cast("bigint").alias("n_events"),
        F.count("*").cast("bigint").alias("n_distinct_types"),
    )


# ---------------------------------------------------------------------------
# ts_changepoint_cusum — CUSUM changepoint over the daily revenue series
# ---------------------------------------------------------------------------

_CUSUM_SQL = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS tot
      FROM daily
    ),
    cum AS (
      SELECT day, cents,
             CAST(sum(cents) OVER w AS BIGINT) AS cum,
             CAST(row_number() OVER w AS BIGINT) AS t
      FROM daily WINDOW w AS (ORDER BY day)
    ),
    s AS (
      SELECT day, cum, t,
             abs(CAST(n AS DECIMAL(38, 0)) * cum
                 - CAST(t AS DECIMAL(38, 0)) * tot) AS s_abs,
             n, tot
      FROM cum CROSS JOIN tot
    ),
    best AS (
      SELECT * FROM s
      QUALIFY row_number() OVER (ORDER BY s_abs DESC, day) = 1
    )
    SELECT day AS cp_day, CAST(t AS BIGINT) AS cp_t,
           CAST(n AS BIGINT) AS n_days,
           CAST(s_abs AS BIGINT) AS s_abs_scaled,
           CAST(round(cum * 1.0 / t) AS BIGINT) AS left_mean_cents,
           CASE WHEN n > t
                THEN CAST(round((tot - cum) * 1.0 / (n - t)) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS right_mean_cents
    FROM best
"""


@register("ts_changepoint_cusum", oracle=_CUSUM_SQL, tags=("ts", "stat"))
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily revenue series: the
    split point t* maximizing |n*cumsum_t - t*total| — the integer-
    scaled form of the classic |cumsum(x - mean)| statistic (multiplied
    through by n so NO division happens before the argmax; every
    compared value is an exact integer, engine-identical). Ties break
    to the earliest day. Publishes the changepoint plus the exact
    left/right mean levels (one rounded division each).

    The cumulation window is ORDER BY day over the DAILY grid — the
    documented bounded-domain window class (the grid is date-span
    bounded, ~2.4k rows for 7 years, and CANNOT grow with row count;
    same triage as stat_kaplan_meier). The scaled statistic is computed
    in DECIMAL(38,0): n*cum reaches ~6e13 at sf0.1 and would pass int64
    around SF 1e4, so the multiply must not wrap (the published
    s_abs_scaled stays BIGINT for schema parity; the publish cast fails
    loudly past int64 rather than hashing a wrapped value).

    Plan: one fact groupBy to the daily grid, one bounded window, a
    broadcast one-row total, a struct-min argmax. At 100 TB only the
    daily rollup touches data."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tot = daily.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("tot"),
    )
    w = Window.orderBy("day")  # bounded-domain: daily grid, date-span capped
    cum = daily.select(
        "day",
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
        F.row_number().over(w).cast("bigint").alias("t"),
    )
    s = cum.crossJoin(F.broadcast(tot)).select(
        "day",
        "cum",
        "t",
        "n",
        "tot",
        F.abs(
            F.col("n").cast("decimal(38,0)") * F.col("cum")
            - F.col("t").cast("decimal(38,0)") * F.col("tot")
        ).alias("s_abs"),
    )
    best = s.agg(
        F.min(F.struct((-F.col("s_abs")).alias("neg"), "day", "t", "n",
                       "cum", "tot", "s_abs")).alias("b")
    ).select("b.*")
    return best.select(
        F.col("day").alias("cp_day"),
        F.col("t").cast("bigint").alias("cp_t"),
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s_abs").cast("bigint").alias("s_abs_scaled"),
        F.round(F.col("cum") * 1.0 / F.col("t"))
        .cast("bigint")
        .alias("left_mean_cents"),
        F.when(
            F.col("n") > F.col("t"),
            F.round(
                (F.col("tot") - F.col("cum")) * 1.0 / (F.col("n") - F.col("t"))
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("right_mean_cents"),
    )
