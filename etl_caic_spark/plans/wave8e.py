"""Round-8 wave E: BPE merge learning and dataset fingerprinting.

- ``bpe_learn_merges``: three rounds of byte-pair-encoding merge
  learning over the corpus's top-200 word vocabulary — the iterative
  step text_bpe_pair_counts (llm7) stops short of. Each round counts
  frequency-weighted adjacent symbol pairs, picks the global top pair
  (weight desc, pair asc), and applies the merge corpus-wide via two
  string-replace passes. Both engines' ``replace`` is non-overlapping
  left-to-right (verified identical: ' a a a a ' -> ' aa a a '), so the
  merge application is bit-identical; the second pass catches the
  boundary-shared occurrence a single pass skips. Runs of the SAME pair
  deeper than two boundary-shares stay unmerged in this frozen variant —
  a documented deviation from greedy BPE that both engines replay
  identically.
- ``dq_dataset_fingerprint``: order-independent content fingerprints
  per source slice plus a rolled-up '__all__' row: each row canonifies
  to md5(key fields + md5(text)), the leading 60 bits become a BIGINT,
  and the slice fingerprint is the exact (sum, xor, min) of those —
  commutative, so independent of partitioning and row order. The
  snapshot-integrity primitive: two pipeline runs (or a pre/post
  migration pair) compare fingerprints without comparing rows.

Reference parity: none of this exists in the reference (task.ts has no
tokenizer or audit surface) — SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

# --------------------------------------------------------------------------
# bpe_learn_merges
# --------------------------------------------------------------------------

_BPE_VOCAB = 200
_BPE_ROUNDS = 3

_BPE_PAIR_CTE = """
    p{i} AS (
      SELECT ws[j] AS l, ws[j + 1] AS r, CAST(sum(f) AS BIGINT) AS wt
      FROM (
        SELECT f, ws, unnest(generate_series(1, len(ws) - 1)) AS j
        FROM (SELECT f, string_split(trim(sym), ' ') AS ws FROM v{prev})
        WHERE len(ws) >= 2
      )
      GROUP BY 1, 2
    ),
    t{i} AS (SELECT l, r, wt FROM p{i} ORDER BY wt DESC, l ASC, r ASC LIMIT 1),
    v{i} AS (
      SELECT f,
             replace(replace(sym, ' ' || l || ' ' || r || ' ',
                                  ' ' || l || r || ' '),
                     ' ' || l || ' ' || r || ' ',
                     ' ' || l || r || ' ') AS sym
      FROM v{prev} CROSS JOIN t{i}
    )"""


def _bpe_oracle() -> str:
    head = f"""
    WITH wf AS (
      SELECT w, CAST(count(*) AS BIGINT) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE len(w) > 0
      GROUP BY 1
    ),
    v0 AS (
      SELECT f, ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS sym
      FROM wf ORDER BY f DESC, w ASC LIMIT {_BPE_VOCAB}
    )"""
    ctes = "".join(
        "," + _BPE_PAIR_CTE.format(i=i, prev=i - 1)
        for i in range(1, _BPE_ROUNDS + 1)
    )
    sel = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS round, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, wt FROM t{i}"
        for i in range(1, _BPE_ROUNDS + 1)
    )
    return head + ctes + "\n    " + sel


def learned_merge_tops(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """The merge-learning sub-plan shared by bpe_learn_merges and
    text_bpe_encode (wave18a): top-{_BPE_VOCAB} vocabulary by frequency
    (ONE corpus scan, then localCheckpoint — every later frame is
    vocabulary-sized), then per round the frequency-weighted
    adjacent-pair counts pick one global winner (wt desc, pair asc) and
    a double string-replace applies it vocabulary-wide. Returns the
    {_BPE_ROUNDS} one-row winner frames [(l, r, wt)], round i's winner
    learned on the vocabulary AFTER merges 1..i-1 were applied."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    vocab = (
        wf.orderBy(F.desc("f"), F.asc("w"))
        .limit(_BPE_VOCAB)
        .select(
            "f",
            F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
        )
        .localCheckpoint()  # corpus scanned once; rounds recompute 200-row frames
    )
    tops = []
    cur = vocab
    for _ in range(_BPE_ROUNDS):
        toks = cur.select("f", F.split(F.trim(F.col("sym")), " ").alias("ws"))
        pairs = (
            toks.filter(F.size("ws") >= 2)
            .select(
                "f",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(ws) - 1),"
                        " j -> struct(ws[j - 1] AS l, ws[j] AS r))"
                    )
                ).alias("p"),
            )
            .select("f", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("f").cast("bigint").alias("wt"))
            .orderBy(F.desc("wt"), F.asc("l"), F.asc("r"))
            .limit(1)
        )
        tops.append(top)
        pat = F.concat(F.lit(" "), F.col("l"), F.lit(" "), F.col("r"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("l"), F.col("r"), F.lit(" "))
        cur = cur.crossJoin(F.broadcast(top)).select(
            "f", F.replace(F.replace("sym", pat, rep), pat, rep).alias("sym")
        )
    return tops


def apply_merges(sym_col, tops_aliased: list[str]):
    """The frozen merge-application expression: for each learned merge
    (joined in as `<alias>.l` / `<alias>.r`), the double non-overlapping
    replace of ' l r ' -> ' lr ' over a spaced symbol string — identical
    semantics on both engines (module docstring)."""
    out = sym_col
    for a in tops_aliased:
        pat = F.concat(
            F.lit(" "), F.col(f"{a}.l"), F.lit(" "), F.col(f"{a}.r"), F.lit(" ")
        )
        rep = F.concat(F.lit(" "), F.col(f"{a}.l"), F.col(f"{a}.r"), F.lit(" "))
        out = F.replace(F.replace(out, pat, rep), pat, rep)
    return out


@register("bpe_learn_merges", oracle=_bpe_oracle(), tags=("llm", "text", "iterative"))
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 3 BPE merges from the corpus: whitespace words ->
    top-{_BPE_VOCAB} vocabulary by frequency -> chars spaced out as
    symbol strings -> per round, the frequency-weighted adjacent-pair
    counts pick one global winner (wt desc, pair asc) and a double
    string-replace applies it to every vocabulary word. The winner
    selection and the replace are both exact; see the module docstring
    for the frozen overlap semantics.

    Plan shape: ONE corpus scan (word-count groupBy, partial agg) into a
    TakeOrderedAndProject top-{_BPE_VOCAB}, localCheckpoint-ed — every
    later frame is vocabulary-sized (200 rows), so the 3 rounds' pair
    counts, 1-row tops and replace projections are driver-trivial at any
    corpus scale; this is precisely why production BPE learners operate
    on the aggregated vocabulary, not the raw corpus. At 100 TB the only
    heavy stage remains the initial word count. (Learning lives in
    learned_merge_tops, shared with wave18a's text_bpe_encode.)"""
    merges = [
        top.select(
            F.lit(i).cast("bigint").alias("round"),
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            F.concat("l", "r").alias("merged"),
            "wt",
        )
        for i, top in enumerate(learned_merge_tops(spark, sf_dir), start=1)
    ]
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


# --------------------------------------------------------------------------
# dq_dataset_fingerprint
# --------------------------------------------------------------------------

_FP_SQL = """
    WITH rows_fp AS (
      SELECT source,
             list_sum(list_transform(generate_series(1, 15), i ->
               CAST(strpos('0123456789abcdef', hx[i]) - 1 AS BIGINT)
               * (CAST(1 AS BIGINT) << (4 * (15 - i))))) AS v
      FROM (
        -- explicit NULL markers: '||' nulls the whole hash on a NULL
        -- field (and Spark's concat_ws would silently DROP the field,
        -- letting ('1',NULL,'2') collide with ('1','2',NULL)) — both
        -- engines canonify NULL to the same out-of-alphabet token
        SELECT source,
               md5(CAST(doc_id AS VARCHAR) || '|'
                   || coalesce(lang, chr(0) || 'NULL') || '|'
                   || coalesce(CAST(n_chars AS VARCHAR), chr(0) || 'NULL')
                   || '|' || md5(coalesce(text, chr(0) || 'NULL'))) AS hx
        FROM documents
      )
    )
    SELECT coalesce(source, '__all__') AS source,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(v) % 2305843009213693952 AS BIGINT) AS fp_sum,
           CAST(bit_xor(v) AS BIGINT) AS fp_xor,
           CAST(min(v) AS BIGINT) AS fp_min
    FROM rows_fp
    GROUP BY ROLLUP (source)
"""


@register("dq_dataset_fingerprint", oracle=_FP_SQL, tags=("dq", "audit"))
def dq_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent dataset content fingerprint, per source slice
    plus a ROLLUP '__all__' row: every row canonifies to
    md5(doc_id|lang|n_chars|md5(text)), the leading 15 hex chars (60
    bits) become a BIGINT, and the slice fingerprint is the exact
    (sum mod 2^61, xor, min, count) of those. Sum and xor are commutative and
    associative, so the fingerprint is independent of partitioning, row
    order, and engine — two snapshots (pre/post migration, replica
    pairs, cache vs source) compare by 4 numbers per slice instead of a
    row-level diff; xor additionally localizes single-row corruption
    sum alone can mask under compensating edits.

    Plan shape: one scan, all-JVM md5/conv expressions, one map-side
    partial ROLLUP aggregate — shuffle carries |sources|+1 rows at any
    scale; the canonical 100-TB audit query."""
    d = load_table(spark, sf_dir, "documents")
    # NULL marker must mirror the oracle exactly (see oracle comment):
    # concat_ws would silently drop NULL fields AND their separator,
    # both diverging from SQL '||' and colliding shifted field values.
    null_tok = F.concat(F.lit("\x00"), F.lit("NULL"))
    hx = F.md5(
        F.concat_ws(
            "|",
            F.col("doc_id").cast("string"),
            F.coalesce(F.col("lang"), null_tok),
            F.coalesce(F.col("n_chars").cast("string"), null_tok),
            F.md5(F.coalesce(F.col("text"), null_tok)),
        )
    )
    v = F.conv(F.substring(hx, 1, 15), 16, 10).cast("bigint")
    rows_fp = d.select("source", v.alias("v"))
    return (
        rows_fp.rollup("source")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            # 60-bit values overflow an int64 sum within ~a dozen rows:
            # accumulate in DECIMAL(38,0) (exact to ~1e38 — headroom past
            # 1e12 rows) and freeze the published fingerprint mod 2^61.
            (F.sum(F.col("v").cast("decimal(38,0)")) % F.lit(2305843009213693952))
            .cast("bigint")
            .alias("fp_sum"),
            F.expr("bit_xor(v)").cast("bigint").alias("fp_xor"),
            F.min("v").cast("bigint").alias("fp_min"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("__all__")).alias("source"),
            "n_rows",
            "fp_sum",
            "fp_xor",
            "fp_min",
        )
    )
