"""Round-9 wave M (file wave13b): corpus pass@k — the code-generation
evaluation metric (Chen et al. 2021, "Evaluating Large Language Models
Trained on Code"), exact in integers.

Each task has n = 10 samples; c of them pass. The unbiased estimator
    pass@k = 1 - C(n-c, k) / C(n, k)
is a rational with the FIXED denominator C(n, k), so the per-task
numerator C(n,k) - C(n-c,k) is an INTEGER — and the corpus aggregate
stays exact: summing integer numerators commutes in any order (a float
mean of per-task rates would be scan-order-dependent and engine-
divergent). With n pinned at 10, C(10-c, k) is an 11-entry lookup
inlined identically on both engines; one rounded division per k
publishes micro-units.

Sample verdicts are deterministic ((vec_id * 7 + label) % 4 == 0,
~25% pass rate) so the fixture exercises the full c = 0..10 range.

Scale: one map-side-combinable groupBy to task grain, one 11-branch
projection, one single-row reduce — nothing row-scale is ever sorted
or windowed, and the metric needs only two integer sums at any corpus
size.

Reference parity: the reference (task.ts:88-189) has no eval surface —
SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from math import comb

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table

_N = 10  # samples per task
_KS = (1, 5)


def _lut_sql(k: int) -> str:
    """SQL CASE mapping c -> C(N,k) - C(N-c,k) (the integer pass@k
    numerator), inlined identically on both engines."""
    total = comb(_N, k)
    arms = " ".join(
        f"WHEN {c} THEN {total - comb(_N - c, k)}" for c in range(_N + 1)
    )
    return f"CASE c {arms} END"


def _lut_col(k: int) -> Column:
    total = comb(_N, k)
    out = F.when(F.col("c") == 0, F.lit(total - comb(_N, k)))
    for c in range(1, _N + 1):
        out = out.when(F.col("c") == c, F.lit(total - comb(_N - c, k)))
    return out


_PASSK_SQL = f"""
    WITH samples AS (
      SELECT vec_id // {_N} AS task,
             CASE WHEN (vec_id * 7 + label) % 4 = 0 THEN 1 ELSE 0 END AS ok
      FROM embeddings
    ),
    tasks AS (
      SELECT task, CAST(sum(ok) AS BIGINT) AS c
      FROM samples GROUP BY 1
      HAVING count(*) = {_N}
    ),
    nums AS (
      SELECT task, c,
             CAST({_lut_sql(1)} AS BIGINT) AS num1,
             CAST({_lut_sql(5)} AS BIGINT) AS num5
      FROM tasks
    )
    SELECT CAST(count(*) AS BIGINT) AS n_tasks,
           CAST(sum(c) AS BIGINT) AS n_correct,
           CAST(sum(num1) AS BIGINT) AS num1_sum,
           CAST(sum(num5) AS BIGINT) AS num5_sum,
           CAST(round(sum(num1) * 1000000.0 / ({comb(_N, 1)} * count(*)))
                AS BIGINT) AS pass_at_1_micro,
           CAST(round(sum(num5) * 1000000.0 / ({comb(_N, 5)} * count(*)))
                AS BIGINT) AS pass_at_5_micro
    FROM nums
"""


@register("eval_pass_at_k", oracle=_PASSK_SQL, tags=("ml", "eval", "llm"))
def eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus pass@1 and pass@5 over 10-sample tasks (module docstring:
    integer binomial numerators with the fixed C(n,k) denominator keep
    the unbiased estimator exact through the corpus sum; only
    fully-sampled tasks count, the eval_fleiss_kappa convention)."""
    emb = load_table(spark, sf_dir, "embeddings")
    samples = emb.select(
        F.expr(f"vec_id div {_N}").alias("task"),
        F.when((F.col("vec_id") * 7 + F.col("label")) % 4 == 0, 1)
        .otherwise(0)
        .alias("ok"),
    )
    tasks = (
        samples.groupBy("task")
        .agg(
            F.sum("ok").cast("bigint").alias("c"),
            F.count("*").alias("n_samp"),
        )
        .filter(F.col("n_samp") == _N)
    )
    nums = tasks.select(
        "task",
        "c",
        _lut_col(1).cast("bigint").alias("num1"),
        _lut_col(5).cast("bigint").alias("num5"),
    )
    return nums.agg(
        F.count("*").cast("bigint").alias("n_tasks"),
        F.sum("c").cast("bigint").alias("n_correct"),
        F.sum("num1").cast("bigint").alias("num1_sum"),
        F.sum("num5").cast("bigint").alias("num5_sum"),
        F.round(F.sum("num1") * 1000000.0 / (comb(_N, 1) * F.count("*")))
        .cast("bigint")
        .alias("pass_at_1_micro"),
        F.round(F.sum("num5") * 1000000.0 / (comb(_N, 5) * F.count("*")))
        .cast("bigint")
        .alias("pass_at_5_micro"),
    )
