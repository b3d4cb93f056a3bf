"""Distributed global prefix aggregation (rank / running sum) without a
single-partition window.

A global ``row_number() OVER (ORDER BY ...)`` or running ``SUM`` compiles
to a WindowExec with NO partition spec — every row funnels through one
task, the classic 100 TB scale-killer. This operator computes the SAME
values with only partitioned work:

1. range-partition by the order columns (repartitionByRange — the same
   sampled-boundary partitioner a global sort uses), sort within
   partitions only;
2. compute the LOCAL row_number / cumulative sums per partition with a
   window partitioned by the physical partition id;
3. collect the per-partition TOTALS (one row per partition — bounded by
   the partition count, never by the data) and turn their exclusive
   prefix sums into broadcast offset maps;
4. add each partition's offset to its local values.

Step 3's collect is O(P) rows (the same bounded-collect class as AQE's
own per-partition statistics); everything row-scale stays partitioned.
The localCheckpoint pins the sampled range boundaries so the totals pass
and the value pass observe the same physical partitioning — without it a
recomputation could re-sample different boundaries between the two
passes.

Used by the scale-safe twins of the exact-order queries
(feat_bin_quantile_dist, feat_quantile_normalize_dist): they hash-match
the SAME oracle as their global-window originals, proving the offset
algebra loses nothing. ``prevmax_cols`` extends the same construction
to the EXCLUSIVE running max (max over all rows strictly before the
current one) — the primitive behind cumulative-dominance sweeps like
analytics_skyline: per-partition maxima become an exclusive prefix-max
offset map, combined with the local exclusive cummax via greatest()
(which skips NULLs, so the very first row stays NULL — no preceding
row — exactly as the global window would report).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_order(
    df: DataFrame,
    order_cols: list[str | Column],
    rn_col: str | None = None,
    cumsum_cols: dict[str, str] | None = None,
    prevmax_cols: dict[str, str] | None = None,
    num_partitions: int = 16,
) -> DataFrame:
    """Add a global 1-based row number (``rn_col``), global running sums
    (``cumsum_cols``: output name -> input column, inclusive of the
    current row), and/or global EXCLUSIVE running maxima
    (``prevmax_cols``: output name -> input column, max over rows
    strictly before the current one; NULL on the globally first row) in
    ``order_cols`` order, computed with partitioned windows plus
    broadcast boundary offsets.

    ``order_cols`` entries may be names or Column sort expressions
    (e.g. ``F.col("price").asc(), F.col("sz").desc()``) and must define
    a TOTAL order (include a unique tiebreak) for the row number to be
    deterministic.
    """
    cumsum_cols = dict(cumsum_cols or {})
    prevmax_cols = dict(prevmax_cols or {})
    order_exprs = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    base = df.repartitionByRange(num_partitions, *order_exprs)
    tagged = base.withColumn("_gid", F.spark_partition_id()).localCheckpoint()
    dtypes = dict(tagged.dtypes)

    aggs = [F.count("*").alias("_n")]
    aggs += [F.sum(src).alias(f"_t_{out}") for out, src in cumsum_cols.items()]
    aggs += [F.max(src).alias(f"_m_{out}") for out, src in prevmax_cols.items()]
    totals = {r["_gid"]: r for r in tagged.groupBy("_gid").agg(*aggs).collect()}

    def offset_map(field: str) -> Column:
        acc, pairs = 0, []
        for gid in sorted(totals):
            pairs += [F.lit(gid), F.lit(acc)]
            acc += totals[gid][field] or 0
        return F.create_map(*pairs)

    w = Window.partitionBy("_gid").orderBy(*order_exprs)
    out = tagged
    if rn_col is not None:
        out = out.withColumn(
            rn_col,
            (
                F.row_number().over(w).cast("bigint")
                + offset_map("_n")[F.col("_gid")].cast("bigint")
            ),
        )
    cum_w = w.rowsBetween(Window.unboundedPreceding, 0)
    for out_name, src in cumsum_cols.items():
        out = out.withColumn(
            out_name,
            (
                F.sum(src).over(cum_w).cast("bigint")
                + offset_map(f"_t_{out_name}")[F.col("_gid")].cast("bigint")
            ),
        )
    prev_w = w.rowsBetween(Window.unboundedPreceding, -1)
    for out_name, src in prevmax_cols.items():
        # exclusive prefix max over PRECEDING partitions, as a gid -> max
        # literal map; gid 0 (and any prefix of all-NULL partitions) has
        # no entry, so the lookup is NULL there — greatest() skips it.
        acc, pairs = None, []
        for gid in sorted(totals):
            if acc is not None:
                pairs += [F.lit(gid), F.lit(acc)]
            v = totals[gid][f"_m_{out_name}"]
            if v is not None:
                acc = v if acc is None else max(acc, v)
        lookup = (
            F.create_map(*pairs)[F.col("_gid")].cast(dtypes[src])
            if pairs
            else F.lit(None).cast(dtypes[src])
        )
        out = out.withColumn(out_name, F.greatest(F.max(src).over(prev_w), lookup))
    return out.drop("_gid")
