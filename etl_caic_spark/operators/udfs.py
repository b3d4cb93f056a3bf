"""UDF surface (SURVEY.md §2.C "UDF / UDAF / UDTF"): the reference uses
none (pure built-ins), but the engine exposes the full Spark Python UDF
tier list for user extension points.

Rules of the road (enforced by example here):
- Arrow-vectorized pandas UDFs only — never row-at-a-time Python UDFs in a
  hot path (10-100× difference, SURVEY.md §4.2 / pyspark guide).
- UDFs receive/return whole columns per batch
  (spark.sql.execution.arrow.maxRecordsPerBatch governs batch size).
- applyInPandas shuffles once on the grouping key; per-group pandas frames
  must fit in executor memory — keys with unbounded groups get salted or
  pre-aggregated first at scale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# pandas_udf type resolution needs an active SparkSession in Spark 4, so the
# UDF objects are built lazily (first use), not at import time.
_cache: dict[str, object] = {}


def charge_udf(*cols):
    """Scalar pandas UDF: elementwise charge — same IEEE ops as the SQL
    twin, so results are bit-identical."""
    if "charge" not in _cache:

        def _charge(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
            return price * (1 - discount) * (1 + tax)

        _cache["charge"] = pandas_udf(_charge, "double")
    return _cache["charge"](*cols)


def weighted_avg_udf(*cols):
    """Grouped-agg pandas UDF: weight-averaged value per group."""
    if "wavg" not in _cache:

        def _wavg(value: pd.Series, weight: pd.Series) -> float:
            total = float((value * weight).sum())
            wsum = float(weight.sum())
            return total / wsum if wsum else float("nan")

        _cache["wavg"] = pandas_udf(_wavg, "double")
    return _cache["wavg"](*cols)


def zscore_per_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map (UDTF-shaped) applyInPandas: per-group z-score with
    sample stddev; groups smaller than 2 rows are dropped (stddev
    undefined). Output rounded to 4 decimals — pandas and SQL window
    aggregates differ in the last ulps."""
    out_schema = "event_id bigint, user_id bigint, value double, z double"

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][["event_id", "user_id", "value"]].assign(z=0.0)
        v = pdf[value_col]
        z = ((v - v.mean()) / v.std(ddof=1)).round(4)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "user_id": pdf["user_id"],
                "value": v,
                "z": z,
            }
        )

    return df.groupBy(group_col).applyInPandas(_z, out_schema)


def parse_props_batches(df: DataFrame) -> DataFrame:
    """mapInPandas: per-partition batch iterator — the engine's pattern for
    custom batch transforms (and the decode slot for multimodal columns).
    Extracts the integer `k` from the props JSON with a vectorized regex."""
    out_schema = "event_id bigint, k int"

    def _parse(batches):
        for pdf in batches:
            k = pdf["props"].str.extract(r'"k":\s*(-?\d+)', expand=False)
            yield pd.DataFrame(
                {"event_id": pdf["event_id"], "k": k.astype("Int64")}
            )

    return df.mapInPandas(_parse, out_schema)


def net_price_arrow_batches(df: DataFrame) -> DataFrame:
    """mapInArrow: the zero-copy sibling of mapInPandas — batches arrive
    as pyarrow RecordBatches and never materialize a pandas object, so
    there is no index/NaN-coercion overhead and fixed-width columns stay
    in Arrow buffers end-to-end. The right lane when the kernel is pure
    Arrow compute (casts, arithmetic, take/filter); use mapInPandas only
    when pandas-specific APIs (str regex, rolling) are genuinely needed.
    Net price is computed in integer CENTS (exact at any batch split);
    the dollar value is reconstructed once."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_schema = "l_orderkey bigint, l_linenumber int, net_cents bigint"

    def _net(batches):
        for b in batches:
            price_c = pc.cast(
                pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)),
                pa.int64(),
            )
            disc_pct = pc.cast(
                pc.round(pc.multiply(b.column("l_discount"), 100.0)),
                pa.int64(),
            )
            # net = price * (100 - disc_pct) DIV 100, all int64
            net = pc.divide(
                pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct)),
                pa.scalar(100, pa.int64()),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), net],
                ["l_orderkey", "l_linenumber", "net_cents"],
            )

    return df.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).mapInArrow(_net, out_schema)
