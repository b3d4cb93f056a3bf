"""Z-order layout: clustering quality of the Morton key.

Simulates row-group pruning without depending on parquet writer row-group
boundaries: sort by a layout key, cut the sorted order into contiguous
chunks (what row groups would hold), and measure each chunk's min/max
spread per dimension — the narrower the spread, the more chunks a
selective predicate can skip via footer stats.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
CHUNKS = 16


def _chunk_spreads(df, order_col, dim):
    w = Window.orderBy(order_col)
    chunked = df.withColumn("_chunk", F.ntile(CHUNKS).over(w))
    agg = chunked.groupBy("_chunk").agg(
        (F.max(dim) - F.min(dim)).alias("spread")
    )
    return agg.agg(F.avg("spread")).collect()[0][0]


def test_zorder_clusters_both_dims(spark):
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select(
            (F.col("l_partkey") % 256).cast("bigint").alias("px"),
            (F.col("l_orderkey") % 256).cast("bigint").alias("sx"),
        )
    )
    zkey = F.lit(0).cast("bigint")
    for i in range(8):
        zkey = zkey + (
            F.shiftright(F.col("px").bitwiseAND(F.lit(1 << i)), i)
            * F.lit(1 << (2 * i))
        ) + (
            F.shiftright(F.col("sx").bitwiseAND(F.lit(1 << i)), i)
            * F.lit(1 << (2 * i + 1))
        )
    df = li.withColumn("zkey", zkey).localCheckpoint()

    # Single-key sort: perfect on its own dim, useless on the other —
    # the other dim's per-chunk spread stays ~ the global 0..255 range.
    px_sorted_sx_spread = _chunk_spreads(df, "px", "sx")
    assert px_sorted_sx_spread > 200

    # Z-order: BOTH dims cluster. Each of 16 chunks covers ~1/16 of the
    # 2^16 z-space = a 64x64 tile => per-dim spread ~ 64, far under 255.
    z_sx = _chunk_spreads(df, "zkey", "sx")
    z_px = _chunk_spreads(df, "zkey", "px")
    assert z_sx < 130, z_sx
    assert z_px < 130, z_px
