"""Round-9 wave H (file wave11a): a real TIFF codec, fixed-width and
compressed-sink format coverage, and Krippendorff's alpha.

- ``multimodal_tiff_codec``: third REAL image container after
  PNG/BMP/GIF (operators/codecs.py encode_tiff/decode_tiff — baseline
  uncompressed 8-bit grey and RGB, ascending-tag IFD, out-of-line
  BitsPerSample for RGB). Per document a closed-form pixel image
  (grey for even doc_id, RGB for odd) is encoded to genuine TIFF bytes,
  decoded back, and reduced to integer features; the oracle computes
  the same features from the closed form, so the hash match proves the
  container roundtrip is lossless for BOTH photometric layouts.
- ``scan_fixed_width``: mainframe-style fixed-width records — written
  as rpad-packed text lines, read back by substring offsets with
  explicit trims and casts (the COBOL-copybook pattern; schema-on-read
  with NO delimiter to lean on). Roundtrip-oracled against the source
  projection.
- ``sink_compressed_roundtrip``: the 100 TB default is compressed
  files; this pins write->read through gzip JSON-lines (codec chosen
  per file extension on read — no configuration drift possible).
- ``eval_krippendorff_alpha``: the annotation-quality companion to
  eval_fleiss_kappa (wave8k.py) — same m=3 raters from the event
  stream, but Krippendorff's D_e uses the (n-1) small-sample pairwise
  correction, giving the fraction-cleared identity
      alpha = ((m-1)(n^2 - C2) - (nm - SQ)(n - 1))
            / ((m-1)(n^2 - C2)),    n = N*m
  — exact integers end-to-end (DECIMAL ladder past int64), one rounded
  division to micro-units. Krippendorff is the standard reliability
  readout for LLM annotation/rater pipelines.

Reference parity: the reference (task.ts:88-189) has none of this —
SURVEY §2.C extension mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_caic_spark.operators.multimodal import python_fanout
from etl_caic_spark.registry import register
from etl_caic_spark.sources import load_table
from etl_caic_spark.util import scratch_path

# --------------------------------------------------------------------------
# multimodal_tiff_codec
# --------------------------------------------------------------------------

_TIFF_OUT = (
    "doc_id bigint, width int, height int, channels int, n_values bigint,"
    " value_sum bigint, value_min int, value_max int"
)


def _tiff_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    from etl_caic_spark.operators.codecs import decode_tiff, encode_tiff

    for pdf in it:
        rows = []
        for d in pdf["doc_id"].astype("int64"):
            d = int(d)
            w, h = d % 17 + 5, d % 13 + 5
            ch = 1 if d % 2 == 0 else 3
            i = np.arange(w * h * ch, dtype=np.int64)
            p = ((d * 52711 + i * 2654435761 + 13) % 256).astype(np.uint8)
            arr = p.reshape((h, w) if ch == 1 else (h, w, 3))
            dec = decode_tiff(encode_tiff(arr))
            assert dec.shape == arr.shape and (dec == arr).all()
            flat = dec.astype(np.int64).ravel()
            rows.append(
                (d, w, h, ch, int(flat.size), int(flat.sum()),
                 int(flat.min()), int(flat.max()))
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "width", "height", "channels", "n_values",
                "value_sum", "value_min", "value_max",
            ],
        )


@register(
    "multimodal_tiff_codec",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             doc_id % 17 + 5 AS w,
             doc_id % 13 + 5 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, ch,
             (doc_id * 52711 + i * 2654435761 + 13) % 256 AS p
      FROM dims,
           LATERAL (SELECT unnest(generate_series(0, w*h*ch - 1)) AS i) g
    )
    SELECT doc_id, CAST(min(w) AS INT) AS width, CAST(min(h) AS INT) AS height,
           CAST(min(ch) AS INT) AS channels,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(sum(p) AS BIGINT) AS value_sum,
           CAST(min(p) AS INT) AS value_min, CAST(max(p) AS INT) AS value_max
    FROM px GROUP BY doc_id
    """,
    tags=("multimodal", "codec", "udf"),
)
def multimodal_tiff_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real TIFF pipeline: per document, synthesize a closed-form image
    (grey for even doc_id, RGB for odd — both photometric layouts),
    ENCODE to genuine baseline TIFF bytes, DECODE back, emit integer
    pixel features. The oracle replays the closed form, so the hash
    match certifies the container roundtrip; the in-batch assert makes
    a lossy roundtrip fail loudly rather than silently shifting sums.
    Arrow-batched mapInPandas behind the shared python_fanout (the
    single-file-scan parallelism fix, SCALE.md round 9)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return python_fanout(d).mapInPandas(_tiff_batches, _TIFF_OUT)


# --------------------------------------------------------------------------
# scan_fixed_width
# --------------------------------------------------------------------------

_FW_ORACLE = """
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(round(l_quantity) AS BIGINT) AS qty
    FROM lineitem
    WHERE l_orderkey % 19 = 0
"""


@register("scan_fixed_width", oracle=_FW_ORACLE, tags=("scan", "format"))
def scan_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width (copybook-style) records: pack the roundtrip
    projection into 25-char lines (12/4/1/8 columns, left-justified
    rpad), write as plain text, read back by SUBSTRING offsets with
    trim + cast — schema-on-read with no delimiter. At 100 TB this is
    the mainframe-extract ingestion path; substring projection is
    whole-stage codegen, and the text scan splits by line like any
    other."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 19 == 0)
    packed = li.select(
        F.concat(
            F.rpad(F.col("l_orderkey").cast("string"), 12, " "),
            F.rpad(F.col("l_linenumber").cast("string"), 4, " "),
            F.rpad(F.col("l_returnflag"), 1, " "),
            F.rpad(F.round(F.col("l_quantity")).cast("bigint").cast("string"), 8, " "),
        ).alias("value")
    )
    path = scratch_path("fixed_width")
    packed.write.mode("overwrite").text(path)
    raw = spark.read.text(path)
    return raw.select(
        F.trim(F.substring("value", 1, 12)).cast("bigint").alias("l_orderkey"),
        F.trim(F.substring("value", 13, 4)).cast("int").alias("l_linenumber"),
        F.substring("value", 17, 1).alias("l_returnflag"),
        F.trim(F.substring("value", 18, 8)).cast("bigint").alias("qty"),
    )


# --------------------------------------------------------------------------
# sink_compressed_roundtrip
# --------------------------------------------------------------------------

_GZ_ORACLE = """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
    FROM lineitem
    WHERE l_orderkey % 19 = 0
"""

_GZ_SCHEMA = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_quantity", T.DoubleType()),
    ]
)


@register("sink_compressed_roundtrip", oracle=_GZ_ORACLE, tags=("sink", "format"))
def sink_compressed_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gzip JSON-lines write -> schema-explicit read (codec inferred
    from the .gz extension on read — nothing to configure, nothing to
    drift). Compressed text is the 100 TB default for interchange
    formats; columnar formats carry their own codecs (parquet/ORC
    roundtrips elsewhere in the formats family)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 19 == 0)
    src = li.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    path = scratch_path("roundtrip_json_gz")
    src.write.mode("overwrite").option("compression", "gzip").json(path)
    return spark.read.schema(_GZ_SCHEMA).json(path)


# --------------------------------------------------------------------------
# eval_krippendorff_alpha
# --------------------------------------------------------------------------

_M = 3  # raters per item (the eval_fleiss_kappa construction)

_KRIPP_SQL = f"""
    WITH lab AS (
      SELECT event_id // {_M} AS item, event_type AS label
      FROM events
    ),
    full_items AS (
      SELECT item FROM lab GROUP BY 1 HAVING count(*) = {_M}
    ),
    cell AS (
      SELECT l.item, l.label, CAST(count(*) AS BIGINT) AS n_ij
      FROM lab l JOIN full_items USING (item)
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT CAST(count(DISTINCT item) AS BIGINT) AS n_items,
             CAST(sum(n_ij * n_ij) AS BIGINT) AS sq
      FROM cell
    ),
    marg AS (
      SELECT CAST(sum(cj * cj) AS HUGEINT) AS c2
      FROM (SELECT CAST(sum(n_ij) AS BIGINT) AS cj FROM cell GROUP BY label)
    ),
    t AS (
      SELECT n_items, sq, c2, CAST(n_items * {_M} AS HUGEINT) AS n
      FROM agg CROSS JOIN marg
    )
    SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(sq AS BIGINT) AS sq,
           CAST(c2 AS BIGINT) AS chance_sq_sum,
           CAST(round(({_M - 1} * (n * n - c2)
                       - (n * {_M} - sq) * (n - 1)) * 1000000.0
                      / ({_M - 1} * (n * n - c2))) AS BIGINT)
             AS alpha_micro
    FROM t
"""


@register("eval_krippendorff_alpha", oracle=_KRIPP_SQL, tags=("eval", "stats"))
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal, complete m=3 ratings per item —
    the eval_fleiss_kappa rater construction; module docstring for the
    fraction-cleared identity). Differs from Fleiss by the pairwise
    (n-1) small-sample correction in the expected disagreement — the
    two metrics bracket each other on the same data and both belong in
    an annotation-quality report.

    Plan shape: identical to eval_fleiss_kappa — one scan, full-items
    HAVING filter, (item, label) cells, two dimension-sized reduces;
    the algebra needs only three scalars at any scale."""
    ev = load_table(spark, sf_dir, "events")
    lab = ev.select(
        F.expr(f"event_id div {_M}").alias("item"),
        F.col("event_type").alias("label"),
    )
    full_items = lab.groupBy("item").count().filter(F.col("count") == _M).select("item")
    cell = (
        lab.join(full_items, "item")
        .groupBy("item", "label")
        .agg(F.count("*").cast("bigint").alias("n_ij"))
    )
    agg = cell.agg(
        F.countDistinct("item").cast("bigint").alias("n_items"),
        F.sum(F.col("n_ij") * F.col("n_ij")).cast("bigint").alias("sq"),
    )
    marg = (
        cell.groupBy("label")
        .agg(F.sum("n_ij").cast("bigint").alias("cj"))
        .agg(F.sum(F.col("cj").cast("decimal(38,0)") * F.col("cj")).alias("c2"))
    )
    t = agg.crossJoin(marg).select(
        "n_items",
        "sq",
        "c2",
        (F.col("n_items").cast("decimal(38,0)") * _M).alias("n"),
    )
    num = (_M - 1) * (F.col("n") * F.col("n") - F.col("c2")) - (
        F.col("n") * _M - F.col("sq")
    ) * (F.col("n") - 1)
    den = (_M - 1) * (F.col("n") * F.col("n") - F.col("c2"))
    return t.select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.col("sq").cast("bigint").alias("sq"),
        F.col("c2").cast("bigint").alias("chance_sq_sum"),
        F.round(num * 1000000.0 / den).cast("bigint").alias("alpha_micro"),
    )
