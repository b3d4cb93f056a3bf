"""Focused scale probe for the round-8 wave operators: HITS iteration,
Adamic-Adar wedge enumeration, chrF char-gram folding, BPE merge
learning, and the dataset fingerprint.

Reuses tools/scale_probe.py's replication machinery (shifted keys,
per-replica text rotation). Expectation per shape:
- graph_hits core: linear in |E| per round (edges checkpointed once).
- adamic_adar core: wedge count grows ~linearly when degree is bounded
  (the replicated graph adds disjoint components, not denser hubs).
- chrf/bleu gram fold: linear in corpus bytes (explode + partial agg).
- bpe: FLAT past 1x — rounds run on the fixed-size vocabulary, so the
  only growing stage is the initial word count.
- fingerprint: linear scan, constant shuffle.

Usage: python tools/scale_probe_wave8.py [factors...]  (default 1 10 30)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window as W  # noqa: E402

from etl_caic_spark.session import get_spark  # noqa: E402
from tools.scale_probe import SF_DIR, replicate, timeit  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    factors = [int(x) for x in sys.argv[1:]] or [1, 10, 30]
    spark = get_spark(app_name="scale-probe-w8", cpus=32)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    for factor in factors:
        ev = replicate(spark, "events", factor, "event_id", 10_000_000)
        # user_id must shift with the replica too, or replicas collapse
        # onto the same 150 vertices and measure densification instead of
        # graph growth; derive it from the shifted event_id.
        ev = ev.withColumn(
            "user_id",
            F.col("user_id")
            + (F.expr("event_id div 10000000")).cast("bigint") * 1000,
        )
        docs = replicate(spark, "documents", factor, "doc_id", 10_000_000)

        # -- graph_hits core: 3 rounds over the consecutive-event graph
        def hits():
            w = W.partitionBy("event_type").orderBy("ts", "event_id")
            seq = ev.select(
                F.lag("user_id").over(w).alias("src"),
                F.col("user_id").alias("dst"),
            )
            edges = (
                seq.filter(F.col("src").isNotNull() & (F.col("src") != F.col("dst")))
                .distinct()
                .localCheckpoint()
            )
            nodes = (
                edges.select(F.col("src").alias("v"))
                .unionAll(edges.select(F.col("dst").alias("v")))
                .distinct()
                .localCheckpoint()
            )
            h = nodes.select("v", F.lit(1000000).cast("bigint").alias("h"))

            def norm(frame, col):
                filled = (
                    nodes.join(frame, "v", "left")
                    .select("v", F.coalesce(F.col(col), F.lit(0)).cast("bigint").alias(col))
                    .localCheckpoint()
                )
                mx = filled.agg(F.max(col).alias("m"))
                return filled.crossJoin(F.broadcast(mx)).select(
                    "v",
                    F.round(F.col(col) * 1e6 / F.col("m")).cast("bigint").alias(col),
                )

            a = None
            for _ in range(3):
                a = norm(
                    edges.join(h.withColumnRenamed("v", "src"), "src")
                    .groupBy(F.col("dst").alias("v"))
                    .agg(F.sum("h").cast("bigint").alias("a")),
                    "a",
                )
                h = norm(
                    edges.join(a.withColumnRenamed("v", "dst"), "dst")
                    .groupBy(F.col("src").alias("v"))
                    .agg(F.sum("a").cast("bigint").alias("h")),
                    "h",
                )
            noop(h.join(a, "v"))

        # -- adamic-adar core: wedge enumeration + anti-join
        def adamic():
            evf = ev.filter(F.col("event_id") % 37 == 0)
            dst = (F.col("user_id") * 7 + F.col("event_id")) % 150 + (
                F.expr("event_id div 10000000") * 1000
            )
            e = (
                evf.select(
                    F.least(F.col("user_id"), dst).alias("a"),
                    F.greatest(F.col("user_id"), dst).alias("b"),
                )
                .filter(F.col("a") != F.col("b"))
                .distinct()
                .localCheckpoint()
            )
            u = e.select(F.col("a").alias("s"), F.col("b").alias("d")).unionAll(
                e.select(F.col("b").alias("s"), F.col("a").alias("d"))
            )
            deg = u.groupBy(F.col("s").alias("v")).agg(F.count("*").alias("deg"))
            iln = F.round(F.round(F.log("deg"), 6) * 1e6).cast("bigint")
            contrib = deg.filter(F.col("deg") >= 2).select(
                "v", F.round(F.lit(1e12) / iln).cast("bigint").alias("w")
            )
            wedge = (
                u.alias("u1")
                .join(
                    u.alias("u2"),
                    (F.col("u2.s") == F.col("u1.s")) & (F.col("u1.d") < F.col("u2.d")),
                )
                .join(contrib, F.col("v") == F.col("u1.s"))
                .select(F.col("u1.d").alias("x"), F.col("u2.d").alias("z"), "w")
            )
            scored = wedge.groupBy("x", "z").agg(F.sum("w").alias("aa"))
            noop(scored.join(e, (scored.x == e.a) & (scored.z == e.b), "left_anti"))

        # -- chrF-style char-gram fold (the heavy explode stage)
        def chrf():
            pairs = docs.select(
                F.expr("doc_id div 2").alias("pair_id"),
                (F.col("doc_id") % 2).alias("side"),
                "text",
            )
            g2 = (
                pairs.filter(F.length("text") >= 2)
                .select(
                    "pair_id",
                    "side",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, length(text) - 1),"
                            " i -> substring(text, i, 2))"
                        )
                    ).alias("g"),
                )
                .groupBy("pair_id", "side", "g")
                .agg(F.count("*").alias("c"))
            )
            h = g2.filter(F.col("side") == 1).select("pair_id", "g", F.col("c").alias("hc"))
            r = g2.filter(F.col("side") == 0).select("pair_id", "g", F.col("c").alias("rc"))
            noop(
                h.join(r, ["pair_id", "g"], "left").agg(
                    F.sum(F.least(F.col("hc"), F.coalesce(F.col("rc"), F.lit(0)))),
                    F.sum("hc"),
                )
            )

        # -- BPE: 3 merge rounds (should be flat past the word count)
        def bpe():
            wf = (
                docs.select(F.explode(F.split("text", " ")).alias("w"))
                .filter(F.length("w") > 0)
                .groupBy("w")
                .agg(F.count("*").cast("bigint").alias("f"))
            )
            vocab = (
                wf.orderBy(F.desc("f"), F.asc("w"))
                .limit(200)
                .select(
                    "f",
                    F.concat(F.lit(" "), F.regexp_replace("w", "(.)", "$1 ")).alias("sym"),
                )
                .localCheckpoint()
            )
            cur = vocab
            for _ in range(3):
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
                    .select("f", "p.l", "p.r")
                )
                top = (
                    pairs.groupBy("l", "r")
                    .agg(F.sum("f").alias("wt"))
                    .orderBy(F.desc("wt"), F.asc("l"), F.asc("r"))
                    .limit(1)
                )
                pat = F.concat(F.lit(" "), F.col("l"), F.lit(" "), F.col("r"), F.lit(" "))
                rep = F.concat(F.lit(" "), F.col("l"), F.col("r"), F.lit(" "))
                cur = cur.crossJoin(F.broadcast(top)).select(
                    "f", F.replace(F.replace("sym", pat, rep), pat, rep).alias("sym")
                )
            noop(cur)

        # -- fingerprint: one scan, rollup
        def fingerprint():
            hx = F.md5(
                F.concat_ws(
                    "|",
                    F.col("doc_id").cast("string"),
                    F.col("lang"),
                    F.col("n_chars").cast("string"),
                    F.md5("text"),
                )
            )
            v = F.conv(F.substring(hx, 1, 15), 16, 10).cast("bigint")
            noop(
                docs.select("source", v.alias("v"))
                .rollup("source")
                .agg(
                    F.count("*"),
                    F.sum(F.col("v").cast("decimal(38,0)")),
                    F.expr("bit_xor(v)"),
                    F.min("v"),
                )
            )

        row = {
            "factor": factor,
            "hits_s": timeit(hits),
            "adamic_s": timeit(adamic),
            "chrf_s": timeit(chrf),
            "bpe_s": timeit(bpe),
            "fingerprint_s": timeit(fingerprint),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
