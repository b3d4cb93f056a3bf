"""Similarity search over embedding columns (array<float>), BASELINE.json
north star.

- cosine(): JVM-side cosine via zip_with/aggregate in double precision —
  no UDF, stays in whole-stage codegen.
- brute_force_topk(): exact top-k for a (small, broadcast) query set —
  the correctness baseline. Cost O(|Q| × |N|) with the query side
  broadcast; at 100 TB this is only used for spot checks.
- ivf_topk(): IVF-style partition-pruned approximate top-k — k-means-free
  coarse quantizer built from per-label centroids; queries probe the
  nprobe nearest centroids only. The scale path: candidate set shrinks by
  ~|labels|/nprobe, and the scan is an equi-join on the centroid id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add a double-cast vector and its L2 norm (precomputed once per row)."""
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn("_vec", v).withColumn("_norm", F.sqrt(_dot(v, v)))


def cosine(vec_a, norm_a, vec_b, norm_b):
    """cos = dot(a,b) / (|a| * |b|) — mirrors the DuckDB oracle formula
    list_inner_product / (sqrt(ip(a,a)) * sqrt(ip(b,b)))."""
    return _dot(vec_a, vec_b) / (norm_a * norm_b)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    sim_decimals: int = 6,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    The similarity is rounded before ranking (both here and in the oracle)
    so near-ties order identically across engines; ties break on vec_id."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("_vec").alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    # Broadcast the (small) query side; the corpus stays partitioned —
    # the scan parallelizes over corpus partitions at any scale.
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("q_vec"), F.col("q_norm"), F.col("c_vec"), F.col("c_norm")),
                sim_decimals,
            ),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("query_id", "vec_id", "cosine")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def exact_centroid_arrays(c: DataFrame, partition_col: str = "label") -> DataFrame:
    """Exact fixed-point per-partition centroids over a `with_norm`-style
    frame (needs `_vec`): per-dim SUM of floor(x·1e6) reduced exactly in
    BIGINT, one double division at the end — the engine-reproducible
    coarse quantizer shared by sim_topk_ivf_exact and the wave20
    SemDeDup prune. Returns (pt, c_vec, c_norm); tiny (one row per
    partition value) → always broadcast by consumers."""
    exploded = c.select(
        F.col(partition_col).alias("pt"), F.posexplode("_vec").alias("pos", "val")
    )
    per_dim = exploded.groupBy("pt", "pos").agg(
        F.sum(F.floor(F.col("val") * 1e6).cast("bigint")).alias("s"),
        F.count("*").alias("n"),
    )
    per_dim = per_dim.withColumn(
        "cval",
        F.col("s").cast("double") / (F.lit(1000000) * F.col("n")).cast("double"),
    )
    return (
        per_dim.groupBy("pt")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
        .select(
            "pt", F.transform("pairs", lambda s: s.getField("cval")).alias("c_vec")
        )
        .withColumn("c_norm", F.sqrt(_dot(F.col("c_vec"), F.col("c_vec"))))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
    k: int = 5,
    nprobe: int = 2,
    sim_decimals: int = 6,
    exact_centroids: bool = False,
) -> DataFrame:
    """IVF-style approximate top-k: centroids = mean vector per
    partition_col value (the coarse quantizer); each query probes only the
    nprobe closest centroids' partitions.

    Scale: centroids are tiny → broadcast; the candidate scan becomes an
    equi-join corpus.partition == probe.partition, so partition pruning
    replaces the full scan. Recall is checked against brute force in
    tests (property check, not an equality oracle).

    ``exact_centroids`` swaps the double `avg` (whose last bits depend on
    partial-aggregation order — the reason the plain variant is
    rows-only) for integer fixed-point means: per-dim SUM of
    floor(x·1e6) reduced exactly in BIGINT, one double division at the
    end, and the probe similarity rounded before ranking. Every step is
    then engine-reproducible and the query can carry a full SQL oracle
    (the same integerize-then-divide idiom as the engine's other exact
    aggregates)."""
    dim_probe = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    c = with_norm(corpus, vec_col)

    # Coarse quantizer: mean embedding per partition (array-wise avg via
    # posexplode + groupBy — scalable, no collect).
    if exact_centroids:
        centroid_arrays = exact_centroid_arrays(c, partition_col)
    else:
        exploded = c.select(
            F.col(partition_col).alias("pt"),
            F.posexplode("_vec").alias("pos", "val"),
        )
        per_dim = exploded.groupBy("pt", "pos").agg(F.avg("val").alias("cval"))
        centroid_arrays = (
            per_dim.groupBy("pt")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pairs"))
            .select(
                "pt",
                F.transform("pairs", lambda s: s.getField("cval")).alias("c_vec"),
            )
            .withColumn("c_norm", F.sqrt(_dot(F.col("c_vec"), F.col("c_vec"))))
        )

    c_sim = cosine(
        F.col("q_vec"), F.col("q_norm"), F.col("c_vec"), F.col("c_norm")
    )
    if exact_centroids:
        # Round before ranking so a last-bit summation difference between
        # engines can never flip the probe choice.
        c_sim = F.round(c_sim, sim_decimals)
    probes = (
        dim_probe.crossJoin(F.broadcast(centroid_arrays))
        .withColumn("c_sim", c_sim)
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("c_sim").desc(), "pt")
            ),
        )
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "q_norm", F.col("pt"))
    )

    cand = probes.join(
        c.select(
            F.col(id_col).alias("vec_id"),
            F.col(partition_col).alias("pt"),
            F.col("_vec").alias("c_vec"),
            F.col("_norm").alias("c_norm"),
        ),
        "pt",
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine",
        F.round(
            cosine(F.col("q_vec"), F.col("q_norm"), F.col("c_vec"), F.col("c_norm")),
            sim_decimals,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("query_id", "vec_id", "cosine")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ivf_topk_trained(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    sim_decimals: int = 6,
) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer (operators/kmeans.py):
    centroids(cluster, centroid) partition the corpus via nearest-centroid
    assignment (one broadcast pass); queries probe the nprobe nearest
    cells. This is the production IVF shape — the per-label variant in
    ivf_topk is the zero-training fallback."""
    from etl_caic_spark.operators.kmeans import assign_clusters

    corpus_cells = assign_clusters(corpus, centroids, id_col, vec_col)
    c = with_norm(corpus_cells, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col("cluster").alias("pt"),
        F.col("_vec").alias("c_vec"),
        F.col("_norm").alias("c_norm"),
    )
    cent = centroids.select(
        F.col("cluster").alias("pt"), F.col("centroid").alias("c_vec")
    ).withColumn("c_norm", F.sqrt(_dot(F.col("c_vec"), F.col("c_vec"))))

    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_vec").alias("q_vec"),
        F.col("_norm").alias("q_norm"),
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "c_sim",
            cosine(F.col("q_vec"), F.col("q_norm"), F.col("c_vec"), F.col("c_norm")),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.col("c_sim").desc(), "pt")
            ),
        )
        .filter(F.col("probe_rank") <= nprobe)
        .select("query_id", "q_vec", "q_norm", "pt")
    )
    cand = probes.join(c, "pt").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine",
        F.round(
            cosine(F.col("q_vec"), F.col("q_norm"), F.col("c_vec"), F.col("c_norm")),
            sim_decimals,
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.select("query_id", "vec_id", "cosine")
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    threshold: float = 0.3,
    sim_decimals: int = 6,
    salt: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within buckets (the
    embedding-space analogue of ngram_jaccard_pairs; bucketing bounds the
    pair space — at scale the bucket is an LSH/IVF cell, not a label).

    Parallelism note: joining on the bucket alone caps the task count at
    the number of distinct buckets — with O(10) labels the whole pair
    computation lands on O(10) tasks no matter how many cores exist. The
    `a` side therefore carries a hash salt (join key = (bkt, salt)) and
    the `b` side is replicated across the `salt` values, spreading each
    bucket's pair space over `salt` tasks. The pair predicate a.doc <
    b.doc is unaffected (every pair still meets exactly once, at the a
    row's salt)."""
    from etl_caic_spark.util import widen_narrow_scan

    n = with_norm(widen_narrow_scan(df), vec_col).select(
        F.col(id_col).alias("doc"),
        F.col(bucket_col).alias("bkt"),
        F.col("_vec").alias("vec"),
        F.col("_norm").alias("norm"),
    )
    a = n.withColumn("salt", F.pmod(F.xxhash64("doc"), F.lit(salt))).alias("a")
    b = (
        n.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        .withColumn("salt", F.col("salt").cast("bigint"))
        .alias("b")
    )
    pairs = a.join(
        b,
        (F.col("a.bkt") == F.col("b.bkt"))
        & (F.col("a.salt") == F.col("b.salt"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(
        F.col("a.doc").alias("id_a"),
        F.col("b.doc").alias("id_b"),
        F.col("a.bkt").alias("bucket"),
        F.round(
            cosine(F.col("a.vec"), F.col("a.norm"), F.col("b.vec"), F.col("b.norm")),
            sim_decimals,
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
