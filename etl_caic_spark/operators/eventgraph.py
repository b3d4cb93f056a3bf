"""The deterministic sparse event graph — THE shared derivation.

Several graph queries (graph_triangles graphq.py, graph_adamic_adar
wave8d.py, graph_harmonic_centrality wave8g.py) operate on the same
synthetic undirected graph derived from the events table:

    keep rows with event_id % 37 == 0
    dst  = (user_id * 7 + event_id) % 150
    edge = (least(user_id, dst), greatest(user_id, dst)),  a != b,
    DISTINCT

Their docstrings claim "the same graph" — this helper is what makes
that claim structural rather than three copies that could drift. Any
change here must be mirrored in each consumer's DuckDB oracle (the
oracles necessarily inline the SQL text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deterministic_event_edges(ev: DataFrame) -> DataFrame:
    """events -> distinct undirected edges (a < b), ~1 edge per 37 events.

    Returns an UNCACHED frame; callers with multiple consumers should
    localCheckpoint it themselves (every current consumer does)."""
    evf = ev.filter(F.col("event_id") % 37 == 0)
    dst = (F.col("user_id") * 7 + F.col("event_id")) % 150
    return (
        evf.select(
            F.least(F.col("user_id"), dst).alias("a"),
            F.greatest(F.col("user_id"), dst).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """(a, b) undirected edges -> both-direction (s, d) arc list."""
    return edges.select(F.col("a").alias("s"), F.col("b").alias("d")).unionAll(
        edges.select(F.col("b").alias("s"), F.col("a").alias("d"))
    )
