"""Sketch guarantees (round 5): count-min estimates can only overcount;
Bloom filters can never false-negative, and the properly-sized filter
keeps the false-positive rate tiny. Value-level parity with DuckDB is
covered by tests/test_oracle.py."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_countmin_never_undercounts(spark, sf_dir):
    rows = SPECS["sketch_countmin_freq"].fn(spark, sf_dir).collect()
    assert rows, "probe set is empty"
    assert all(r["est"] >= r["exact"] for r in rows)
    # the sketch is useful, not saturated: most probes estimate exactly
    exact_hits = sum(1 for r in rows if r["est"] == r["exact"])
    assert exact_hits >= len(rows) // 2


def test_bloom_no_false_negatives_and_low_fp(spark, sf_dir):
    rows = SPECS["sketch_bloom_membership"].fn(spark, sf_dir).collect()
    members = [r for r in rows if r["exact_member"]]
    non_members = [r for r in rows if not r["exact_member"]]
    assert members and non_members
    # false negatives are structurally impossible
    assert all(r["bloom_hit"] for r in members)
    # ~40 bits/key sizing => fp well under 1% at this scale
    fp = sum(1 for r in non_members if r["bloom_hit"])
    assert fp <= max(1, len(non_members) // 100)
