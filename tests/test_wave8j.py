"""Round-8 wave J: weighted median."""

from __future__ import annotations

from etl_caic_spark.registry import all_specs

SPECS = all_specs()


def test_weighted_median_python_replay(spark, sf_dir):
    import pyspark.sql.functions as F

    from etl_caic_spark.sources import load_table

    got = {r["grp"]: r for r in
           SPECS["agg_weighted_median"].fn(spark, sf_dir).collect()}
    assert set(got) == {"A", "N", "R"}
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("grp"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
            F.round(F.col("l_quantity") * 10).cast("bigint").alias("w"),
        )
        .collect()
    )
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["grp"], []).append((r["cents"], r["w"]))
    for grp, vals in groups.items():
        vals.sort()
        tot = sum(w for _, w in vals)
        cum = 0
        for cents, w in vals:
            cum += w
            if 2 * cum >= tot:
                break
        g = got[grp]
        assert g["weighted_median_cents"] == cents, grp
        assert g["total_weight_deci"] == tot
        assert g["n_rows"] == len(vals)


def test_weighted_median_equals_plain_median_on_unit_weights(spark):
    # closed-form sanity: unit weights reduce to the lower median
    vals = [(1, 1), (3, 1), (5, 1), (7, 1)]
    tot = sum(w for _, w in vals)
    cum = 0
    for v, w in vals:
        cum += w
        if 2 * cum >= tot:
            break
    assert v == 3  # lower median of {1,3,5,7}
