"""Hypothesis property test for the as-of join: against a brute-force
Python reference on arbitrary generated event sets, including ties and
empty sides (SURVEY.md §5.2.4)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_caic_spark.operators.asof import asof_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),  # key
    st.integers(min_value=0, max_value=50),  # ts
)


def brute_force_asof(left, right):
    """For each left (key, ts): max right ts' <= ts for the key, else None;
    the right value is ts' itself (right side deduped per (key, ts))."""
    out = {}
    for key, ts in left:
        cands = [rts for (rkey, rts) in right if rkey == key and rts <= ts]
        out[(key, ts)] = max(cands) if cands else None
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(ROW, min_size=1, max_size=25, unique=True),
    right=st.lists(ROW, min_size=0, max_size=25, unique=True),
)
def test_asof_join_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key int, ts int, lid int"
    )
    rdf = spark.createDataFrame(
        [(k, t, t) for (k, t) in right] or [(None, None, None)],
        "key int, ts int, rval int",
    )
    if not right:
        rdf = rdf.filter("key IS NOT NULL")
    got = {
        (r["key"], r["ts"]): r["rval"]
        for r in asof_join(
            ldf, rdf, on=["key"], left_ts="ts", right_ts="ts", right_values=["rval"]
        ).collect()
    }
    assert got == brute_force_asof(left, right)
