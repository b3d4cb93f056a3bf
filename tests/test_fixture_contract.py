"""Fixture contract: pin the parquet types the engine assumes.

Round 3 lost 31 queries and 42 tests to a silent driver-side fixture change
(events.ts went from INT64 TIMESTAMP(NANOS) to TIMESTAMP(MICROS)). This file
makes any such drift fail in ONE loud assert instead of a shrapnel field of
broken queries. It reads footers only — no Spark session, no row groups.

The events.ts check intentionally mirrors the loader's branching
(etl_caic_spark/sources/tables.py): both the nanos-int64 and the
timestamp[us/ms] encodings are *accepted*, because the loader handles both;
anything else (string, float, seconds-scale ints) must fail.
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

EXPECTED = {
    "region": {"r_regionkey": pa.types.is_integer, "r_name": pa.types.is_string},
    "nation": {"n_nationkey": pa.types.is_integer, "n_regionkey": pa.types.is_integer},
    "customer": {"c_custkey": pa.types.is_integer, "c_acctbal": pa.types.is_floating},
    "supplier": {"s_suppkey": pa.types.is_integer, "s_nationkey": pa.types.is_integer},
    "part": {"p_partkey": pa.types.is_integer, "p_retailprice": pa.types.is_floating},
    "orders": {
        "o_orderkey": pa.types.is_integer,
        "o_custkey": pa.types.is_integer,
        "o_totalprice": pa.types.is_floating,
        "o_orderdate": lambda t: pa.types.is_date(t) or pa.types.is_timestamp(t),
    },
    "lineitem": {
        "l_orderkey": pa.types.is_integer,
        "l_partkey": pa.types.is_integer,
        "l_quantity": lambda t: pa.types.is_floating(t) or pa.types.is_decimal(t),
        "l_extendedprice": lambda t: pa.types.is_floating(t) or pa.types.is_decimal(t),
        "l_discount": lambda t: pa.types.is_floating(t) or pa.types.is_decimal(t),
        "l_returnflag": pa.types.is_string,
        "l_shipdate": lambda t: pa.types.is_date(t) or pa.types.is_timestamp(t),
    },
    "events": {
        "event_id": pa.types.is_integer,
        "user_id": pa.types.is_integer,
        "event_type": pa.types.is_string,
        "value": pa.types.is_floating,
        "props": pa.types.is_string,
        # ts: either encoding the loader supports
        "ts": lambda t: pa.types.is_timestamp(t) or pa.types.is_integer(t),
    },
    "documents": {
        "doc_id": pa.types.is_integer,
        "text": pa.types.is_string,
    },
    "embeddings": {
        "vec_id": pa.types.is_integer,
        # array<float/double>
        "embedding": lambda t: (pa.types.is_list(t) or pa.types.is_large_list(t))
        and pa.types.is_floating(t.value_type),
    },
}


def _schema(table):
    return pq.read_schema(os.path.join(SF_DIR, f"{table}.parquet"))


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_contract(table):
    schema = _schema(table)
    names = set(schema.names)
    for col, pred in EXPECTED[table].items():
        assert col in names, (
            f"{table}.parquet no longer has column {col!r} (has {sorted(names)}); "
            "the driver regenerated the fixture — update the engine's loaders."
        )
        t = schema.field(col).type
        assert pred(t), (
            f"{table}.{col} has parquet type {t!r}, outside the contract this "
            "engine was built against. Update the loader AND this contract."
        )


def test_events_ts_decodes_to_sane_epoch():
    """Unit-drift guard: whatever encoding ts uses, the loader's
    interpretation of the footer min must land in (1990, 2100). This is the
    one assert that would have caught round 3's silent µs-as-ns misread."""
    from etl_caic_spark.sources.tables import events_ts_physical_type

    path = os.path.join(SF_DIR, "events.parquet")
    kind = events_ts_physical_type(path)
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index("ts")
    mins = [
        md.row_group(rg).column(idx).statistics.min
        for rg in range(md.num_row_groups)
        if md.row_group(rg).column(idx).statistics is not None
        and md.row_group(rg).column(idx).statistics.has_min_max
    ]
    assert mins, "events.parquet writes no ts statistics; cannot cheap-check"
    lo = min(mins)
    if kind == "int_nanos":
        lo = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=lo // 1000
        )
    assert 1990 < lo.year < 2100, (
        f"events.ts min decodes to {lo!r} under the {kind!r} interpretation — "
        "the fixture's timestamp unit drifted; fix sources/tables.py."
    )


def test_loader_rejects_insane_ts(tmp_path):
    """The loader-side guard itself must throw on a wrong-unit file (e.g.
    seconds stored where the nanos branch would decode them as ~1970)."""
    from etl_caic_spark.sources.tables import _assert_sane_ts_range, _sniff_ts

    bad = tmp_path / "events.parquet"
    # seconds-since-epoch stored as int64: the nanos interpretation collapses
    # these to 1970, which the guard must reject.
    tbl = pa.table({"ts": pa.array([1_700_000_000, 1_700_000_500], pa.int64())})
    pq.write_table(tbl, bad)
    kind = _sniff_ts(str(bad))
    assert kind == "int_nanos"
    with pytest.raises(ValueError, match="sanity check failed"):
        _assert_sane_ts_range(str(bad), kind)
