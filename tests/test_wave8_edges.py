"""Edge-case differentials for the round-8 review fixes, driven through
BOTH engines on synthetic fixtures: the driver fixtures are NULL-free
and always share n-grams, so the ln(0) and NULL-canonicalization guards
are unreachable there. These tests build tiny documents.parquet
fixtures and compare the Spark query against its registered DuckDB
oracle directly — the same differential the driver runs, on the inputs
that used to diverge."""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_caic_spark.registry import all_specs

SPECS = all_specs()

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _write_docs(spark, tmp_path, rows):
    d = spark.createDataFrame(rows, DOC_SCHEMA)
    d.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    return str(tmp_path)


def _oracle(sf_dir, sql):
    """Run the oracle and return eagerly-fetched (cols, rows) — a lazy
    relation would outlive its connection."""
    con = duckdb.connect()
    # Spark writes documents.parquet as a DIRECTORY of part files
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet/*.parquet'"
    )
    rel = con.sql(sql)
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    con.close()
    return cols, rows


def test_bleu_zero_overlap_is_null_on_both_engines(spark, tmp_path):
    # one pair, no shared unigrams or bigrams between ref (even) and
    # hyp (odd) -> clipped counts are 0 -> ln_bleu2_micro must be NULL
    # on BOTH engines (DuckDB used to hard-error on ln(0))
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "alpha beta gamma", "en", "s", 16),
            (1, "delta epsilon zeta", "en", "s", 18),
        ],
    )
    spec = SPECS["eval_bleu_corpus"]
    srow = spec.fn(spark, sf).collect()[0]
    ocols, orows = _oracle(sf, spec.oracle)
    o = dict(zip(ocols, orows[0]))
    assert srow["clip1"] == o["clip1"] == 0
    assert srow["ln_bleu2_micro"] is None
    assert o["ln_bleu2_micro"] is None
    # the non-log columns still agree exactly
    for c in ("n_pairs", "len_ref", "len_hyp", "tot1", "tot2", "bp_micro"):
        assert srow[c] == o[c], c


@pytest.mark.parametrize(
    "null_field",
    ["lang", "text", "n_chars"],
)
def test_fingerprint_null_fields_agree_across_engines(spark, tmp_path, null_field):
    row = {"doc_id": 7, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}
    row[null_field] = None
    sf = _write_docs(
        spark,
        tmp_path,
        [
            tuple(row[k] for k in ("doc_id", "text", "lang", "source", "n_chars")),
            (8, "other doc", "fr", "s", 9),
        ],
    )
    spec = SPECS["dq_dataset_fingerprint"]
    srows = {r["source"]: r for r in spec.fn(spark, sf).collect()}
    ocols, raw = _oracle(sf, spec.oracle)
    orows = {dict(zip(ocols, r))["source"]: dict(zip(ocols, r)) for r in raw}
    assert set(srows) == set(orows)
    for s in srows:
        for c in ("n_rows", "fp_sum", "fp_xor", "fp_min"):
            assert srows[s][c] == orows[s][c], (s, c, null_field)
    # the NULL row is COUNTED (not silently dropped as '||' would)
    assert srows["__all__"]["n_rows"] == 2


def test_fingerprint_null_not_collided_with_shifted_fields(spark, tmp_path):
    # (lang=NULL, n_chars=2) must NOT canonify identically to
    # (lang='2', n_chars=NULL): concat_ws without markers drops the
    # NULL field AND its separator, colliding the two rows
    sf_a = _write_docs(spark, str(tmp_path) + "_a", [(1, "x", None, "s", 2)])
    sf_b = _write_docs(spark, str(tmp_path) + "_b", [(1, "x", "2", "s", None)])
    spec = SPECS["dq_dataset_fingerprint"]
    fa = spec.fn(spark, sf_a).filter("source = '__all__'").collect()[0]["fp_xor"]
    fb = spec.fn(spark, sf_b).filter("source = '__all__'").collect()[0]["fp_xor"]
    assert fa != fb
