"""End-to-end gate: Spark pipeline vs the independent pandas oracle.

The BASELINE.json acceptance criterion — triple P/R ≥ 0.95 (we hold
ourselves to 1.0 on the deterministic generator), failed-statement
parity, and the per-turn text-equality invariant."""

import pytest

from import_spark.oracle import expected_triples, precision_recall
from import_spark.plans.kg_pipeline import run_pipeline
from import_spark.sources.transcripts import (
    build_dcid_dictionary,
    dcid_dictionary,
    generate_transcripts,
)


@pytest.fixture(scope="module")
def result(spark):
    tr = generate_transcripts(spark, 150).cache()
    res = run_pipeline(spark, tr, dcid_dictionary(spark))
    got = {(r.subj, r.pred, r.obj_type, r.obj) for r in res.triples.collect()}
    want, failed_uses = expected_triples(tr.toPandas(), build_dcid_dictionary())
    return res, got, want, failed_uses


def test_precision_recall_gate(result):
    res, got, want, _ = result
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0  # deterministic generator → exact


def test_failed_statement_parity(result):
    res, _, _, failed_uses = result
    assert res.failed.count() == len(failed_uses)


def test_text_invariant(result):
    res, _, _, _ = result
    assert res.text_digest_in == res.text_digest_out != 0


def test_no_unresolved_refs_in_output(result):
    res, got, _, _ = result
    assert not any(t == "UNRESOLVED_REF" for _, _, t, _ in got)
    assert not any(o.startswith("l:") for _, _, t, o in got if t == "RESOLVED_REF")


def test_triples_are_distinct(result):
    res, got, _, _ = result
    assert res.triples.count() == res.triples.dropDuplicates(
        ["subj", "pred", "obj_type", "obj"]
    ).count()
