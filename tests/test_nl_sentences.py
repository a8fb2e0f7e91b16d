"""NL sentence / topic-cache generation vs the reference's own goldens
(simple/tests/stats/nl_test.py + test_data/nl fixtures, byte-exact)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from import_spark.operators.nl_sentences import (
    custom_catalog_yaml,
    nl_sentences,
    sentences_csv_text,
    topic_cache_json,
    without_subject_type,
    write_nl_outputs,
)

NL_DATA = "/root/reference/simple/tests/stats/test_data/nl"
FAKE = "//fake/path"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(NL_DATA), reason="reference NL fixtures not present"
)


def _triples(spark, name):
    pdf = pd.read_csv(os.path.join(NL_DATA, "input", f"{name}.csv"), keep_default_na=False)
    pdf["_idx"] = range(len(pdf))
    return spark.createDataFrame(pdf)


def _golden(name, fname):
    with open(os.path.join(NL_DATA, "expected", name, fname)) as f:
        return f.read()


@pytest.mark.parametrize(
    "name", ["sv_triples", "topic_triples", "sv_and_topic_triples"]
)
def test_sentences_csv_golden(spark, name):
    t = without_subject_type(_triples(spark, name), "StatVarPeerGroup")
    got = sentences_csv_text(nl_sentences(t, order_col="_idx"))
    assert got == _golden(name, "sentences.csv")


@pytest.mark.parametrize(
    "name", ["sv_triples", "topic_triples", "sv_and_topic_triples"]
)
def test_catalog_yaml_golden(spark, name):
    got = custom_catalog_yaml(FAKE, f"{FAKE}/embeddings/embeddings.csv")
    assert got == _golden(name, "custom_catalog.yaml")


@pytest.mark.parametrize("name", ["topic_triples", "sv_and_topic_triples"])
def test_topic_cache_golden(spark, name):
    t = without_subject_type(_triples(spark, name), "StatisticalVariable")
    got = topic_cache_json(t, order_col="_idx")
    assert got == _golden(name, "custom_dc_topic_cache.json")


def test_write_nl_outputs_layout(spark, tmp_path):
    """Runner-shaped end-to-end: type filtering AND type ordering
    (runner.py:815-829 concatenates topic_triples + sv_triples, so
    Topic subjects come FIRST even though the fixture lists SVs first)
    reproduce the golden CONTENT with the runner's row order."""
    t = _triples(spark, "sv_and_topic_triples")
    out = str(tmp_path / "nl")
    write_nl_outputs(t, out, order_col="_idx")
    name = "sv_and_topic_triples"
    lines = _golden(name, "sentences.csv").splitlines()
    header, rows = lines[0], lines[1:]
    runner_ordered = (
        [header]
        + [r for r in rows if r.startswith("topic_")]
        + [r for r in rows if r.startswith("sv_")]
    )
    with open(os.path.join(out, "sentences.csv")) as f:
        assert f.read() == "\n".join(runner_ordered) + "\n"
    # cache golden is already Topic-then-SVPG ordered — byte-exact
    with open(os.path.join(out, "custom_dc_topic_cache.json")) as f:
        assert f.read() == _golden(name, "custom_dc_topic_cache.json")
    with open(os.path.join(out, "embeddings", "custom_catalog.yaml")) as f:
        got = f.read().replace(out, FAKE)
        assert got == _golden(name, "custom_catalog.yaml")


def test_write_nl_outputs_topic_first_even_when_interleaved(spark, tmp_path):
    """An SV appearing before any Topic in the triple stream must still
    land AFTER every Topic row (the Runner's topic+sv concat)."""
    rows = [
        ("sv1", "typeOf", "StatisticalVariable", "", 0),
        ("sv1", "name", "", "SV one", 1),
        ("top1", "typeOf", "Topic", "", 2),
        ("top1", "name", "", "Topic one", 3),
    ]
    t = spark.createDataFrame(
        rows,
        "subject_id string, predicate string, object_id string, object_value string, _idx long",
    )
    out = str(tmp_path / "nl2")
    write_nl_outputs(t, out, order_col="_idx")
    with open(os.path.join(out, "sentences.csv")) as f:
        assert f.read() == "dcid,sentence\ntop1,Topic one\nsv1,SV one\n"


def test_sentences_csv_empty_no_header(spark):
    """pandas to_csv of an empty (column-less) frame emits just a
    newline — the empty sentence set must match it."""
    from import_spark.operators.nl_sentences import nl_sentences, sentences_csv_text

    t = spark.createDataFrame(
        [], "subject_id string, predicate string, object_id string, object_value string, _idx long"
    )
    assert sentences_csv_text(nl_sentences(t, order_col="_idx")) == "\n"


def test_name_last_wins_and_empty_skip(spark):
    """Reference SentenceCandidates: repeated name triples overwrite
    (last wins); subjects whose only candidates are empty are skipped."""
    rows = [
        ("sv1", "name", "", "first name", 0),
        ("sv1", "name", "", "second name", 1),
        ("sv2", "name", "", "", 2),
        ("sv3", "searchDescription", "", "", 3),
    ]
    t = spark.createDataFrame(
        rows, "subject_id string, predicate string, object_id string, object_value string, _idx long"
    )
    got = {(r.dcid, r.sentence) for r in nl_sentences(t, order_col="_idx").collect()}
    assert got == {("sv1", "second name")}
