"""Ngram name search (operators/name_search.py) vs an independent
from-spec scorer.

The oracle below is written directly from the reference semantics
(simple/util/ngram_matcher.py:88-197) — word+chargram tokenization,
IDF postings, min-match-fraction filter, position/count boosts — with
the module's two documented deviations applied (idempotent
normalization; deterministic value/key tiebreak)."""

from __future__ import annotations

import random
import re

import pytest

from import_spark.operators.name_search import (
    build_name_index,
    ngram_name_search,
)

N = 4
FRAC = 0.8


def _norm(s: str) -> str:
    return re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", s.lower())).strip()


def _grams(norm: str) -> list[str]:
    out = norm.split(" ")
    for i in range(max(len(norm) - N, 0) + 1):
        g = norm[i : i + N]
        if g not in out:
            out.append(g)
    return out


def _expected(names: list[tuple[str, str]], queries: list[str], k=None):
    # index: ngram -> {(key, value): first position}; each (key, value)
    # pair is its own entry (duplicate name strings each count toward
    # df, matching the reference's per-key_index postings)
    post: dict[str, dict[tuple, int]] = {}
    for key, val in names:
        nk = _norm(key)
        for g in set(_grams(nk)):
            post.setdefault(g, {})[(key, val)] = nk.find(g)
    rows = set()
    for qtext in queries:
        qn = _norm(qtext)
        ql = _grams(qn)
        hits: dict[tuple, list] = {}
        for g in ql:
            for kv, pos in post.get(g, {}).items():
                # first posting sets the position; later ones take min
                # (a match deep inside a long key can score negative)
                h = hits.setdefault(kv, [0.0, 0, pos])
                h[0] += 1.0 / len(post[g])
                h[1] += 1
                h[2] = min(h[2], pos)
        scored = []
        for (key, val), (idf, m, pos) in hits.items():
            if m >= max(1.0, len(ql) * FRAC):
                score = round(idf + (len(qn) - pos) * 10000.0 + m * 100.0, 4)
                scored.append((score, val, key, m))
        scored.sort(key=lambda t: (-t[0], t[1], t[2]))
        for r, (score, val, key, m) in enumerate(scored[:k] if k else scored, 1):
            rows.add((qtext, r, key, val, m, score))
    return rows


WORDS = "san jose california costa rica spring green chocolate lace metallic".split()


def _rand_names(rng: random.Random, n: int) -> list[tuple[str, str]]:
    out = []
    for i in range(n):
        name = " ".join(rng.choices(WORDS, k=rng.randint(1, 4)))
        out.append((name, f"id/{i}"))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    names = _rand_names(rng, 60)
    queries = [
        "san jose",
        "sanjose",  # no-space form: pure chargram match
        "chocolate lace",
        "springgreen",
        "rica costa",
        "san san jose",  # duplicate word multiplicity
        "zzzz",  # no match at all
    ]
    ndf = spark.createDataFrame(names, "key string, value string")
    qdf = spark.createDataFrame([(q,) for q in queries], "query string")
    return names, queries, ndf, qdf


def test_matches_spec_oracle(spark, corpus):
    names, queries, ndf, qdf = corpus
    idx = build_name_index(ndf)
    got = {
        tuple(r)
        for r in ngram_name_search(idx, qdf, k=None).collect()
    }
    assert got == _expected(names, queries)
    assert len(got) > 0


def test_topk_cut(spark, corpus):
    names, queries, ndf, qdf = corpus
    idx = build_name_index(ndf)
    got = {tuple(r) for r in ngram_name_search(idx, qdf, k=3).collect()}
    assert got == _expected(names, queries, k=3)
    per_q = {}
    for q, r, *_ in got:
        per_q[q] = max(per_q.get(q, 0), r)
    assert all(v <= 3 for v in per_q.values())


def test_no_match_filtered(spark, corpus):
    _, _, ndf, qdf = corpus
    idx = build_name_index(ndf)
    out = ngram_name_search(idx, qdf).filter("query = 'zzzz'")
    assert out.count() == 0


def test_nfkd_fallback(spark):
    ndf = spark.createDataFrame(
        [("Café San José", "id/0"), ("cafe san jose", "id/1")],
        "key string, value string",
    )
    qdf = spark.createDataFrame([("cafe san jose",)], "query string")
    idx = build_name_index(ndf, ascii_only=False)
    got = ngram_name_search(idx, qdf, ascii_only=False).collect()
    # NFKD strips the accents: both keys normalize identically and the
    # scores tie; value tiebreak puts id/0 first
    assert [(r.rank, r.value) for r in got] == [(1, "id/0"), (2, "id/1")]
    assert got[0].score == got[1].score


def test_max_df_stop_gram_cap_two_sided(spark):
    """max_df (the 100-TB stop-gram guard) removes hot grams from BOTH
    the postings and the query gram list: a query whose discriminative
    words are all rare must rank identically with and without the cap
    even when every corpus key shares a stop word — dropping only the
    posting side would push true matches under min_match_fraction."""
    names = [(f"alpha{i:02d} beta{i:02d} incorporated", f"id/{i}") for i in range(40)]
    ndf = spark.createDataFrame(names, "key string, value string")
    qdf = spark.createDataFrame(
        [("alpha07 beta07",), ("alpha23 beta23",)], "query string"
    )
    idx = build_name_index(ndf)
    # every "incorporated" gram has df=40; rare grams have df ~1-5
    uncapped = {(r.query, r.rank, r.key) for r in ngram_name_search(idx, qdf, k=3).collect()}
    capped = {(r.query, r.rank, r.key) for r in ngram_name_search(idx, qdf, k=3, max_df=10).collect()}
    assert capped == uncapped
    assert ("alpha07 beta07", 1, "alpha07 beta07 incorporated") in capped
    # and a stop-worded QUERY still matches under the cap: its match
    # threshold is taken over the surviving (informative) grams
    q2 = spark.createDataFrame([("alpha07 beta07 incorporated",)], "query string")
    got = ngram_name_search(idx, q2, k=1, max_df=10).collect()
    assert [(r.rank, r.key) for r in got] == [(1, "alpha07 beta07 incorporated")]


def test_resolve_names_first_candidate_and_typed_value_filter(spark):
    """NameResolver semantics (NameResolver.java:44-98): only TEXT or
    NUMBER name values submit; the node's first-wins name is pinned to
    min(value); the index's first candidate per name wins by rank."""
    from import_spark.operators.link import resolve_names

    nodes = spark.createDataFrame(
        [
            ("n1", "name", "TEXT", "santa clara"),
            ("n2", "name", "UNRESOLVED_REF", "santa clara"),  # never submits
            ("n3", "name", "NUMBER", "95054"),
            ("n4", "name", "TEXT", "zz unknown"),  # no index hit
            ("n5", "name", "TEXT", "santa clara"),
            ("n5", "name", "TEXT", "alviso"),  # min(value) wins the pick
            ("n6", "other", "TEXT", "santa clara"),  # not a name prop
        ],
        "node_id string, prop string, value_type string, value string",
    )
    names = spark.createDataFrame(
        [
            ("santa clara", "geoId/0669084", 1),
            ("santa clara", "wikidataId/Q2manyx", 0),  # rank 0: first candidate
            ("95054", "zip/95054", 1),
            ("alviso", "geoId/alviso", 1),
        ],
        "name string, dcid string, rank int",
    )
    got = {(r.node_id, r.dcid) for r in resolve_names(nodes, names).collect()}
    assert got == {
        ("n1", "wikidataId/Q2manyx"),
        ("n3", "zip/95054"),
        ("n5", "geoId/alviso"),
    }
    # without a rank column: deterministic min(dcid) first-wins
    got2 = {
        (r.node_id, r.dcid)
        for r in resolve_names(nodes, names.drop("rank")).collect()
    }
    assert ("n1", "geoId/0669084") in got2
