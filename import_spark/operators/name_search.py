"""Ngram name search: fuzzy key→value lookup over a name index.

Re-expresses the reference's NgramMatcher
(simple/util/ngram_matcher.py:44-197) as a distributed posting-list
design instead of an in-memory dict:

- ``build_name_index`` tokenizes every (key, value) name into its
  ngram set — the words of the normalized key plus all character
  ``ngram_size``-grams (ngram_matcher.py:153-162) — and emits one
  posting row per (ngram, key) with the ngram's first-occurrence
  position (ngram_matcher.py:164-175) and the ngram's document
  frequency (how many keys contain it; the IDF denominator,
  ngram_matcher.py:105-108).
- ``ngram_name_search`` explodes a batch of query strings the same
  way (keeping duplicate-word multiplicity, as the reference's lookup
  loop does), joins the query grams against the postings, and scores
  each (query, key) candidate exactly as _get_ngram_match_score
  (ngram_matcher.py:190-197): sum of per-ngram IDF + a 10000x boost
  for matches near the start of the query + 100x the raw match count;
  candidates below ``min_match_fraction`` of the query's ngram count
  are dropped (ngram_matcher.py:126-133).

Normalization (ngram_matcher.py:177-188) is NFKD → lower → collapse
spaces → strip non-alphanumerics. The reference's operator order is
not idempotent (stripping punctuation after collapsing can leave a
double space that a second normalize would collapse, and its
two-layer normalize does exactly that); here the fixpoint is used —
lower → strip → collapse → trim — so positions are measured on the
fully-normalized key. Results differ from the reference only for keys
with space-adjacent punctuation. NFKD itself is a no-op for ASCII
keys and is applied via a vectorized fallback only when non-ASCII is
present (the only non-native step, and only when needed).

Scale shape: the index is a (ngram)-keyed posting table — the classic
IR layout; queries are exploded to a tiny gram table and BROADCAST
against it, so the corpus-sized side never shuffles for a lookup
batch. The per-(query, key) aggregate is the one shuffle, sized by
candidate postings, not the corpus. Stop-gram skew (very common
ngrams with huge posting lists) can be capped with ``max_df`` — their
IDF contribution is negligible by construction, but dropping them
changes the match-count filter, so it is off by default.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_NGRAM_SIZE = 4
DEFAULT_MIN_MATCH_FRACTION = 0.8


def normalized_name(col, ascii_only: bool = True):
    """Normalization fixpoint: lower → strip non-[a-z0-9 ] → collapse
    runs of spaces → trim (ngram_matcher.py:177-188 made idempotent).

    ``ascii_only=False`` additionally NFKD-decomposes via a pandas UDF
    before the native chain (needed only for non-ASCII keys)."""
    if not ascii_only:
        col = _nfkd(col)
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", ""), r" +", " "
        )
    )


def _nfkd(col):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfkd(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFKD", x) if x else x)

    return nfkd(col)


def _chargrams(norm_col: str, n: int):
    """All character n-grams of the normalized key, in order — one gram
    per start position 0..max(len-n, 0) (ngram_matcher.py:156-162; a
    key shorter than n yields itself)."""
    return F.expr(
        f"transform(sequence(0, greatest(length({norm_col}) - {n}, 0)), "
        f"i -> substring({norm_col}, i + 1, {n}))"
    )


def _gram_list(norm_col: str, n: int):
    """The reference's _get_ngrams list: the words of the key (in
    order, duplicates kept) followed by the distinct char grams not
    already present as a word (ngram_matcher.py:153-162). Built on
    ``_chargrams`` so the gram expression lives in one place."""
    grams = _chargrams(norm_col, n)
    return F.concat(
        F.expr(f"split({norm_col}, ' ')"),
        F.filter(
            F.array_distinct(grams),
            lambda g: ~F.array_contains(F.expr(f"split({norm_col}, ' ')"), g),
        ),
    )


def build_name_index(
    names: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    ngram_size: int = DEFAULT_NGRAM_SIZE,
    ascii_only: bool = True,
) -> DataFrame:
    """Posting table for a name corpus: one row per (ngram, key) with
    columns (ngram, key, value, pos, df).

    ``pos`` is the ngram's first occurrence in the normalized key
    (substring find — a word occurring inside another word counts,
    matching normalized_key.find in ngram_matcher.py:173).  ``df`` is
    the number of keys whose ngram set contains the ngram."""
    norm = normalized_name(F.col(key_col), ascii_only=ascii_only)
    base = names.select(
        F.col(key_col).alias("key"),
        F.col(value_col).cast("string").alias("value"),
        norm.alias("_norm"),
    )
    grams = F.array_distinct(_gram_list("_norm", ngram_size))
    postings = (
        base.select("key", "value", "_norm", F.explode(grams).alias("ngram"))
        .withColumn("pos", F.expr("instr(_norm, ngram) - 1"))
        .drop("_norm")
    )
    dfs = postings.groupBy("ngram").agg(F.count(F.lit(1)).alias("df"))
    return postings.join(dfs, "ngram")


def ngram_name_search(
    postings: DataFrame,
    queries: DataFrame,
    query_col: str = "query",
    k: int | None = 10,
    ngram_size: int = DEFAULT_NGRAM_SIZE,
    min_match_fraction: float = DEFAULT_MIN_MATCH_FRACTION,
    ascii_only: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """Ranked (query, key, value) matches of each query string against
    a ``build_name_index`` posting table.

    Scoring follows NgramMatcher.lookup + _get_ngram_match_score
    (ngram_matcher.py:88-151,190-197): per matched ngram the IDF
    (1/df) accumulates — duplicate query words accumulate twice, as
    the reference's per-ngram loop does — then the candidate must
    match at least max(1, n_query_ngrams * min_match_fraction) grams,
    and the final score adds (query_len - min_pos) * 10000 +
    matches * 100.  Ties (identical scores) rank by value then key —
    the reference's insertion-order tiebreak is not reproducible in a
    distributed engine.

    Output: (query, rank, key, value, matches, score) with score
    rounded to 4 decimals (the IDF sum is order-sensitive in floating
    point; the boost terms dominate ranking by construction)."""
    qnorm = normalized_name(F.col(query_col), ascii_only=ascii_only)
    q = queries.select(F.col(query_col).alias("query"), qnorm.alias("_qnorm"))
    qlist = _gram_list("_qnorm", ngram_size)
    qg = (
        q.select(
            "query",
            F.length("_qnorm").alias("qlen"),
            F.size(qlist).alias("n_q"),
            F.explode(qlist).alias("ngram"),
        )
        .groupBy("query", "qlen", "n_q", "ngram")
        .agg(F.count(F.lit(1)).alias("mult"))
    )
    src = postings
    if max_df is not None:
        # stop-gram mode: grams whose posting list exceeds max_df are
        # removed from BOTH sides — the postings (bounding the
        # candidate join) and the query gram list (so the
        # min_match_fraction threshold is taken over the informative
        # grams only. Dropping only the posting side silently pushed
        # legitimate matches under the threshold — one-sided capping
        # measured 0.55 top-1 agreement vs uncapped even on queries
        # with NO hot gram; two-sided measures 1.0 on those, with the
        # divergence confined to queries whose ranking genuinely
        # depends on a dropped gram (tools/ngram_probe.py))
        hot = postings.filter(F.col("df") > max_df).select("ngram").distinct()
        src = postings.filter(F.col("df") <= max_df)
        qg = qg.join(F.broadcast(hot), "ngram", "left_anti")
        qg = qg.withColumn(
            "n_q", F.sum("mult").over(Window.partitionBy("query"))
        )
    cand = src.join(F.broadcast(qg), "ngram").groupBy(
        "query", "qlen", "n_q", "key", "value"
    ).agg(
        F.sum(F.col("mult") / F.col("df")).alias("_idf"),
        F.sum("mult").alias("matches"),
        F.min("pos").alias("_pos"),
    )
    scored = cand.filter(
        F.col("matches")
        >= F.greatest(F.lit(1.0), F.col("n_q") * F.lit(float(min_match_fraction)))
    ).withColumn(
        "score",
        F.round(
            F.col("_idf")
            + (F.col("qlen") - F.col("_pos")) * F.lit(10000.0)
            + F.col("matches") * F.lit(100.0),
            4,
        ),
    )
    w = Window.partitionBy("query").orderBy(
        F.col("score").desc(), F.col("value").asc(), F.col("key").asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if k is not None:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select("query", "rank", "key", "value", "matches", "score")
