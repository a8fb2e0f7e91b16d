"""Ngram name-search scale probe: posting-list build + lookup latency
at corpus sizes far beyond the driver-side reference matcher
(simple/util/ngram_matcher.py holds every posting in one dict).

Input shape (synthesized natively): N names of 3-5 words drawn from a
~2k-word vocabulary — word reuse makes the posting distribution
realistically skewed (stop-gram 4-grams like "eria"/"tion" appear in a
large fraction of keys). The probe measures the two scale risks called
out in operators/name_search.py:

  index  — build_name_index's df-count + posting join, shuffled on the
           ngram key (hot grams = skewed partitions; AQE's skew split
           applies because the skew is BYTES-shaped here)
  lookup — a 100-query batch: broadcast query grams, candidate
           aggregate sized by sum(df) over query grams; with and
           without the max_df stop-gram cap

Reported per variant: wall time, posting count, max ngram df, and the
candidate-row count the lookup aggregate had to shuffle. Result-set
agreement between capped and uncapped lookups is reported (not
asserted: dropping a hot gram lowers a candidate's match count, which
is exactly the documented semantic trade of max_df).

Usage: python tools/ngram_probe.py [n_names] [cores] [max_df] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


VOCAB_SIZE = 2_000
QUERY_BATCH = 100


def build_names(spark, n_names: int):
    """3-4 word names over a deterministic hex-word vocabulary (diverse
    grams, like real entity names), plus the word "inc" on a third of
    them — ONE controlled stop-gram whose posting list is O(corpus),
    the pattern ("Inc", "County", "of") that blows up an uncapped
    posting join on real name corpora."""
    w = lambda seed: F.format_string(  # noqa: E731
        "%06x",
        F.pmod(
            F.xxhash64(F.pmod(F.xxhash64(F.col("id") + F.lit(seed)), F.lit(VOCAB_SIZE))),
            F.lit(16_777_216),
        ),
    )
    return (
        spark.range(n_names)
        .select(
            F.concat_ws(
                " ",
                w(1),
                w(2),
                w(3),
                F.when(F.col("id") % 2 == 0, w(4)),
                F.when(F.col("id") % 3 == 0, F.lit("inc")),
            ).alias("key"),
            F.col("id").cast("string").alias("value"),
        )
        .repartition(64)
        .localCheckpoint()
    )


def main() -> None:
    n_names = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    max_df = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from import_spark.operators.name_search import build_name_index, ngram_name_search
    from import_spark.session import get_spark

    spark = get_spark("ngram-probe", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    names = build_names(spark, n_names)
    n = names.count()
    keep_ids = set(dict(spark.sparkContext._jsc.getPersistentRDDs()).keys())
    # query words from the same vocabulary mapping; half the batch
    # carries the stop word (the "Acme Corp inc" lookup shape)
    vocab = [
        r["w"]
        for r in spark.range(VOCAB_SIZE)
        .select(
            F.format_string(
                "%06x", F.pmod(F.xxhash64("id"), F.lit(16_777_216))
            ).alias("w")
        )
        .collect()
    ]
    queries = spark.createDataFrame(
        [
            (
                f"{vocab[i * 37 % VOCAB_SIZE]} {vocab[i * 61 % VOCAB_SIZE]}"
                + (" inc" if i % 2 else ""),
            )
            for i in range(QUERY_BATCH)
        ],
        "query string",
    )

    out: dict = {"n_names": n, "cores": cores, "max_df": max_df}
    best: dict[str, float] = {}
    for t in range(trials):
        # index build (timed to a materialized posting table, as a real
        # deployment would persist it once and serve many lookups)
        t0 = time.time()
        idx = build_name_index(names).localCheckpoint()
        n_post = idx.count()
        dt = time.time() - t0
        best["index_build"] = min(best.get("index_build", dt), dt)
        if t == 0:
            stats = idx.agg(
                F.max("df").alias("max_df"),
                F.countDistinct("ngram").alias("n_ngrams"),
            ).collect()[0]
            out["n_postings"] = n_post
            out["max_ngram_df"] = stats["max_df"]
            out["n_distinct_ngrams"] = stats["n_ngrams"]

        for label, cap in [("lookup_uncapped", None), ("lookup_capped", max_df)]:
            t0 = time.time()
            res = ngram_name_search(
                idx, queries, k=10, min_match_fraction=0.5, max_df=cap
            )
            rows = res.count()
            dt = time.time() - t0
            best[label] = min(best.get(label, dt), dt)
            if t == 0:
                from import_spark.operators.name_search import (
                    _gram_list,
                    normalized_name,
                )

                out[f"{label}_rows"] = rows
                src = idx if cap is None else idx.filter(F.col("df") <= cap)
                qg_all = (
                    queries.select(normalized_name(F.col("query")).alias("_qnorm"))
                    .select(F.explode(F.array_distinct(_gram_list("_qnorm", 4))).alias("ngram"))
                    .distinct()
                )
                out[f"{label}_candidates"] = src.join(
                    F.broadcast(qg_all), "ngram"
                ).count()
        # release this trial's index blocks; the names checkpoint stays
        for rid, rdd in dict(spark.sparkContext._jsc.getPersistentRDDs()).items():
            if rid not in keep_ids:
                rdd.unpersist()

    # capped-vs-uncapped top-1 agreement on the query batch
    idx = build_name_index(names).localCheckpoint()
    top = lambda cap: {  # noqa: E731
        r["query"]: r["key"]
        for r in ngram_name_search(
            idx, queries, k=1, min_match_fraction=0.5, max_df=cap
        ).collect()
    }
    t_unc, t_cap = top(None), top(max_df)

    def agree(pred):
        qs = [q for q in t_unc if pred(q)]
        return round(
            sum(1 for q in qs if t_cap.get(q) == t_unc[q]) / max(1, len(qs)), 3
        )

    out["top1_agreement"] = agree(lambda q: True)
    out["top1_agreement_plain"] = agree(lambda q: "inc" not in q)
    out["top1_agreement_stopworded"] = agree(lambda q: "inc" in q)
    out.update({k: round(v, 2) for k, v in best.items()})
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
