"""Deduplication operators for large-scale text corpora.

Beyond the reference's exact statement dedup (A1/A3,
PipelineUtils.java:338-415), these are the near-dup operators a
training-data pipeline needs. All hashing is JVM-native
(``xxhash64`` — whole-stage codegen, no Python in the hot path);
only final candidate verification may touch Python.

- exact_dedup        hash-groupBy keep-min-id (A1 analogue)
- minhash_signatures shingle → k minhashes (k seeded xxhash64 mins)
- lsh_candidate_pairs band the signatures → bucket-join → pairs
- minhash_dedup      end-to-end near-dup clusters (pairs → CC → canon)
- simhash            64-bit bit-vote fingerprint, native agg
- ngram_jaccard_pairs exact n-gram Jaccard for candidate pairs
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from import_spark.operators.canonicalize import connected_components


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate removal: keep the min id per identical text.

    One shuffle on the 64-bit content hash (not the full text —
    shuffle bytes stay small; collision check on the kept row only).
    """
    h = F.xxhash64(F.col(text_col))
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(F.min(id_col).alias(id_col), F.first(text_col).alias(text_col), F.count("*").alias("n_copies"))
        .drop("_h")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Word k-shingles, distinct per doc (native split + slide window)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
    n = F.size(toks)
    # 1-based window starts; docs shorter than k yield no shingles
    starts = F.when(n >= k, F.sequence(F.lit(1), n - k + 1)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 32
) -> DataFrame:
    """k min-hashes per doc: min over seeded xxhash64 of each shingle —
    one aggregation, all JVM-side."""
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    band_size: int = 4,
) -> DataFrame:
    """Band the signature into ``num_hashes/band_size`` buckets; docs
    sharing any band bucket are candidates. Self-join happens only
    inside buckets (bounded by bucket size, the LSH point)."""
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"mh_{b * band_size + j}") for j in range(band_size)]
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    num_hashes: int = 32,
    band_size: int = 4,
) -> DataFrame:
    """Near-dup clustering: LSH pairs → connected components → (doc, canon)."""
    sh = shingles(df, text_col, id_col, k)
    sigs = minhash_signatures(sh, id_col, num_hashes)
    pairs = lsh_candidate_pairs(sigs, id_col, num_hashes, band_size)
    comp = connected_components(
        pairs.select(
            F.col("id_a").cast("string").alias("src"),
            F.col("id_b").cast("string").alias("dst"),
        )
    )
    return comp.select(
        F.col("node").cast("long").alias(id_col), F.col("canon").cast("long").alias("canon_id")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """SimHash fingerprint: per-token 64-bit hash, per-bit ±1 vote,
    sign → bit. Expressed as one explode + one aggregation with
    ``bits`` native sum expressions (no Python)."""
    toks = (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn("_h", F.xxhash64("tok"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select(F.col(id_col), sig.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for given candidate pairs (the verify step
    after LSH): |A∩B| via shingle co-join, |A∪B| = |A|+|B|-|A∩B|."""
    sh = shingles(df, text_col, id_col, k)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.withColumnRenamed(id_col, "id_a")
    b = sh.withColumnRenamed(id_col, "id_b")
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )
