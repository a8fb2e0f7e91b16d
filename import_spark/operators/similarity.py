"""Similarity search over embedding columns (array<float>).

- cosine_topk_bruteforce — exact top-k: broadcast the (small) query
  set, dot products via native ``zip_with``/``aggregate`` (JVM,
  codegen), rank with a window. The correctness baseline.
- lsh_ann_topk — random-hyperplane LSH: signatures via one vectorized
  pandas UDF (numpy matmul over Arrow batches), candidates bucket-join
  only, exact rerank inside buckets. The scale path: the corpus is
  never self-joined.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries is small → broadcast; the
    corpus is scanned once, no shuffle except the final per-query top-k."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("_qv"), _norm(F.col(vec_col)).alias("_qn")
        )
    )
    c = corpus.select(
        F.col(id_col), F.col(vec_col).alias("_cv"), _norm(F.col(vec_col)).alias("_cn")
    )
    scored = c.crossJoin(q).select(
        query_id_col,
        id_col,
        F.round(
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float32)


def lsh_signatures(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Random-hyperplane signature as one int bucket id per row.

    One vectorized pandas UDF: each Arrow batch is stacked into a
    (batch, dim) matrix and multiplied against the fixed (dim, planes)
    hyperplane matrix — BLAS, not per-row Python.
    """
    planes = _hyperplanes(dim, n_planes, seed)

    from pyspark.sql.pandas.functions import pandas_udf

    def _sig_fn(v: pd.Series) -> pd.Series:
        m = np.stack(v.values).astype(np.float32)
        bits = (m @ planes) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(bits @ weights)

    sig_udf = pandas_udf(_sig_fn, "long")
    return df.select(F.col(id_col), F.col(vec_col), sig_udf(F.col(vec_col)).alias("bucket"))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: join query/corpus on the LSH bucket, exact
    cosine rerank within buckets. Recall trades off with n_planes."""
    c = lsh_signatures(corpus, dim, n_planes, id_col, vec_col, seed)
    q = lsh_signatures(queries, dim, n_planes, query_id_col, vec_col, seed).select(
        query_id_col, F.col(vec_col).alias("_qv"), "bucket"
    )
    cand = c.join(F.broadcast(q), "bucket")
    scored = cand.select(
        query_id_col,
        id_col,
        F.round(
            _dot(F.col("_qv"), F.col(vec_col))
            / (_norm(F.col("_qv")) * _norm(F.col(vec_col))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
