"""Shared sampled-width BYTE gate for driver-collect and broadcast
fast paths.

Row-count gates alone mislead: 5M rows of 20-byte locals is 100 MB
(fine to collect/broadcast), 5M rows of 10 KB literals is 50 GB (OOM).
The reference's analogues are capacity-bounded caches
(ExternalIdResolver's in-memory maps, LogWrapper's capped samples), so
every fast path here gates on estimated BYTES = sampled average row
width x row count, alongside the existing row cap.

The width sample reads a bounded ``limit()`` head — one tiny job. The
head is not a uniform sample, but width skew across a table's scan
order is far smaller than the 100x-1000x row-width spread the gate
exists to catch, and over-estimating safety margins belong in the
budget constant, not the sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# fixed per-cell overhead (object headers, offsets) added per column
_CELL_OVERHEAD = 8

# budgets for the two fast-path classes (conservative against a
# multi-GB driver / 64 MB-default broadcast world; both overridable
# per call)
DRIVER_COLLECT_BUDGET_BYTES = 512 * 1024 * 1024
BROADCAST_BUDGET_BYTES = 256 * 1024 * 1024


def _width_expr(field: T.StructField):
    dt = field.dataType
    c = F.col(field.name)
    if isinstance(dt, T.StringType):
        w = F.length(c)
    elif isinstance(dt, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
        # serialize-to-string length is a serviceable proxy for nested
        w = F.length(c.cast("string"))
    elif isinstance(dt, (T.LongType, T.DoubleType, T.TimestampType)):
        w = F.lit(8)
    else:
        w = F.lit(4)
    return F.coalesce(w, F.lit(0)) + F.lit(_CELL_OVERHEAD)


def estimate_row_bytes(df: DataFrame, sample_rows: int = 2000) -> float:
    """Average row width in bytes from a bounded head sample.

    Returns 0.0 for an empty frame."""
    total = None
    for f in df.schema.fields:
        e = _width_expr(f)
        total = e if total is None else total + e
    row = (
        df.limit(sample_rows)
        .select(total.alias("w"))
        .agg(F.avg("w").alias("avg_w"))
        .collect()[0]
    )
    return float(row["avg_w"] or 0.0)


def fits_bytes(
    df: DataFrame,
    n_rows: int,
    budget_bytes: int,
    sample_rows: int = 2000,
) -> bool:
    """True when ``n_rows`` rows of ``df``'s sampled width fit the
    byte budget."""
    if n_rows <= 0:
        return True
    if n_rows > budget_bytes:  # >1 byte/row minimum: cheap early out
        return False
    return n_rows * estimate_row_bytes(df, sample_rows) <= budget_bytes
