"""TFRecord source/sink (S4/S8): length-framed record files.

The reference stores optimized-graph protos as GZIP TFRecords
(PipelineUtils.java:121-141; Processor.java:373-392). There is no
spark-tensorflow-connector in this environment, so the TFRecord
**framing** (public format: [len:uint64le][masked crc32c(len):uint32le]
[payload][masked crc32c(payload):uint32le]) is implemented directly:

- read: ``spark.read.format("binaryFile")`` (one task per file; files
  are the parallelism unit exactly like the reference's Beam source)
  + a vectorized record-splitter → one row per record payload.
- write: one TFRecord file per partition via ``mapInPandas`` framing +
  binary part-files.

CRC-32C (Castagnoli) is table-driven pure Python — applied per record
frame (small), optional verification on read.
"""

from __future__ import annotations

import gzip
import io
import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---- CRC-32C (Castagnoli), table-driven (public polynomial 0x1EDC6F41) ----
_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE:
        return _CRC_TABLE
    poly = 0x82F63B78  # reflected 0x1EDC6F41
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        tbl.append(c)
    _CRC_TABLE = tbl
    return tbl


def crc32c(data: bytes) -> int:
    tbl = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    """TFRecord's rotated+masked crc (public spec)."""
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def split_tfrecords(blob: bytes, verify: bool = False) -> list[bytes]:
    """One file's bytes → list of record payloads."""
    if blob[:2] == b"\x1f\x8b":  # gzip member
        blob = gzip.decompress(blob)
    out = []
    pos, n = 0, len(blob)
    while pos + 12 <= n:
        (length,) = struct.unpack_from("<Q", blob, pos)
        if verify:
            (lcrc,) = struct.unpack_from("<I", blob, pos + 8)
            if masked_crc32c(blob[pos : pos + 8]) != lcrc:
                raise ValueError(f"bad length crc at offset {pos}")
        start = pos + 12
        payload = blob[start : start + length]
        if verify:
            (dcrc,) = struct.unpack_from("<I", blob, start + length)
            if masked_crc32c(payload) != dcrc:
                raise ValueError(f"bad data crc at offset {pos}")
        out.append(payload)
        pos = start + length + 4
    return out


def frame_tfrecord(payload: bytes) -> bytes:
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", masked_crc32c(header))
        + payload
        + struct.pack("<I", masked_crc32c(payload))
    )


TFREC_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType(), False),
        T.StructField("record_idx", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def read_tfrecords(spark: SparkSession, path: str, verify: bool = False) -> DataFrame:
    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(split_tfrecords(bytes(blob), verify)):
                    rows.append((p, i, bytearray(rec)))
            yield pd.DataFrame(rows, columns=["src_file", "record_idx", "payload"])

    return raw.mapInPandas(gen, schema=TFREC_SCHEMA)


def write_tfrecords(df: DataFrame, path: str, payload_col: str = "payload", compress: bool = True) -> None:
    """One .tfrecord(.gz) file per partition under ``path``."""
    import os

    os.makedirs(path, exist_ok=True)

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf = io.BytesIO()
        n = 0
        for pdf in batches:
            for payload in pdf[payload_col]:
                buf.write(frame_tfrecord(bytes(payload)))
                n += 1
        data = buf.getvalue()
        suffix = ".tfrecord.gz" if compress else ".tfrecord"
        if compress:
            data = gzip.compress(data, compresslevel=5)
        with open(os.path.join(path, f"part-{pid:05d}{suffix}"), "wb") as f:
            f.write(data)
        yield pd.DataFrame({"n": [n]})

    df.select(payload_col).mapInPandas(write_part, schema="n long").agg(F.sum("n")).collect()
