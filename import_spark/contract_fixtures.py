"""Driver-contract fixtures for the kg_pipeline DuckDB oracle.

The flagship KG query runs on a deterministic synthetic transcript
table (sources/transcripts.py). To let the driver's DuckDB oracle
check it hash-for-hash, this module materializes — with pure
pandas/pyarrow, no SparkSession — the exact same table plus two
farmhash lookup tables (DuckDB has no farmhash; pre-joining the ids
from a lookup computed by the Guava-bit-parity-gated Python twin is
the repo's standing farmhash exemption — ``ensure_c1_fixture`` below
applies the same one to c1_farmhash_ids; VERDICT r3 next-step 4):

- ``transcripts.parquet``  — the 100-conversation input table, byte-
  identical to ``generate_transcripts(spark, 100)`` (content is a pure
  function of the conversation id).
- ``farmhash_nodes.parquet`` — (conv_id, turn_idx) → the dc/t/ turn
  node and dc/c/ conversation node ids.
- ``obs_ids.parquet``      — distinct observation key tuples → the
  dc/o/ StatVarObservation dcid (DcidGenerator.java:178-211 keys).

Everything else — statement extraction, entity linking, local-ref
fixpoint resolution with divergence/cycle quarantine, sameAs connected
components, canonical rewrite, dedup — the DuckDB SQL twin
(queries.SQL_KG_PIPELINE) computes independently.
"""

from __future__ import annotations

import os
import re
import tempfile

import pandas as pd

KG_ORACLE_CONVS = 100
_VERSION = "v2"  # v2: dc/t|dc/c node ids switched to native xxhash64-hex

_OBSERVE = re.compile(r"observe (\S+) (\S+) (\S+) = (\S+)(?: unit (\S+))?")


def fixtures_dir() -> str:
    return os.path.join(
        tempfile.gettempdir(), f"import_spark_kg_oracle_{_VERSION}_{KG_ORACLE_CONVS}"
    )


def ensure_kg_fixtures() -> str:
    """Materialize the fixture parquet files if missing; returns the dir."""
    base = fixtures_dir()
    marker = os.path.join(base, "_SUCCESS")
    if os.path.exists(marker):
        return base
    os.makedirs(base, exist_ok=True)

    from import_spark.functions.dcids import svobs_dcid
    from import_spark.functions.values import clean_numeric_string
    from import_spark.functions.xxhash import hex_id
    from import_spark.sources.transcripts import _gen_batch

    tr = pd.concat(
        list(_gen_batch(iter([pd.DataFrame({"id": range(KG_ORACLE_CONVS)})]), 9)),
        ignore_index=True,
    )
    tr.to_parquet(os.path.join(base, "transcripts.parquet"), index=False)

    nodes = tr[["conv_id", "turn_idx"]].copy()
    nodes["turn_node"] = [
        "dc/t/" + hex_id(f"conv_id={c}turn_idx={t}")
        for c, t in zip(tr["conv_id"], tr["turn_idx"])
    ]
    conv_node = {c: "dc/c/" + hex_id(f"conv_id={c}") for c in tr["conv_id"].unique()}
    nodes["conv_node"] = tr["conv_id"].map(conv_node)
    nodes.to_parquet(os.path.join(base, "farmhash_nodes.parquet"), index=False)

    keys = set()
    for text in tr["text"]:
        for place, var, date, val, unit in _OBSERVE.findall(text):
            keys.add((place, var, date, clean_numeric_string(val), unit))
    rows = []
    for place, var, date, val, unit in sorted(keys):
        pvs = {
            "observationAbout": place,
            "variableMeasured": var,
            "observationDate": date,
            "value": val,
        }
        if unit:
            pvs["unit"] = unit
        rows.append((place, var, date, val, unit, svobs_dcid(pvs)))
    pd.DataFrame(
        rows, columns=["place", "var", "date", "val", "unit", "obs_node"]
    ).to_parquet(os.path.join(base, "obs_ids.parquet"), index=False)

    with open(marker, "w") as f:
        f.write("ok")
    return base


def ensure_c1_fixture(sf_dir: str | None = None) -> str:
    """doc_id → farmhash content-dcid lookup for the c1 oracle.

    Same exemption as the kg fixtures above: DuckDB has no farmhash, so
    the expected ids are pre-computed by the pure-Python fingerprint64
    twin (functions/farmhash.py) — itself bit-parity-gated against the
    JVM Guava ``farmHashFingerprint64`` in tests/test_farmhash.py, so
    the lookup carries an independent implementation's vouching even
    though the query's pandas UDF shares the Python port. Returns the
    parquet path; keyed by doc_id over the driver's sf0.01 view.
    """
    from import_spark.functions.farmhash import long_id

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    src = os.path.join(sf_dir, "documents.parquet")
    tag = re.sub(r"[^A-Za-z0-9.]+", "_", os.path.abspath(sf_dir).strip("/"))
    path = os.path.join(tempfile.gettempdir(), f"import_spark_c1_ids_{tag}.parquet")
    if os.path.exists(path):
        return path
    docs = pd.read_parquet(src, columns=["doc_id", "text"])
    docs["dcid"] = ["dc/" + long_id(t) for t in docs["text"]]
    tmp = path + ".tmp"
    docs[["doc_id", "dcid"]].to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path
