"""Post-import metadata integrity + pre-import header validation for
the simple-importer Runner lifecycle.

Reference semantics:

* ``simple/stats/validation.py:25-162`` (``MetadataValidator``) — after
  an ingestion run, every provenance referenced in config.json must be
  DEFINED (a ``typeOf``-Provenance node from the MCF files or the nodes
  registry), and every defined provenance must LINK to a Source via a
  non-empty ``source`` triple. Violations raise ``ValueError`` with an
  ``error_type`` attribute (``simple/stats/data.py:473-481``).
* ``simple/stats/variable_per_row_importer.py:149-266`` and
  ``simple/stats/entities_importer.py:83-117`` (``validate_headers``) —
  before importing, the configured column mappings must name columns
  that exist, required logical columns must be mapped, 1-3 entity
  dimensions allowed, and every physical column must be either mapped
  or explicitly ignored.

Spark-first shape: the config is driver-side O(entries) state exactly
as in the reference; the triples table is the distributed side. The
whole metadata pass is ONE filtered scan of the triples
(``predicate IN ('typeOf','source')`` after namespace strip — both
prune at the source) into ONE hash aggregate keyed by subject, then
tiny anti-joins against the referenced set. Nothing is collected
unless ``strict=True`` needs the error message (bounded sample).
Header validation never scans data at all — it works on DataFrame
schemas (the pandas ``read_csv(nrows=0)`` twin).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# data.py:473-481
UNMAPPED_COLUMNS = "UNMAPPED_COLUMNS"
MISSING_REQUIRED_COLUMNS = "MISSING_REQUIRED_COLUMNS"
INVALID_CONFIGURATION = "INVALID_CONFIGURATION"
MISSING_SOURCE = "MISSING_SOURCE"
MISSING_PROVENANCE = "MISSING_PROVENANCE"
GENERIC_ERROR = "GENERIC_ERROR"

# util.py:59 — any `prefix:` counts as already-namespaced
_NAMESPACE_PREFIX_RE = re.compile(r"^[a-zA-Z0-9_\-]+:")
_NAMESPACE_PREFIX_SQL = r"^[a-zA-Z0-9_\-]+:"


class MetadataValidationError(ValueError):
    """ValueError twin carrying the reference's ``error_type`` tag."""

    def __init__(self, message: str, error_type: str):
        super().__init__(message)
        self.error_type = error_type


def _clean_dcid(val: str | None) -> str:
    """validation.py:155-161 — ensure a namespace prefix."""
    if not val:
        return ""
    if _NAMESPACE_PREFIX_RE.match(val.strip()):
        return val
    return f"dcid:{val}"


def _clean_dcid_col(c):
    return F.when(c.isNull() | (c == ""), F.lit("")).otherwise(
        F.when(c.rlike(_NAMESPACE_PREFIX_SQL), c).otherwise(F.concat(F.lit("dcid:"), c))
    )


def _is_uri_or_namespace(val) -> bool:
    """util.py:85-96."""
    if not isinstance(val, str) or not val:
        return False
    if val.startswith(("http://", "https://", "dcid:")):
        return True
    if ":" in val and " " not in val:
        return val.split(":", 1)[0].isalnum()
    return False


def referenced_provenances(config: dict) -> set[str]:
    """Referenced provenance dcids from config (validation.py:57-86).

    Accepts both inputFiles shapes the reference parses
    (config.py:96-122): the modern list-of-objects and the legacy
    name→entry dict. Raises on a missing or malformed ``provenance``
    exactly like the reference (INVALID_CONFIGURATION).
    """
    entries = config.get("inputFiles", [])
    if isinstance(entries, dict):
        entries = list(entries.values())
    referenced: set[str] = set()
    for entry in entries:
        if not isinstance(entry, dict):
            continue
        prov = entry.get("provenance")
        if not prov:
            raise MetadataValidationError(
                "Metadata Validation Failed: Every input file in config.json "
                "must have a 'provenance' property. "
                f"Found entry missing provenance: {entry}",
                INVALID_CONFIGURATION,
            )
        if not _is_uri_or_namespace(prov):
            raise MetadataValidationError(
                "Metadata Validation Failed: The 'provenance' property must be "
                "a valid DCID or URI (e.g., 'dcid:FrogCensusBureau', 'custom:WHO', "
                f"or a URL). Found invalid provenance: '{prov}'",
                INVALID_CONFIGURATION,
            )
        referenced.add(_clean_dcid(prov))
    return referenced


def provenance_flags(triples: DataFrame) -> DataFrame:
    """One pass over the triples: per subject, is it a defined
    Provenance and does it carry a non-empty source link
    (validation.py:87-120). Returns ``(node, is_provenance,
    has_source)`` — small (one row per subject that has a typeOf or
    source triple), aggregated map-side before the single exchange.
    """
    from import_spark.operators.simple_importers import col_strip_namespace

    pred = col_strip_namespace(F.col("predicate"))
    obj_id = F.coalesce(F.col("object_id"), F.lit(""))
    obj_val = F.coalesce(F.col("object_value"), F.lit(""))
    # `triple.object_id or triple.object_value` — Python falsy fallback
    source_obj = F.when(F.length(obj_id) > 0, obj_id).otherwise(obj_val)
    return (
        triples.where(pred.isin("typeOf", "source"))
        .groupBy(_clean_dcid_col(F.col("subject_id")).alias("node"))
        .agg(
            F.max(
                (pred == "typeOf") & obj_id.contains("Provenance")
            ).alias("is_provenance"),
            F.max((pred == "source") & (F.length(source_obj) > 0)).alias("has_source"),
        )
    )


def validate_metadata(
    spark: SparkSession,
    config: dict,
    triples: DataFrame,
    registry=None,
    strict: bool = False,
) -> DataFrame:
    """MetadataValidator.validate as a DataFrame plan
    (validation.py:37-55).

    Returns ``(error_type, node)`` rows, empty when the run is valid:
    ``MISSING_PROVENANCE`` for every referenced-but-undefined
    provenance and ``MISSING_SOURCE`` for every defined provenance
    with no linked source. If no provenance is referenced at all the
    result is empty without touching the triples (the reference's
    early return, validation.py:43-45). With ``strict=True`` raises
    ``MetadataValidationError`` with the reference's messages —
    provenance definitions checked before source links.

    ``registry`` is a ``plans.simple_import`` registry (the
    ``db.nodes.provenances`` analogue): its provenances count as
    defined and its ``source_id`` links count as links.
    """
    schema = "error_type string, node string"
    referenced = referenced_provenances(config)
    if not referenced:
        return spark.createDataFrame([], schema)

    flags = provenance_flags(triples)
    reg_rows = []
    if registry is not None:
        for _, (pid, sid, _url) in registry.provenances.items():
            reg_rows.append((_clean_dcid(pid), True, bool(sid)))
    if reg_rows:
        flags = flags.unionByName(
            spark.createDataFrame(reg_rows, "node string, is_provenance boolean, has_source boolean")
        ).groupBy("node").agg(
            F.max("is_provenance").alias("is_provenance"),
            F.max("has_source").alias("has_source"),
        )

    defined = flags.where(F.col("is_provenance")).select("node", "has_source")
    ref_df = spark.createDataFrame([(r,) for r in sorted(referenced)], "node string")
    missing_prov = ref_df.join(defined, "node", "left_anti").select(
        F.lit(MISSING_PROVENANCE).alias("error_type"), "node"
    )
    missing_src = defined.where(~F.col("has_source")).select(
        F.lit(MISSING_SOURCE).alias("error_type"), "node"
    )
    errors = missing_prov.unionByName(missing_src).orderBy("error_type", "node")
    if not strict:
        return errors

    # strict path: the reference raises with the offending dcids in the
    # message; keep the collect bounded like report.py's samplers.
    sample = [
        (r["error_type"], r["node"]) for r in errors.limit(10001).collect()
    ]
    missing = sorted(n for t, n in sample if t == MISSING_PROVENANCE)
    if missing:
        raise MetadataValidationError(
            "Metadata Validation Failed: The following referenced provenances "
            f"are not defined in your MCF files: {missing}. "
            "Please define them in an MCF file (e.g., Node: dcid:YourProvenance).",
            MISSING_PROVENANCE,
        )
    missing_sources = sorted(n for t, n in sample if t == MISSING_SOURCE)
    if missing_sources:
        details = [
            f"  - Provenance '{p}' has no linked Source (source property is missing or empty)"
            for p in missing_sources
        ]
        raise MetadataValidationError(
            "Metadata Validation Failed: Linked sources are missing for "
            "defined provenances:\n"
            + "\n".join(details)
            + "\nPlease specify a source property on these Provenance nodes.",
            MISSING_SOURCE,
        )
    return errors


# ---------------------------------------------------------------------------
# header validation (pre-import, schema-only)
# ---------------------------------------------------------------------------


def _error(file: str, error_type: str, message: str, problem_columns=None) -> dict:
    """FileValidationError.to_dict (data.py:484-496)."""
    return {
        "file": file,
        "errorType": error_type,
        "problemColumns": sorted(problem_columns or []),
        "errorMessage": message,
    }


def validate_vpr_headers(
    file: str,
    actual_columns: list[str],
    column_mappings: dict | None,
    ignore_columns: list[str] | None = None,
) -> list[dict]:
    """variable_per_row_importer.py:149-266: required logical columns
    mapped, 1-3 entity dimensions, mapped columns present, no unmapped
    columns. Works on column NAMES (DataFrame schema), never data.
    """
    from import_spark.operators.simple_importers import STANDARD_PROPERTY_MAPPING

    mappings = dict(
        column_mappings
        or {
            "dcid:observationAbout": "entity",
            "dcid:variableMeasured": "variable",
            "dcid:observationDate": "date",
            "dcid:value": "value",
        }
    )
    logical: dict[str, str] = {}
    custom: list[str] = []
    for key, phys in mappings.items():
        if key in STANDARD_PROPERTY_MAPPING:
            logical[STANDARD_PROPERTY_MAPPING[key]] = phys
        else:
            custom.append(key)
            logical[key] = phys

    errors: list[dict] = []
    for req in ("variable", "date", "value"):
        if req not in logical:
            official = next(
                k for k, v in STANDARD_PROPERTY_MAPPING.items() if v == req
            )
            errors.append(
                _error(
                    file,
                    MISSING_REQUIRED_COLUMNS,
                    f"Missing required column mapping for: '{official}'",
                    [official],
                )
            )
    if len(custom) < 1:
        errors.append(
            _error(
                file,
                INVALID_CONFIGURATION,
                "Invalid configuration: An observation must have at least one "
                "entity dimension. Please map 'dcid:observationAbout' or map at "
                "least one custom dimension in 'columnMappings'.",
            )
        )
    if len(custom) > 3:
        errors.append(
            _error(
                file,
                INVALID_CONFIGURATION,
                f"Invalid configuration: Too many entity dimensions mapped "
                f"({len(custom)}). A maximum of 3 entity dimensions (including "
                "'dcid:observationAbout') is allowed.",
            )
        )
    if errors:
        return errors

    actual = set(actual_columns)
    expected = set(logical.values())
    missing = expected - actual
    if missing:
        errors.append(
            _error(
                file,
                MISSING_REQUIRED_COLUMNS,
                f"The following expected columns were not found in the CSV: "
                f"{sorted(missing)}. Please check your 'columnMappings' and the "
                "CSV header.",
                missing,
            )
        )
    allowed = expected | set(ignore_columns or [])
    unmapped = actual - allowed
    if unmapped:
        errors.append(
            _error(
                file,
                UNMAPPED_COLUMNS,
                f"The CSV file '{file}' contains unmapped columns: "
                f"{sorted(unmapped)}. Please map them in 'columnMappings' or "
                "list them in 'ignoreColumns' in config.json.",
                unmapped,
            )
        )
    return errors


def validate_entity_headers(
    file: str,
    actual_columns: list[str],
    column_mappings: dict | None,
    ignore_columns: list[str] | None = None,
    id_column: str | None = None,
) -> list[dict]:
    """entities_importer.py:83-117: with explicit mappings, every
    physical column must be mapped, ignored, or the id column."""
    if not column_mappings:
        return []
    allowed = set(column_mappings.values()) | set(ignore_columns or [])
    if id_column:
        allowed.add(id_column)
    unmapped = set(actual_columns) - allowed
    if unmapped:
        return [
            _error(
                file,
                UNMAPPED_COLUMNS,
                f"The CSV file '{file}' contains unmapped columns: "
                f"{sorted(unmapped)}. Please map them in 'columnMappings' or "
                "list them in 'ignoreColumns' in config.json.",
                unmapped,
            )
        ]
    return []


def validate_headers(config: dict, inputs: dict[str, DataFrame]) -> list[dict]:
    """Runner._validate_all_headers analogue (runner.py:953-999): run
    the per-importer header check for every input, collecting
    FileValidationError dicts. Uses DataFrame schemas — no data pass,
    no thread pool needed (nothing here scales with rows)."""
    from import_spark.plans.simple_import import _file_config

    errors: list[dict] = []
    for name, df in inputs.items():
        cfg = _file_config(config, name)
        mappings = cfg.get("columnMappings") or {}
        ignore = list(cfg.get("ignoreColumns") or [])
        if name.lower().endswith(".mcf"):
            continue
        if "rowEntityType" in cfg or "eventType" in cfg:
            errors.extend(
                validate_entity_headers(
                    name, df.columns, mappings, ignore, cfg.get("idColumn")
                )
            )
        elif cfg.get("format") == "variablePerRow":
            errors.extend(
                validate_vpr_headers(name, df.columns, mappings or None, ignore)
            )
    return errors
