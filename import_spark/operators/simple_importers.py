"""Simple-importer surfaces (SURVEY §3.3): variable-per-row
observations, row-entity imports and event imports, re-expressed as
DataFrame transforms.

Reference semantics:
- simple/stats/variable_per_row_importer.py:104-338 (SVObs import —
  standard property mapping, per-row defaults, custom entity
  dimensions serialized to a ``properties`` JSON, invalid-value
  filter, namespace strip);
- simple/stats/entities_importer.py:42-200 (row entities → typed
  triples; entity-ref columns and namespace-prefixed values become
  object ids, comma lists fan out);
- simple/stats/events_importer.py:42-343 (event triples + count
  aggregation per entity/time-period into observations);
- simple/stats/nodes.py:292-332 (id synthesis for variables,
  properties, event/entity types: keep DCID-shaped names, map
  space/dash to underscore, else a generated ``c/...`` id).

Spark shape: every per-row step is a native column expression
(struct arrays + one explode; no Python in the row path). Ids are
synthesized driver-side from COLUMN NAMES only (a handful of
strings). The one Python touch is the events importer's
date→period parse — a vectorized Arrow batch (pd.to_datetime), the
Spark twin of the reference's per-row dateutil.parse, and it runs
only on the (entity, date) projection of the events input.

NA policy: the reference gets its NA set from pandas ``read_csv
(na_values=STANDARD_NA_VALUES)`` (exact-match tokens plus pandas'
own defaults, an artifact of the CSV reader). Here any cell whose
lower-trimmed value is in STANDARD_NA_VALUES (or "" / "<NA>") is
treated as missing — same policy as import_wide_observations.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from import_spark.operators.observations import STANDARD_NA_VALUES

# variable_per_row_importer.py:47-58 — official config keys for the
# standard observation columns. dcid:observationAbout is NOT standard:
# it is an entity *dimension* and lands in the properties JSON
# (variable_per_row_importer.py:204-227 and the importer's goldens).
STANDARD_PROPERTY_MAPPING = {
    "dcid:variableMeasured": "variable",
    "dcid:observationDate": "date",
    "dcid:value": "value",
    "dcid:unit": "unit",
    "dcid:measurementMethod": "measurement_method",
    "dcid:observationPeriod": "observation_period",
    "dcid:scalingFactor": "scaling_factor",
}

# constants.py:98-109
OBSERVATION_COLUMNS = [
    "entity",
    "variable",
    "date",
    "value",
    "provenance",
    "unit",
    "scaling_factor",
    "measurement_method",
    "observation_period",
    "properties",
]

_OBS_PROPERTY_COLUMNS = ["unit", "scaling_factor", "measurement_method", "observation_period"]

# nodes.py:44
_DCID_PATTERN = re.compile(r"^(?:[A-Za-z0-9_/]+:)?[A-Za-z0-9_/]+$")
# stats/util.py:59
_NAMESPACE_PREFIX_RE = r"^[a-zA-Z0-9_\-]+:"


def synth_id(name: str, prefix: str, counter: list[int]) -> str:
    """nodes.py:292-314 id synthesis: DCID-shaped names pass through,
    space/dash map to underscore, anything else gets ``prefix<N>``
    (counter is a 1-slot list so callers share the running count)."""
    if _DCID_PATTERN.fullmatch(name):
        return name
    cleaned = re.sub(r"[ -]", "_", name)
    if _DCID_PATTERN.fullmatch(cleaned):
        return cleaned
    counter[0] += 1
    return f"{prefix}{counter[0]}"


def strip_namespace(v: str) -> str:
    """data.py:589-594 — everything up to the first ':' (if any)."""
    return v[v.find(":") + 1 :]


def col_strip_namespace(c):
    """Column twin of strip_namespace: drop through the FIRST ':'."""
    pos = F.instr(c, ":")
    return F.when(pos > 0, c.substr(pos + 1, F.length(c))).otherwise(c)


def _na_to_null(c):
    """Missing-cell policy (see module docstring)."""
    s = c.cast("string")
    return F.when(
        s.isNull() | (s == "") | (s == "<NA>") | F.lower(F.trim(s)).isin(*STANDARD_NA_VALUES),
        F.lit(None).cast("string"),
    ).otherwise(s)


def _json_escape(c):
    """JSON string-value escaping for the properties column, matching
    json.dumps (the reference's encoder): backslash, quote, the five
    short-form control escapes, and \\u00XX for the remaining control
    characters — a raw newline/tab in a custom-dimension cell must not
    produce invalid JSON. One folded JVM expression chain, no UDF."""
    # replacement strings are Java Matcher syntax: r'\"' would unescape
    # to a bare quote — the backslash must itself be escaped
    out = F.regexp_replace(F.regexp_replace(c, r"\\", r"\\\\"), '"', r"\\\"")
    for ch, esc in (("\b", r"\\b"), ("\f", r"\\f"), ("\n", r"\\n"), ("\r", r"\\r"), ("\t", r"\\t")):
        out = F.regexp_replace(out, re.escape(ch), esc)
    for i in [x for x in range(0x20) if chr(x) not in '\b\f\n\r\t']:
        out = F.regexp_replace(out, re.escape(chr(i)), f"\\\\u{i:04x}")
    return out


def import_variable_per_row(
    df: DataFrame,
    column_mappings: dict[str, str] | None = None,
    observation_properties: dict[str, str] | None = None,
    provenance: str = "",
) -> DataFrame:
    """SVObs (variable-per-row) import → the 10-column observations
    schema (variable_per_row_importer.py:128-338).

    ``column_mappings``: official ``dcid:*`` keys → physical columns;
    keys outside STANDARD_PROPERTY_MAPPING (including
    ``dcid:observationAbout``) are custom entity dimensions and are
    serialized — namespace-stripped — into the ``properties`` JSON in
    mapping order, after any static ``observation_properties`` extras.
    The logical ``entity`` column is always null (the goldens'
    behavior: entity dims live in ``properties``).

    At scale this is one narrow projection pass: no shuffle, no
    Python, filter/selects push to the scan.
    """
    mappings = dict(
        column_mappings
        or {
            # variable_per_row_importer.py:208-214 default fallback
            "dcid:observationAbout": "entity",
            "dcid:variableMeasured": "variable",
            "dcid:observationDate": "date",
            "dcid:value": "value",
        }
    )
    logical: dict[str, str] = {}
    custom: list[tuple[str, str]] = []
    for key, phys in mappings.items():
        if key in STANDARD_PROPERTY_MAPPING:
            logical[STANDARD_PROPERTY_MAPPING[key]] = phys
        else:
            custom.append((key, phys))
    for req in ("variable", "date", "value"):
        if req not in logical:
            raise ValueError(f"missing required column mapping for '{req}'")
    if not custom:
        raise ValueError("an observation needs at least one entity dimension")
    if len(custom) > 3:
        raise ValueError(f"too many entity dimensions mapped ({len(custom)}), max 3")
    missing = [p for p in list(logical.values()) + [p for _, p in custom] if p not in df.columns]
    if missing:
        raise ValueError(f"mapped columns not in input: {missing}")

    obs_props = dict(observation_properties or {})
    # static custom properties (non-standard obs_props keys) lead the JSON
    static_props = {k: v for k, v in obs_props.items() if k not in _OBS_PROPERTY_COLUMNS}

    def prop_default(name: str):
        phys = logical.get(name)
        default = F.lit(str(obs_props.get(name, "")))
        if phys is None:
            return default.alias(name)
        # per-row value wins when present (fillna(default) semantics)
        return F.coalesce(_na_to_null(F.col(phys)), default).alias(name)

    # properties JSON: json.dumps formatting ('{"k": "v", ...}'), static
    # props first then custom dims in mapping order, missing dims omitted
    entries = [
        F.lit('"%s": "%s"' % (json.dumps(k)[1:-1], json.dumps(str(v))[1:-1]))
        for k, v in static_props.items()
    ]
    for key, phys in custom:
        v = _na_to_null(F.col(phys))
        entries.append(
            F.when(
                v.isNotNull(),
                F.format_string(
                    '"%s": "%s"', F.lit(json.dumps(key)[1:-1]), _json_escape(col_strip_namespace(v))
                ),
            )
        )
    # concat_ws skips null entries natively AND stays codegen'd — the
    # previous array_join(array_compact(...)) form routed through an
    # ArrayFilter HOF, which forced the WHOLE output projection into
    # interpreted eval (~80 µs/row; measured 20s -> 3s at 1M rows)
    joined = F.concat_ws(", ", *entries)
    properties = F.when(F.length(joined) > 0, F.concat(F.lit("{"), joined, F.lit("}"))).otherwise(
        F.lit("")
    )

    from import_spark.operators.skew import widen_narrow_input

    value = _na_to_null(F.col(logical["value"]))
    out = widen_narrow_input(df).select(
        F.lit(None).cast("string").alias("entity"),
        col_strip_namespace(_na_to_null(F.col(logical["variable"]))).alias("variable"),
        _na_to_null(F.col(logical["date"])).alias("date"),
        value.alias("value"),
        F.lit(strip_namespace(provenance)).alias("provenance"),
        col_strip_namespace(prop_default("unit")).alias("unit"),
        prop_default("scaling_factor").alias("scaling_factor"),
        col_strip_namespace(prop_default("measurement_method")).alias("measurement_method"),
        col_strip_namespace(prop_default("observation_period")).alias("observation_period"),
        properties.alias("properties"),
    )
    # data.py:609-625 filter_invalid_observation_values
    return out.filter(F.col("value").isNotNull()).select(*OBSERVATION_COLUMNS)


def _property_ids(
    columns: list[str],
    column_mappings: dict[str, str] | None,
    counter: list[int] | None = None,
) -> dict[str, str]:
    """Physical column → property dcid: config mapping wins, else
    nodes.py property-id synthesis (driver-side, column names only)."""
    reverse = {phys: key for key, phys in (column_mappings or {}).items()}
    counter = counter if counter is not None else [0]
    out = {}
    for c in columns:
        mapped = reverse.get(c)
        out[c] = strip_namespace(mapped) if mapped else synth_id(c, "c/prop/", counter)
    return out


_TRIPLE_COLS = ["subject_id", "predicate", "object_id", "object_value"]


def _triple_struct(pred, object_id=None, object_value=None):
    return F.struct(
        F.lit(pred).alias("predicate") if isinstance(pred, str) else pred.alias("predicate"),
        (object_id if object_id is not None else F.lit(None).cast("string")).alias("object_id"),
        (object_value if object_value is not None else F.lit(None).cast("string")).alias(
            "object_value"
        ),
    )


def row_entity_triples(
    df: DataFrame,
    row_entity_type: str,
    id_column: str | None = None,
    index_col: str | None = None,
    column_mappings: dict[str, str] | None = None,
    entity_columns: tuple[str, ...] = (),
    provenance_id: str = "",
    recon_table: DataFrame | None = None,
) -> DataFrame:
    """EntitiesImporter (entities_importer.py:42-200): each row becomes
    a node of ``row_entity_type`` with one triple per non-null column.

    - subject: the id column's value (namespace-stripped) when
      configured, else ``<type>_<index_col>`` — "row index" is not a
      distributed concept, so callers without an id column must supply
      a deterministic ``index_col`` (at scale the id column is the
      right key anyway);
    - entity-ref columns (``columnsToResolve``) and namespace-prefixed
      values become ``object_id`` triples; comma-separated ref lists
      fan out one triple per element (entities_importer.py:180-191);
    - everything else is an ``object_value`` triple;
    - ``recon_table`` (external_id, dcid) resolves ref values the way
      the reference's dc_client call would — offline, broadcast.

    One explode over a per-row struct array; triples-per-row is the
    column count, so the fan-out is bounded and narrow.
    """
    ent_cols = set(entity_columns)
    prop_ids = _property_ids(list(df.columns), column_mappings)
    if id_column is not None and id_column not in df.columns:
        raise ValueError(f"idColumn '{id_column}' not in input columns {df.columns}")
    if id_column is None and index_col is None:
        raise ValueError("need id_column or a deterministic index_col")

    subject = (
        col_strip_namespace(F.col(id_column).cast("string"))
        if id_column
        else F.format_string(f"{row_entity_type}_%s", F.col(index_col).cast("string"))
    )

    head = [_triple_struct("typeOf", object_id=F.lit(strip_namespace(row_entity_type)))]
    if provenance_id:
        head.append(_triple_struct("includedIn", object_id=F.lit(provenance_id)))

    per_col = []
    for c in df.columns:
        if c == index_col:
            continue
        v = _na_to_null(F.col(c))
        is_ref = F.lit(c in ent_cols) | v.rlike(_NAMESPACE_PREFIX_RE)
        # ref values: comma list fans out; each element trimmed+stripped
        ids = F.transform(
            F.split(v, ","), lambda x: col_strip_namespace(F.trim(x))
        )
        pred = prop_ids[c]
        per_col.append(
            F.when(v.isNull(), F.array().cast("array<struct<predicate:string,object_id:string,object_value:string>>"))
            .when(is_ref, F.transform(ids, lambda i: _triple_struct(F.lit(pred), object_id=i)))
            .otherwise(F.array(_triple_struct(pred, object_value=v)))
        )

    all_triples = F.concat(F.array(*head), *per_col) if per_col else F.array(*head)
    out = (
        df.select(subject.alias("subject_id"), F.explode(all_triples).alias("t"))
        .select("subject_id", "t.predicate", "t.object_id", "t.object_value")
    )
    if recon_table is not None:
        r = F.broadcast(recon_table.select(
            F.col("external_id").alias("_ext"), F.col("dcid").alias("_dcid")
        ))
        out = (
            out.join(r, out["object_id"] == r["_ext"], "left")
            .select(
                "subject_id",
                "predicate",
                F.coalesce("_dcid", "object_id").alias("object_id"),
                "object_value",
            )
        )
    return out.select(*_TRIPLE_COLS)


def _date_period_col(date_col, period: str):
    """date string → aggregation period (events_importer.py:336-343).
    Vectorized Arrow batch: pd.to_datetime is the Spark twin of the
    reference's per-row dateutil parse (it accepts the same free-form
    dates Spark's fixed-format to_timestamp cannot)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    fmt = {"day": "%Y-%m-%d", "year": "%Y", "month": "%Y-%m"}.get(period, "%Y-%m")

    def _parse(s):
        return pd.to_datetime(s, errors="coerce", format="mixed").dt.strftime(fmt)

    return pandas_udf(_parse, StringType())(date_col)


def import_events(
    df: DataFrame,
    event_type: str,
    entity_column: str | None = None,
    date_column: str | None = None,
    id_column: str | None = None,
    index_col: str | None = None,
    column_mappings: dict[str, str] | None = None,
    ignore_columns: tuple[str, ...] = (),
    provenance_id: str = "",
    computed_variables: dict[str, str] | None = None,
    aggregation_periods: dict[str, str] | None = None,
    recon_table: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """EventsImporter (events_importer.py:42-343) → (observations,
    triples).

    ``computed_variables``: {variable name → sv dcid} (the plan layer
    synthesizes the dcids via nodes.py rules); each gets a COUNT per
    (entity, period) observation set — a single hash aggregate per
    variable on the (entity, period) projection.
    ``aggregation_periods``: {variable name → day|month|year}
    (default year, AggregationConfig — data.py:521).
    ``recon_table`` resolves the entity column offline (broadcast
    left join + coalesce), the ReconClient stand-in.

    Triples: typeOf / location / observationDate / includedIn plus one
    object_value triple per remaining property column — same bounded
    struct-array explode as row_entity_triples.
    """
    from import_spark.operators.skew import widen_narrow_input

    entity_column = entity_column or (column_mappings or {}).get("dcid:location")
    date_column = date_column or (column_mappings or {}).get("dcid:observationDate")
    work = widen_narrow_input(df.drop(*[c for c in ignore_columns if c in df.columns]))

    # resolve the entity column against the offline recon dimension
    if recon_table is not None and entity_column:
        r = F.broadcast(recon_table.select(
            F.col("external_id").alias("_ext"), F.col("dcid").alias("_dcid")
        ))
        work = (
            work.join(r, work[entity_column].cast("string") == r["_ext"], "left")
            .withColumn(entity_column, F.coalesce("_dcid", F.col(entity_column).cast("string")))
            .drop("_ext", "_dcid")
        )

    ent = col_strip_namespace(_na_to_null(F.col(entity_column))) if entity_column else F.lit(None).cast("string")
    date = _na_to_null(F.col(date_column)) if date_column else F.lit(None).cast("string")

    # ---- observations: COUNT per (entity, period) per computed variable.
    # Null group keys are EXCLUDED: pandas groupby(dropna=True) never
    # counts them in the reference (events_importer.py:166-169), and an
    # unparseable date there raises in date_parse (:336-337) — a
    # Spark groupBy would otherwise keep a NULL-keyed group and emit
    # observation rows the reference never produces.
    obs_parts = []
    base = work.select(ent.alias("entity"), date.alias("date"))
    for var_name, sv_dcid in (computed_variables or {}).items():
        period = (aggregation_periods or {}).get(var_name, "year")
        agg = (
            base.withColumn("date", _date_period_col(F.col("date"), period))
            .filter(F.col("entity").isNotNull() & F.col("date").isNotNull())
            .groupBy("entity", "date")
            .agg(F.count("*").cast("string").alias("value"))
            .select(
                F.col("entity"),
                F.lit(strip_namespace(sv_dcid)).alias("variable"),
                "date",
                "value",
                F.lit(strip_namespace(provenance_id)).alias("provenance"),
                *[F.lit("").alias(c) for c in _OBS_PROPERTY_COLUMNS],
                F.lit("").alias("properties"),
            )
            .filter(F.col("value").isNotNull() & (F.col("value") != ""))
        )
        obs_parts.append(agg.select(*OBSERVATION_COLUMNS))
    observations = obs_parts[0] if obs_parts else None
    for p in (obs_parts or [])[1:]:
        observations = observations.unionByName(p)
    if observations is None:
        spark = df.sparkSession
        observations = spark.createDataFrame([], ", ".join(f"{c} string" for c in OBSERVATION_COLUMNS))

    # ---- event triples
    if id_column is None and index_col is None:
        raise ValueError("need id_column or a deterministic index_col")
    subject = (
        col_strip_namespace(F.col(id_column).cast("string"))
        if id_column
        else F.format_string(f"{event_type}_%s", F.col(index_col).cast("string"))
    )
    skip = {entity_column, date_column, id_column, index_col}
    prop_cols = [c for c in work.columns if c not in skip]
    prop_ids = _property_ids(prop_cols, None)

    empty = F.array().cast("array<struct<predicate:string,object_id:string,object_value:string>>")
    parts = [F.array(_triple_struct("typeOf", object_id=F.lit(strip_namespace(event_type))))]
    parts.append(F.when(ent.isNotNull(), F.array(_triple_struct("location", object_id=ent))).otherwise(empty))
    parts.append(F.when(date.isNotNull(), F.array(_triple_struct("observationDate", object_value=date))).otherwise(empty))
    if provenance_id:
        parts.append(F.array(_triple_struct("includedIn", object_id=F.lit(provenance_id))))
    for c in prop_cols:
        v = _na_to_null(F.col(c))
        parts.append(F.when(v.isNotNull(), F.array(_triple_struct(prop_ids[c], object_value=v))).otherwise(empty))

    triples = (
        work.select(subject.alias("subject_id"), F.explode(F.concat(*parts)).alias("t"))
        .select("subject_id", "t.predicate", "t.object_id", "t.object_value")
        .select(*_TRIPLE_COLS)
    )
    return observations, triples


def mcf_db_triples(nodes: DataFrame, strict: bool = False) -> DataFrame:
    """McfImporter's custom-DC path (mcf_importer.py:59-165): MCF node
    rows → db triples with local-id resolution.

    - pass 1 (the driver loop's dict) is a distributed aggregate: the
      ``dcid`` property rows form a (local id → dcid) map;
    - pass 2 is one join: every non-dcid row's subject resolves through
      the map (falls back to the raw id), ``ID``-kind values become
      ``object_id``, literals ``object_value`` (mcf_importer.py:146-165).

    Conflicting dcids for one local id: the reference overwrites in
    file order ("legacy behavior", mcf_importer.py:136-141); file order
    is not a distributed concept, so the max dcid wins here —
    deterministic under any partitioning, divergent only on inputs the
    reference itself warns about. Unmapped non-URI subjects raise in
    the reference; by default they are dropped (the quarantine
    philosophy of the KG pipeline) — ``strict=True`` restores the
    raise at the cost of one validation pass.
    """
    from import_spark.operators.statvar import is_uri_or_namespace
    from import_spark.sources.mcf import mcf_to_triples

    t = mcf_to_triples(nodes)
    dcids = (
        t.filter((F.col("predicate") == "dcid") & (F.col("object") != ""))
        .groupBy("subject_id")
        .agg(F.max("object").alias("_dcid"))
    )
    body = t.filter(F.col("predicate") != "dcid")
    resolved = body.join(dcids, "subject_id", "left").select(
        F.coalesce("_dcid", "subject_id").alias("subject_id"),
        "predicate",
        F.when(F.col("object_kind") == "ID", F.col("object")).alias("object_id"),
        F.when(F.col("object_kind") != "ID", F.col("object")).alias("object_value"),
        F.col("_dcid").isNotNull().alias("_mapped"),
    )
    valid = F.col("_mapped") | is_uri_or_namespace(F.col("subject_id"))
    if strict:
        bad = resolved.filter(~valid).limit(1).collect()
        if bad:
            raise ValueError(f"dcid not specified for node: {bad[0]['subject_id']}")
    return resolved.filter(valid).select(*_TRIPLE_COLS)
