"""`python -m stats.main` Runner analogue (SURVEY §3.3): config-driven
simple import over already-loaded DataFrames.

Reference: simple/stats/runner.py:250-1120 (config merge, importer
dispatch per input file, nodes registry, post-import node triples) and
simple/stats/nodes.py (id synthesis + provenance/source/variable/
property/type registries).

Shape: the nodes REGISTRY is driver-side state — its contents derive
from the config and from column NAMES (a handful of strings), never
from data rows, so it stays O(config) at any corpus size and its
triples are emitted as one small createDataFrame. All row-scaled work
(observations, row-entity/event triples, distinct-entity typeOf
triples) happens in the importer operators as DataFrame transforms.

Out of scope by design: network calls (the reference's dc_client
resolution is the ``recon_table`` offline dimension — same stand-in as
the genmcf FULL-resolution path), sqlite/db_cache packaging, and NL
artifact generation.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from import_spark.operators.observations import import_wide_observations
from import_spark.operators.simple_importers import (
    OBSERVATION_COLUMNS,
    _TRIPLE_COLS,
    _property_ids,
    col_strip_namespace,
    import_events,
    import_variable_per_row,
    row_entity_triples,
    strip_namespace,
    synth_id,
)

# schema_constants: default custom root StatVarGroup
_ROOT_SVG = ("c/g/Root", "Custom Variables", "dc/g/Root")


@dataclass
class _Registry:
    """nodes.py:72-141 driver-side twin. Default source/provenance are
    preloaded (nodes.py:51-56) so the first config-declared entries get
    index 1 — the goldens' c/p/1 / c/s/1."""

    sources: dict = field(default_factory=dict)  # name -> (id, url)
    provenances: dict = field(default_factory=dict)  # name -> (id, source_id, url)
    variables: dict = field(default_factory=dict)  # name -> (id, cfg)
    properties: dict = field(default_factory=dict)  # column name -> id
    event_types: dict = field(default_factory=dict)  # name -> (id, name, desc, prov_ids)
    entity_types: dict = field(default_factory=dict)
    _prop_counter: list = field(default_factory=lambda: [0])
    _sv_counter: list = field(default_factory=lambda: [0])

    def __post_init__(self):
        self.sources["Custom Data Commons"] = ("c/s/default", "")
        self.provenances["Custom Import"] = ("c/p/default", "c/s/default", "custom-import")

    def load_config(self, config: dict) -> None:
        for sname, scfg in (config.get("sources") or {}).items():
            if sname not in self.sources:
                self.sources[sname] = (f"c/s/{len(self.sources)}", scfg.get("url", ""))
            sid, _ = self.sources[sname]
            for pname, purl in (scfg.get("provenances") or {}).items():
                if pname not in self.provenances:
                    self.provenances[pname] = (f"c/p/{len(self.provenances)}", sid, purl)

    def provenance_id(self, ref: str) -> str:
        """Config 'provenance' values are either a declared provenance
        NAME or a dcid-style reference used verbatim (both appear in
        the reference's own fixtures)."""
        if ":" in ref or "/" in ref:
            return strip_namespace(ref)
        if ref not in self.provenances:
            self.provenances[ref] = (f"c/p/{len(self.provenances)}", "c/s/default", "")
        return self.provenances[ref][0]

    def variable(self, name: str, config: dict, prov_id: str, explicit_id: str | None = None) -> str:
        if name not in self.variables:
            vcfg = (config.get("variables") or {}).get(name, {})
            self.variables[name] = (
                explicit_id or synth_id(name, "custom/statvar_", self._sv_counter),
                vcfg,
                set(),
            )
        self.variables[name][2].add(prov_id)
        return self.variables[name][0]

    def prop(self, column: str, prop_id: str) -> None:
        self.properties.setdefault(column, prop_id)

    def typed_node(self, kind: str, name: str, config: dict, prov_id: str, source_id: str) -> str:
        reg = self.event_types if kind == "events" else self.entity_types
        if name not in reg:
            cfg = (config.get(kind) or {}).get(name, {})
            counter = [len(reg)]
            nid = synth_id(name, "c/e/" if kind == "events" else "c/n/", counter)
            reg[name] = (nid, cfg.get("name", name), cfg.get("description", ""), [], [])
        nid, disp, desc, provs, srcs = reg[name]
        if prov_id not in provs:
            provs.append(prov_id)
        if source_id not in srcs:
            srcs.append(source_id)
        return nid

    def source_of(self, prov_id: str) -> str:
        for _, (pid, sid, _) in self.provenances.items():
            if pid == prov_id:
                return sid
        return "c/s/default"

    def node_triples(self) -> list[tuple]:
        """All registry nodes as (subject_id, predicate, object_id,
        object_value) rows — data.py triples() shapes."""
        rows: list[tuple] = []
        for name, (sid, url) in self.sources.items():
            rows += [(sid, "typeOf", "Source", None), (sid, "name", None, name)]
            if url:
                rows.append((sid, "url", None, url))
                domain = url.split("//", 1)[-1].split("/", 1)[0]
                if domain:
                    rows.append((sid, "domain", None, domain))
        for name, (pid, sid, url) in self.provenances.items():
            rows += [
                (pid, "typeOf", "Provenance", None),
                (pid, "name", None, name),
                (pid, "source", sid, None),
            ]
            if url:
                rows.append((pid, "url", None, url))
        for column, prop_id in self.properties.items():
            rows += [(prop_id, "typeOf", "Property", None), (prop_id, "name", None, column)]
        for kind, reg in (("Event", self.event_types), ("Entity", self.entity_types)):
            for _, (nid, disp, desc, provs, srcs) in reg.items():
                rows += [(nid, "typeOf", "Class", None)]
                if kind == "Event":
                    rows.append((nid, "subClassOf", "Event", None))
                rows.append((nid, "name", None, disp))
                if desc:
                    rows.append((nid, "description", None, desc))
                rows += [(nid, "includedIn", p, None) for p in provs]
                rows += [(nid, "includedIn", s, None) for s in srcs]
        if self.variables:
            gid, gname, groot = _ROOT_SVG
            rows += [
                (gid, "typeOf", "StatVarGroup", None),
                (gid, "name", None, gname),
                (gid, "specializationOf", groot, None),
            ]
        for name, (vid, vcfg, provs) in self.variables.items():
            rows += [
                (vid, "typeOf", "StatisticalVariable", None),
                (vid, "name", None, vcfg.get("name", name)),
                (vid, "memberOf", _ROOT_SVG[0], None),
            ]
            for p in sorted(provs):
                rows.append((vid, "includedIn", p, None))
                rows.append((vid, "includedIn", self.source_of(p), None))
            rows += [
                (vid, "populationType", "Thing", None),
                (vid, "statType", "measuredValue", None),
                (vid, "measuredProperty", vid, None),
            ]
        return rows


@dataclass
class SimpleImportResult:
    observations: DataFrame
    triples: DataFrame
    registry: _Registry


def _file_config(config: dict, name: str) -> dict:
    """Per-file config lookup, accepting BOTH inputFiles shapes the
    reference parses (config.py:77-122): the legacy dict keyed by
    filename/pattern and the modern list of objects keyed by their
    'pattern' or 'filename' field."""
    files = config.get("inputFiles") or {}
    if isinstance(files, list):
        files = {
            (e.get("pattern") or e.get("filename")): e
            for e in files
            if isinstance(e, dict) and (e.get("pattern") or e.get("filename"))
        }
    if name in files:
        return files[name]
    for pattern, cfg in files.items():
        if fnmatch.fnmatch(name, pattern):
            return cfg
    return {}


def run_simple_import(
    spark: SparkSession,
    config: dict,
    inputs: dict[str, DataFrame],
    recon_table: DataFrame | None = None,
    index_cols: dict[str, str] | None = None,
) -> SimpleImportResult:
    """Dispatch every input through its configured importer
    (runner.py:89-163 _create_importer_for_file) and assemble the two
    db tables: ``observations`` (10-col schema) and ``triples``
    (subject_id, predicate, object_id, object_value) — row triples
    unioned with the registry's node triples and, for events inputs,
    the distinct-entity typeOf triples.
    """
    reg = _Registry()
    reg.load_config(config)
    obs_parts: list[DataFrame] = []
    triple_parts: list[DataFrame] = []
    index_cols = index_cols or {}

    for name, df in inputs.items():
        cfg = _file_config(config, name)
        prov_ref = cfg.get("provenance", "Custom Import")
        prov_id = reg.provenance_id(prov_ref)
        source_id = reg.source_of(prov_id)
        mappings = cfg.get("columnMappings") or {}
        ignore = tuple(cfg.get("ignoreColumns") or ())
        idx = index_cols.get(name)

        if name.lower().endswith(".mcf"):
            # runner.py:98-108 McfImporter (custom-DC: MCF → db triples);
            # the input DataFrame is read_mcf's node-row shape
            from import_spark.operators.simple_importers import mcf_db_triples

            triple_parts.append(mcf_db_triples(df))
        elif "rowEntityType" in cfg:
            ent_type = reg.typed_node("entities", cfg["rowEntityType"], config, prov_id, source_id)
            kept = [c for c in df.columns if c not in set(ignore) and c != idx]
            for col, pid in _property_ids(kept, mappings, reg._prop_counter).items():
                reg.prop(col, pid)
            triple_parts.append(
                row_entity_triples(
                    df.drop(*[c for c in ignore if c in df.columns]),
                    ent_type,
                    id_column=cfg.get("idColumn"),
                    index_col=idx,
                    column_mappings=mappings,
                    entity_columns=tuple(cfg.get("columnsToResolve") or ()),
                    provenance_id=prov_id,
                    recon_table=recon_table,
                )
            )
        elif "eventType" in cfg:
            ev_type = reg.typed_node("events", cfg["eventType"], config, prov_id, source_id)
            computed = {
                v: reg.variable(v, config, prov_id) for v in cfg.get("computedVariables") or []
            }
            periods = {
                v: ((config.get("variables") or {}).get(v, {}).get("aggregation") or {}).get(
                    "period", "year"
                )
                for v in computed
            }
            entity_col = mappings.get("dcid:location")
            date_col = mappings.get("dcid:observationDate")
            # events_importer.py:118-137 registers a Property node for
            # every non-entity/date column — the id column included
            # (its triples are skipped, its node is not)
            kept = [
                c
                for c in df.columns
                if c not in set(ignore) and c not in {entity_col, date_col, idx}
            ]
            for col, pid in _property_ids(kept, None, reg._prop_counter).items():
                reg.prop(col, pid)
            obs, trips = import_events(
                df,
                ev_type,
                id_column=cfg.get("idColumn"),
                index_col=idx,
                column_mappings=mappings,
                ignore_columns=ignore,
                provenance_id=prov_id,
                computed_variables=computed,
                aggregation_periods=periods,
                recon_table=recon_table,
            )
            obs_parts.append(obs)
            triple_parts.append(trips)
            # distinct resolved entities → typeOf <entityType> (the
            # reference's dc-client entities_with_types round-trip)
            if entity_col and cfg.get("entityType"):
                ents = obs.select(
                    col_strip_namespace(F.col("entity")).alias("subject_id")
                ).where(F.col("subject_id").isNotNull() & (F.col("subject_id") != "")).distinct()
                triple_parts.append(
                    ents.select(
                        "subject_id",
                        F.lit("typeOf").alias("predicate"),
                        F.lit(cfg["entityType"]).alias("object_id"),
                        F.lit(None).cast("string").alias("object_value"),
                    )
                )
        elif cfg.get("format") == "variablePerRow":
            obs_parts.append(
                import_variable_per_row(
                    df,
                    column_mappings=mappings or None,
                    observation_properties=cfg.get("observationProperties"),
                    provenance=prov_ref,
                )
            )
        else:
            wide = import_wide_observations(
                df, ignore_columns=list(ignore), column_mappings=mappings or None
            )
            # variables are COLUMN names (observations_importer.py:93-96);
            # register them with the ids the operator itself emits (C8)
            cols = [c for c in df.columns if c not in set(ignore)]
            entity_c = mappings.get("dcid:observationAbout") or cols[0]
            date_c = mappings.get("dcid:observationDate") or next(
                c for c in cols if c != entity_c
            )
            from import_spark.operators.statvar import sanitize_sv_id
            name_df = spark.createDataFrame(
                [(c,) for c in cols if c not in (entity_c, date_c)], ["name"]
            )
            for r in name_df.select(
                "name", sanitize_sv_id(F.col("name")).alias("sv_id")
            ).collect():
                reg.variable(r["name"], config, prov_id, explicit_id=r["sv_id"])
            obs_parts.append(
                wide.select(
                    "entity",
                    "variable",
                    "date",
                    "value",
                    F.lit(prov_id).alias("provenance"),
                    *[F.lit("").alias(c) for c in OBSERVATION_COLUMNS[5:9]],
                    F.lit("").alias("properties"),
                )
            )

    node_rows = reg.node_triples()
    schema = "subject_id string, predicate string, object_id string, object_value string"
    if node_rows:
        triple_parts.append(spark.createDataFrame(node_rows, schema))

    observations = None
    for p in obs_parts:
        observations = p if observations is None else observations.unionByName(p)
    if observations is None:
        observations = spark.createDataFrame(
            [], ", ".join(f"{c} string" for c in OBSERVATION_COLUMNS)
        )
    triples = None
    for p in triple_parts:
        triples = p if triples is None else triples.unionByName(p)
    if triples is None:
        triples = spark.createDataFrame([], schema)
    return SimpleImportResult(observations, triples.select(*_TRIPLE_COLS), reg)
