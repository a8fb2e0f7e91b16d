"""StatVarGroups serving-cache blob for custom-DC imports.

Re-expresses ``/root/reference/simple/stats/svg_cache.py:36-122``
(generate_svg_cache / _SVGCache) and the wire/encode contract of
``stats/util.py:31-47`` (gzip_and_base64_encode) against the public
``proto/cache_data.proto`` message shapes:

- SVG triples fold to ``StatVarGroupNode``s: ``name`` sets
  absolute_name (last non-empty wins), ``specializationOf`` appends a
  ChildSVG to the PARENT node in triple order, carrying the
  specialized-entity name when the parent→child pair is configured.
- SV triples fold to ``ChildSV``s: ``name`` sets display_name and
  appends to search_names, ``description`` appends to search_names,
  ``memberOf`` attaches a SNAPSHOT of the ChildSV to the target SVG
  (protobuf repeated-append copies; later name triples don't mutate an
  already-attached child) — unknown SVG targets are skipped.
- The blob is the serialized ``StatVarGroups`` map, gzipped with a
  fixed mtime and base64-encoded, stored under the ``StatVarGroups``
  key_value key.

No protobuf runtime in the container: serialization uses the repo's
hand-rolled wire codec (functions/protowire.py) emitting fields in
field-number order, which is exactly how the protobuf runtime
serializes these messages. Top-level map entry order is node-creation
order (proto map serialization order is unspecified by the format;
creation order is deterministic for a given triple order).

The SVG/SV triple sets are dimension-sized serving metadata (the
reference builds this cache wholly in memory from a DB read); the
Spark side filters/sorts the triples, the fold runs on the collected
dimension.
"""

from __future__ import annotations

import base64
import gzip
import io
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from import_spark.functions.protowire import field_bytes, field_string

STAT_VAR_GROUPS_CACHE_KEY = "StatVarGroups"


@dataclass
class ChildSV:
    id: str
    search_names: list[str] = field(default_factory=list)
    display_name: str = ""

    def copy(self) -> "ChildSV":
        return ChildSV(self.id, list(self.search_names), self.display_name)


@dataclass
class ChildSVG:
    id: str
    specialized_entity: str = ""


@dataclass
class SvgNode:
    absolute_name: str = ""
    child_stat_vars: list[ChildSV] = field(default_factory=list)
    child_stat_var_groups: list[ChildSVG] = field(default_factory=list)


def build_svg_cache(
    svg_rows: list,
    sv_rows: list,
    specialized_names: dict[str, dict[str, str]] | None = None,
) -> dict[str, SvgNode]:
    """The _SVGCache fold (svg_cache.py:55-122) over ordered
    (subject_id, predicate, object_id, object_value) rows. Returns the
    node map in creation order."""
    specialized_names = specialized_names or {}
    nodes: dict[str, SvgNode] = {}

    def node(svg_id: str) -> SvgNode:
        return nodes.setdefault(svg_id, SvgNode())

    for subject_id, predicate, object_id, object_value in svg_rows:
        n = node(subject_id)
        if predicate == "name" and object_value:
            n.absolute_name = object_value
        elif predicate == "specializationOf" and object_id:
            parent = node(object_id)
            spec = specialized_names.get(object_id, {}).get(subject_id, "")
            parent.child_stat_var_groups.append(ChildSVG(subject_id, spec))

    svs: dict[str, ChildSV] = {}
    for subject_id, predicate, object_id, object_value in sv_rows:
        sv = svs.setdefault(subject_id, ChildSV(subject_id))
        if predicate == "name" and object_value:
            sv.display_name = object_value
            sv.search_names.append(object_value)
        elif predicate == "description" and object_value:
            sv.search_names.append(object_value)
        elif predicate == "memberOf" and object_id:
            target = nodes.get(object_id)
            if target is None:
                continue  # reference logs a warning and skips
            target.child_stat_vars.append(sv.copy())
    return nodes


# ------------------------------------------------------------ serialization


def _child_sv_bytes(sv: ChildSV) -> bytes:
    # field-number order: id=1, display_name=3, search_names=4
    out = field_string(1, sv.id) if sv.id else b""
    if sv.display_name:
        out += field_string(3, sv.display_name)
    for s in sv.search_names:
        out += field_string(4, s)
    return out


def _child_svg_bytes(c: ChildSVG) -> bytes:
    out = field_string(1, c.id) if c.id else b""
    if c.specialized_entity:
        out += field_string(2, c.specialized_entity)
    return out


def _node_bytes(n: SvgNode) -> bytes:
    out = b""
    if n.absolute_name:
        out += field_string(1, n.absolute_name)
    for sv in n.child_stat_vars:
        out += field_bytes(2, _child_sv_bytes(sv))
    for c in n.child_stat_var_groups:
        out += field_bytes(3, _child_svg_bytes(c))
    return out


def stat_var_groups_bytes(nodes: dict[str, SvgNode]) -> bytes:
    """StatVarGroups wire bytes: map<string, StatVarGroupNode> = 1
    (each entry a submessage key=1/value=2), entries in dict order."""
    out = b""
    for svg_id, n in nodes.items():
        entry = field_string(1, svg_id) + field_bytes(2, _node_bytes(n))
        out += field_bytes(1, entry)
    return out


def gzip_and_base64_encode(data: bytes, mtime: float = 0.0) -> str:
    """stats/util.py:31-38 with a pinned gzip mtime so equal protos
    yield equal blobs (the reference pins it the same way in tests)."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=mtime) as gz:
        gz.write(data)
    return base64.b64encode(buf.getvalue()).decode("utf-8")


def base64_decode_and_gunzip(encoded: str) -> bytes:
    with gzip.GzipFile(fileobj=io.BytesIO(base64.b64decode(encoded)), mode="rb") as gz:
        return gz.read()


def svg_cache_blob(
    nodes: dict[str, SvgNode], mtime: float = 0.0
) -> tuple[str, str]:
    """(key, value) row for the key_value store (svg_cache.py:43-45)."""
    return STAT_VAR_GROUPS_CACHE_KEY, gzip_and_base64_encode(
        stat_var_groups_bytes(nodes), mtime=mtime
    )


# ------------------------------------------------------------ text rendering


def _text_fields(pairs: list[tuple[str, object]], indent: int) -> list[str]:
    pad = "  " * indent
    out = []
    for name, val in pairs:
        if isinstance(val, str):
            out.append(f'{pad}{name}: "{_escape(val)}"')
        else:  # submessage: list of pairs
            out.append(f"{pad}{name} {{")
            out.extend(_text_fields(val, indent + 1))
            out.append(f"{pad}}}")
    return out


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def to_textproto(nodes: dict[str, SvgNode]) -> str:
    """Protobuf text-format rendering (declaration-order fields, the
    order ``str(proto)`` prints), for golden comparison against the
    reference's svg_cache.textproto fixtures."""
    lines: list[str] = []
    for svg_id, n in nodes.items():
        value: list[tuple[str, object]] = []
        if n.absolute_name:
            value.append(("absolute_name", n.absolute_name))
        for sv in n.child_stat_vars:
            svp: list[tuple[str, object]] = [("id", sv.id)]
            # declaration order: id, search_name, search_names, display_name
            svp += [("search_names", s) for s in sv.search_names]
            if sv.display_name:
                svp.append(("display_name", sv.display_name))
            value.append(("child_stat_vars", svp))
        for c in n.child_stat_var_groups:
            cp: list[tuple[str, object]] = [("id", c.id)]
            if c.specialized_entity:
                cp.append(("specialized_entity", c.specialized_entity))
            value.append(("child_stat_var_groups", cp))
        lines.extend(
            _text_fields(
                [("stat_var_groups", [("key", svg_id), ("value", value)])], 0
            )
        )
    return "\n".join(lines) + ("\n" if lines else "")


# ------------------------------------------------------------ Spark surface


def svg_cache_from_triples(
    triples: DataFrame,
    specialized_names: dict[str, dict[str, str]] | None = None,
    order_col: str | None = None,
) -> dict[str, SvgNode]:
    """generate_svg_cache's DB step (svg_cache.py:36-45): split the
    triple table by subject type (StatVarGroup vs StatisticalVariable),
    keep triple order, fold. The type filter and ordering run
    Spark-side; the fold runs over the collected dimension rows."""
    from import_spark.operators.nl_sentences import only_subject_types

    t = triples
    if order_col is None:
        t = t.withColumn("_ord", F.monotonically_increasing_id())
        order_col = "_ord"
    cols = ["subject_id", "predicate", "object_id", "object_value"]

    def rows(type_name):
        return [
            tuple(r[c] for c in cols)
            for r in only_subject_types(t, [type_name])
            .orderBy(order_col)
            .select(*cols)
            .collect()
        ]

    return build_svg_cache(
        rows("StatVarGroup"), rows("StatisticalVariable"), specialized_names
    )
