"""Stage 2 — extract: turns → long-form candidate statements.

The Spark analogue of the reference's template expansion
(TmcfCsvParser.java:125-374): each turn is a "row", the statement
grammar is the "template", and the emitted rows are long-form
statements ``(subj, pred, obj_type, obj)`` (the flattening that
GraphReader.java:107-155 / simple/kg_util/mcf_parser.py:169-240 do).

Vectorized: one ``mapInPandas`` pass, pandas ``str.extractall`` with
compiled regexes per statement anchor (Arrow-batched; no per-row
Python). Deterministic node ids derive from ``(conv_id, turn_idx)``
(the reference's TEST-mode row-number ids, TmcfCsvParser.java:41,137)
hashed with FarmHash→base32 (DcidGenerator.java:354-375).

Output kinds (one cached DF, filtered downstream — the Beam
side-output pattern, PipelineUtils.java:222-242):
- ``TRIPLE`` candidate statement rows
- ``DEF``    local-entity definition records for the resolver
- ``ERROR``  per-statement error rows (counter name in ``pred``)
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from import_spark.functions.complex_values import parse_complex_value
from import_spark.functions.farmhash import long_id, long_id_batch
from import_spark.functions.values import clean_numeric_string, is_number, is_valid_date
from import_spark.vocabulary import place_dcid_prefix

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),  # TRIPLE | DEF | ERROR
        T.StructField("subj", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj_type", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
        T.StructField("ext_prop", T.StringType(), True),
        T.StructField("ext_id", T.StringType(), True),
    ]
)

# statement anchors (the "template"):
_RE_MENTION = re.compile(r"we looked at (\S+)")
_RE_NOTE = re.compile(r'note "([^"]*)"')
_RE_METRIC = re.compile(r"metric is (-?\d+(?:\.\d+)?)")
_RE_COMPLEX = re.compile(r"(?:range|at coords) (\[[^\]]*\])")
_RE_COMPLEX_OPEN = re.compile(r"(?:range|at coords) \[[^\]]*$")
_RE_DEFINE = re.compile(r"define (l:E\d+) = (\S+)")
_RE_SEE = re.compile(r"see (l:E\d+)")
_RE_OBSERVE = re.compile(r"observe (\S+) (\S+) (\S+) = (\S+)(?: unit (\S+))?")
_RE_SAMEAS = re.compile(r"sameAs (\S+) (\S+)")

# external-id token prefixes → id property (Vocabulary.java:291-307 subset)
EXT_PREFIXES = {
    "iso": "isoCode",
    "wikidataId": "wikidataId",
    "nuts": "nutsCode",
    "unData": "unDataCode",
}

TURN_TYPE = "ConversationTurn"
CONV_TYPE = "Conversation"


def turn_dcid_key(conv_id: str, turn_idx) -> str:
    return f"conv_id={conv_id}turn_idx={turn_idx}"


def _turn_dcids(conv_id: pd.Series, turn_idx: pd.Series) -> pd.Series:
    keys = "conv_id=" + conv_id + "turn_idx=" + turn_idx.astype(str)
    return pd.Series("dc/t/" + long_id_batch(keys.values), index=keys.index)


def _conv_dcids(conv_id: pd.Series) -> pd.Series:
    keys = "conv_id=" + conv_id
    # hash only distinct convs per batch (vectorized), then map back
    uniq = keys.unique()
    ids = "dc/c/" + long_id_batch(uniq)
    return keys.map(dict(zip(uniq, ids)))


def _classify_token(tok: pd.Series) -> pd.DataFrame:
    """Mention token → (obj_type, obj, ext_prop, ext_id).

    ``prefix:id`` with a known prefix → EXT_ID awaiting linking;
    ``dcid:x`` → RESOLVED_REF (namespace strip, McfUtil.java:164-171);
    anything containing ``/`` (e.g. geoId/06) → already a dcid.
    """
    out = pd.DataFrame(
        {
            "obj_type": "RESOLVED_REF",
            "obj": tok,
            "ext_prop": None,
            "ext_id": None,
        },
        index=tok.index,
    )
    split = tok.str.extract(r"^([A-Za-z]+):(.+)$")
    has_pfx = split[0].notna()
    known = split[0].map(EXT_PREFIXES).notna()
    ext = has_pfx & known
    out.loc[ext, "obj_type"] = "EXT_ID"
    out.loc[ext, "ext_prop"] = split.loc[ext, 0].map(EXT_PREFIXES)
    out.loc[ext, "ext_id"] = split.loc[ext, 1]
    out.loc[ext, "obj"] = None
    dcid_pfx = has_pfx & (split[0] == "dcid")
    out.loc[dcid_pfx, "obj"] = split.loc[dcid_pfx, 1]
    return out


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    conv = pdf["conv_id"]
    tidx = pdf["turn_idx"]
    text = pdf["text"]
    turn_id = _turn_dcids(conv, tidx)
    conv_id_dc = _conv_dcids(conv)

    frames: list[pd.DataFrame] = []

    def _v(x):
        # Series → positional values (avoid index alignment in the ctor)
        return x.values if hasattr(x, "values") else x

    def emit(
        idx, subj, pred, obj_type, obj, kind="TRIPLE", ext_prop=None, ext_id=None
    ) -> None:
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv.loc[idx].values,
                    "turn_idx": tidx.loc[idx].values,
                    "kind": kind,
                    "subj": _v(subj),
                    "pred": _v(pred),
                    "obj_type": _v(obj_type),
                    "obj": _v(obj),
                    "ext_prop": _v(ext_prop),
                    "ext_id": _v(ext_id),
                }
            )
        )

    # --- per-turn base statements ---
    emit(pdf.index, turn_id, "typeOf", "RESOLVED_REF", TURN_TYPE)
    emit(pdf.index, turn_id, "partOf", "RESOLVED_REF", conv_id_dc)
    emit(pdf.index, conv_id_dc, "typeOf", "RESOLVED_REF", CONV_TYPE)
    emit(pdf.index, turn_id, "role", "TEXT", pdf["role"])
    has_tool = pdf.index[pdf["tool"] != ""]
    if len(has_tool):
        emit(has_tool, turn_id.loc[has_tool], "toolUsed", "TEXT", pdf["tool"].loc[has_tool])

    # --- mentions ---
    m = text.str.extractall(_RE_MENTION)
    if len(m):
        i = m.index.get_level_values(0)
        cls = _classify_token(m[0].reset_index(drop=True))
        emit(
            i,
            turn_id.loc[i],
            "mentions",
            cls["obj_type"],
            cls["obj"],
            ext_prop=cls["ext_prop"],
            ext_id=cls["ext_id"],
        )

    # --- quoted notes ---
    m = text.str.extractall(_RE_NOTE)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, turn_id.loc[i], "says", "TEXT", m[0].reset_index(drop=True))

    # --- numbers ---
    m = text.str.extractall(_RE_METRIC)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, turn_id.loc[i], "value", "NUMBER", m[0].reset_index(drop=True))

    # --- complex values (Quantity/QuantityRange/GeoCoordinates, P8) ---
    m = text.str.extractall(_RE_COMPLEX)
    if len(m):
        i = m.index.get_level_values(0)
        vals = m[0].reset_index(drop=True)
        lut = {v: parse_complex_value(v) for v in vals.unique()}
        parsed = vals.map(lut)
        ok = parsed.notna().values
        cv = parsed[ok]
        iok = i[ok]
        dcids = cv.map(lambda c: c.dcid)
        pred = cv.map(lambda c: "location" if c.type_of == "GeoCoordinates" else "quantity")
        emit(iok, turn_id.loc[iok], pred, "RESOLVED_REF", dcids)
        # child node triples for each distinct complex value
        emit(iok, dcids, "typeOf", "RESOLVED_REF", cv.map(lambda c: c.type_of))
        emit(iok, dcids, "name", "TEXT", cv.map(lambda c: c.name))
        for k in range(3):  # complex pvs have ≤3 entries
            sub = cv[cv.map(lambda c: len(c.pvs) > k)]
            if not len(sub):
                continue
            isub = iok[cv.map(lambda c: len(c.pvs) > k).values]
            emit(
                isub,
                sub.map(lambda c: c.dcid),
                sub.map(lambda c, _k=k: c.pvs[_k][0]),
                sub.map(lambda c, _k=k: c.pvs[_k][1]),
                sub.map(lambda c, _k=k: c.pvs[_k][2]),
            )
        bad = ~ok
        if bad.any():
            ibad = i[bad]
            emit(
                ibad,
                turn_id.loc[ibad],
                "MCF_MalformedComplexValue",
                "TEXT",
                vals[bad],
                kind="ERROR",
            )
    # unterminated complex value → error (MCF_MalformedComplexValue,
    # McfParser.java:377-384)
    open_bad = text.str.contains(_RE_COMPLEX_OPEN)
    if open_bad.any():
        ib = pdf.index[open_bad]
        emit(ib, turn_id.loc[ib], "MCF_MalformedComplexValue", "TEXT", text.loc[ib], kind="ERROR")

    # --- defines (DEF records for the resolver) + defines triple ---
    m = text.str.extractall(_RE_DEFINE)
    if len(m):
        i = m.index.get_level_values(0)
        local = m[0].reset_index(drop=True)
        tgt = m[1].reset_index(drop=True)
        cls = _classify_token(tgt)
        is_local_tgt = tgt.str.startswith("l:")
        cls.loc[is_local_tgt.values, "obj_type"] = "UNRESOLVED_REF"
        cls.loc[is_local_tgt.values, "obj"] = tgt[is_local_tgt]
        emit(
            i,
            local,
            "__def__",
            cls["obj_type"],
            cls["obj"],
            kind="DEF",
            ext_prop=cls["ext_prop"],
            ext_id=cls["ext_id"],
        )
        emit(i, turn_id.loc[i], "defines", "UNRESOLVED_REF", local)

    # --- uses ---
    m = text.str.extractall(_RE_SEE)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, turn_id.loc[i], "references", "UNRESOLVED_REF", m[0].reset_index(drop=True))

    # --- observations (SVObs, dcid per DcidGenerator.java:178-211) ---
    m = text.str.extractall(_RE_OBSERVE)
    if len(m):
        i = m.index.get_level_values(0)
        place = m[0].reset_index(drop=True)
        var = m[1].reset_index(drop=True)
        date = m[2].reset_index(drop=True)
        val = m[3].reset_index(drop=True).map(clean_numeric_string)
        unit = m[4].reset_index(drop=True)
        date_ok = date.map(is_valid_date)
        val_ok = val.map(is_number)
        good = (date_ok & val_ok).values
        if (~good).any():
            ibad = i[~good]
            cnt = pd.Series("Sanity_InvalidObsDate", index=date.index[~good])
            cnt[~val_ok[~good]] = "Sanity_NonDoubleObsValue"
            emit(ibad, turn_id.loc[ibad], cnt, "TEXT", (date + "=" + val)[~good], kind="ERROR")
        ig = i[good]
        if len(ig):
            pg, vg, dg, vvg, ug = (s[good].reset_index(drop=True) for s in (place, var, date, val, unit))
            # ordered SVObs key string (DcidGenerator.java:178-211),
            # vectorized: unit appended only where present
            keys = (
                "observationAbout=" + pg
                + "variableMeasured=" + vg
                + "observationDate=" + dg
                + "value=" + vvg
                + np.where(ug.fillna("") != "", "unit=" + ug.fillna(""), "")
            )
            obs_id = pd.Series("dc/o/" + long_id_batch(keys.values), index=pg.index)
            emit(ig, obs_id, "typeOf", "RESOLVED_REF", "StatVarObservation")
            emit(ig, obs_id, "observationAbout", "RESOLVED_REF", pg)
            emit(ig, obs_id, "variableMeasured", "RESOLVED_REF", vg)
            emit(ig, obs_id, "observationDate", "TEXT", dg)
            emit(ig, obs_id, "value", "NUMBER", vvg)
            has_u = ug.notna() & (ug != "")
            if has_u.any():
                iu = ig[has_u.values]
                emit(iu, obs_id[has_u], "unit", "RESOLVED_REF", ug[has_u])
            emit(ig, turn_id.loc[ig], "observes", "RESOLVED_REF", obs_id)

    # --- sameAs edges ---
    m = text.str.extractall(_RE_SAMEAS)
    if len(m):
        i = m.index.get_level_values(0)
        a = m[0].reset_index(drop=True)
        b = m[1].reset_index(drop=True)
        emit(i, a, "sameAs", "RESOLVED_REF", b)

    if not frames:
        return pd.DataFrame(columns=[f.name for f in EXTRACT_SCHEMA.fields])
    out = pd.concat(frames, ignore_index=True)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out


def extract_statements(transcripts: DataFrame) -> DataFrame:
    """transcripts → long-form candidate statements (narrow, no shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch(pdf)

    # column-prune before the Python boundary: ts never crosses Arrow
    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    return transcripts.select(*cols).mapInPandas(gen, schema=EXTRACT_SCHEMA)


# ---------------------------------------------------------------------------
# Fused extract+link (the pipeline hot path)
# ---------------------------------------------------------------------------
# Two bandwidth optimizations over extract_statements → link_statements:
# 1. The dcid dictionary is tiny (the reference batches it over RPC,
#    ReconClient.java:31; we broadcast it as a plain dict in the UDF
#    closure), so external ids resolve inside the same pandas pass —
#    EXT rows never cross Arrow and the downstream join disappears.
# 2. The 4-5 constant base statements per turn (typeOf/partOf/role/
#    toolUsed/conversation-typeOf) are not built in Python: the UDF
#    emits ONE 'TURN' row per turn (turn dcid + conv dcid + role +
#    tool) and whole-stage-codegen explodes it into the base
#    statements JVM-side. Python→JVM volume drops ~4x, which is what
#    the stage's scaling is bounded by at high core counts.

FUSED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("kind", T.StringType(), False),  # TRIPLE | DEF | ERROR | TURN
        T.StructField("subj", T.StringType(), True),
        T.StructField("pred", T.StringType(), True),
        T.StructField("obj_type", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
    ]
)

OUT_COLS = ["conv_id", "turn_idx", "kind", "subj", "pred", "obj_type", "obj"]


def _resolve_token(tok: pd.Series, dcid_map: dict) -> pd.Series:
    """Mention token → resolved dcid (dictionary first-wins, priority
    prefix fallback — J1 + DcidGenerator.forPlace semantics)."""
    split = tok.str.extract(r"^([A-Za-z]+):(.+)$")
    prefix, rest = split[0], split[1]
    known = prefix.map(EXT_PREFIXES)
    out = tok.copy()
    is_dcid = prefix == "dcid"
    out[is_dcid] = rest[is_dcid]
    is_ext = known.notna()
    if is_ext.any():
        props = known[is_ext]
        exts = rest[is_ext]
        hits = pd.Series(
            [dcid_map.get((p, e)) for p, e in zip(props, exts)], index=props.index
        )
        fallback = props.map(place_dcid_prefix) + "/" + exts
        out[is_ext] = hits.fillna(fallback)
    return out


def _extract_batch_fused(pdf: pd.DataFrame, dcid_map: dict) -> pd.DataFrame:
    conv = pdf["conv_id"]
    tidx = pdf["turn_idx"]
    text = pdf["text"]
    turn_id = _turn_dcids(conv, tidx)
    conv_id_dc = _conv_dcids(conv)

    frames: list[pd.DataFrame] = []

    def _v(x):
        return x.values if hasattr(x, "values") else x

    def emit(idx, subj, pred, obj_type, obj, kind="TRIPLE") -> None:
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": conv.loc[idx].values,
                    "turn_idx": tidx.loc[idx].values,
                    "kind": kind,
                    "subj": _v(subj),
                    "pred": _v(pred),
                    "obj_type": _v(obj_type),
                    "obj": _v(obj),
                }
            )
        )

    # one TURN row per turn; base statements expand JVM-side
    emit(pdf.index, turn_id, pdf["role"], pdf["tool"], conv_id_dc, kind="TURN")

    m = text.str.extractall(_RE_MENTION)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, turn_id.loc[i], "mentions", "RESOLVED_REF",
             _resolve_token(m[0].reset_index(drop=True), dcid_map))

    m = text.str.extractall(_RE_NOTE)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, turn_id.loc[i], "says", "TEXT", m[0].reset_index(drop=True))

    m = text.str.extractall(_RE_METRIC)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, turn_id.loc[i], "value", "NUMBER", m[0].reset_index(drop=True))

    m = text.str.extractall(_RE_COMPLEX)
    if len(m):
        i = m.index.get_level_values(0)
        vals = m[0].reset_index(drop=True)
        lut = {v: parse_complex_value(v) for v in vals.unique()}
        parsed = vals.map(lut)
        ok = parsed.notna().values
        cv = parsed[ok]
        iok = i[ok]
        dcids = cv.map(lambda c: c.dcid)
        pred = cv.map(lambda c: "location" if c.type_of == "GeoCoordinates" else "quantity")
        emit(iok, turn_id.loc[iok], pred, "RESOLVED_REF", dcids)
        emit(iok, dcids, "typeOf", "RESOLVED_REF", cv.map(lambda c: c.type_of))
        emit(iok, dcids, "name", "TEXT", cv.map(lambda c: c.name))
        for k in range(3):
            mask = cv.map(lambda c, _k=k: len(c.pvs) > _k)
            sub = cv[mask]
            if not len(sub):
                continue
            isub = iok[mask.values]
            emit(
                isub,
                sub.map(lambda c: c.dcid),
                sub.map(lambda c, _k=k: c.pvs[_k][0]),
                sub.map(lambda c, _k=k: c.pvs[_k][1]),
                sub.map(lambda c, _k=k: c.pvs[_k][2]),
            )
        bad = ~ok
        if bad.any():
            ibad = i[bad]
            emit(ibad, turn_id.loc[ibad], "MCF_MalformedComplexValue", "TEXT",
                 vals[bad], kind="ERROR")
    open_bad = text.str.contains(_RE_COMPLEX_OPEN)
    if open_bad.any():
        ib = pdf.index[open_bad]
        emit(ib, turn_id.loc[ib], "MCF_MalformedComplexValue", "TEXT",
             text.loc[ib], kind="ERROR")

    m = text.str.extractall(_RE_DEFINE)
    if len(m):
        i = m.index.get_level_values(0)
        local = m[0].reset_index(drop=True)
        tgt = m[1].reset_index(drop=True)
        is_local_tgt = tgt.str.startswith("l:")
        obj = _resolve_token(tgt, dcid_map)
        obj[is_local_tgt] = tgt[is_local_tgt]
        obj_type = pd.Series(
            np.where(is_local_tgt, "UNRESOLVED_REF", "RESOLVED_REF"), index=tgt.index
        )
        emit(i, local, "__def__", obj_type, obj, kind="DEF")
        emit(i, turn_id.loc[i], "defines", "UNRESOLVED_REF", local)

    m = text.str.extractall(_RE_SEE)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, turn_id.loc[i], "references", "UNRESOLVED_REF", m[0].reset_index(drop=True))

    m = text.str.extractall(_RE_OBSERVE)
    if len(m):
        i = m.index.get_level_values(0)
        place = m[0].reset_index(drop=True)
        var = m[1].reset_index(drop=True)
        date = m[2].reset_index(drop=True)
        val = m[3].reset_index(drop=True).map(clean_numeric_string)
        unit = m[4].reset_index(drop=True)
        date_ok = date.map(is_valid_date)
        val_ok = val.map(is_number)
        good = (date_ok & val_ok).values
        if (~good).any():
            ibad = i[~good]
            cnt = pd.Series("Sanity_InvalidObsDate", index=date.index[~good])
            cnt[~val_ok[~good]] = "Sanity_NonDoubleObsValue"
            emit(ibad, turn_id.loc[ibad], cnt, "TEXT", (date + "=" + val)[~good], kind="ERROR")
        ig = i[good]
        if len(ig):
            pg, vg, dg, vvg, ug = (s[good].reset_index(drop=True) for s in (place, var, date, val, unit))
            keys = (
                "observationAbout=" + pg
                + "variableMeasured=" + vg
                + "observationDate=" + dg
                + "value=" + vvg
                + np.where(ug.fillna("") != "", "unit=" + ug.fillna(""), "")
            )
            obs_id = pd.Series("dc/o/" + long_id_batch(keys.values), index=pg.index)
            emit(ig, obs_id, "typeOf", "RESOLVED_REF", "StatVarObservation")
            emit(ig, obs_id, "observationAbout", "RESOLVED_REF", pg)
            emit(ig, obs_id, "variableMeasured", "RESOLVED_REF", vg)
            emit(ig, obs_id, "observationDate", "TEXT", dg)
            emit(ig, obs_id, "value", "NUMBER", vvg)
            has_u = ug.notna() & (ug != "")
            if has_u.any():
                iu = ig[has_u.values]
                emit(iu, obs_id[has_u], "unit", "RESOLVED_REF", ug[has_u])
            emit(ig, turn_id.loc[ig], "observes", "RESOLVED_REF", obs_id)

    m = text.str.extractall(_RE_SAMEAS)
    if len(m):
        i = m.index.get_level_values(0)
        emit(i, m[0].reset_index(drop=True), "sameAs", "RESOLVED_REF",
             m[1].reset_index(drop=True))

    if not frames:
        return pd.DataFrame(columns=OUT_COLS)
    out = pd.concat(frames, ignore_index=True)
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return out


def extract_and_link(transcripts: DataFrame, dcid_map: dict) -> DataFrame:
    """Fused extract+link; output schema/semantics identical to
    ``link_statements(extract_statements(df), dict_df)`` minus the
    (internal) ext columns."""
    from pyspark.sql import functions as F

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _extract_batch_fused(pdf, dcid_map)

    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    raw = transcripts.select(*cols).mapInPandas(gen, schema=FUSED_SCHEMA)

    # single-pass expansion: a TURN row becomes its 4-5 base statements,
    # every other row passes through — one conditional explode, so the
    # Python stage executes exactly once (a union of two filters of the
    # same mapInPandas would run it twice)
    s = lambda p, t, o: F.struct(  # noqa: E731
        F.lit("TRIPLE").alias("kind"),
        F.col("subj").alias("subj"),
        F.lit(p).alias("pred"),
        F.lit(t).alias("obj_type"),
        o.alias("obj"),
    )
    base_arr = F.filter(
        F.array(
            s("typeOf", "RESOLVED_REF", F.lit(TURN_TYPE)),
            s("partOf", "RESOLVED_REF", F.col("obj")),
            F.struct(
                F.lit("TRIPLE").alias("kind"),
                F.col("obj").alias("subj"),
                F.lit("typeOf").alias("pred"),
                F.lit("RESOLVED_REF").alias("obj_type"),
                F.lit(CONV_TYPE).alias("obj"),
            ),
            s("role", "TEXT", F.col("pred")),
            F.when(F.col("obj_type") != "", s("toolUsed", "TEXT", F.col("obj_type"))),
        ),
        lambda x: x.isNotNull(),
    )
    passthrough = F.array(
        F.struct(
            F.col("kind"), F.col("subj"), F.col("pred"), F.col("obj_type"), F.col("obj")
        )
    )
    return raw.select(
        "conv_id",
        "turn_idx",
        F.explode(
            F.when(F.col("kind") == "TURN", base_arr).otherwise(passthrough)
        ).alias("b"),
    ).select("conv_id", "turn_idx", "b.kind", "b.subj", "b.pred", "b.obj_type", "b.obj")
