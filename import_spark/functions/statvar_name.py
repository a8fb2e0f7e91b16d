"""Full StatVar display-name generation — the complete rule set of the
reference's StatVarNameGenerator (StatVarNameGenerator.java:53-266),
re-expressed in Python:

- formatToken: namespace strip, underscore→space, camelCase /
  letter-digit boundary splits, first-letter-capitalize per word
  (NOT title-case — inner capitals like COVID stay);
- statType prefix (non-measuredValue, redundant "Value" suffix
  stripped when len > 5);
- measurementQualifier parts split on [,\\s&]+; period words
  (Daily/Weekly/Monthly/Quarterly/Annual) promote into the prefix,
  the rest render as "(A & B)";
- measure x population: "Of" combination with redundancy
  suppression via case-insensitive containment either way;
- constraints in sorted-prop order, every value (multi-valued props
  included), booleans as "Prop" / "Prop (False)";
- measurementDenominator: "(Per capita)" for Count_Person/Person,
  else "(As fraction of ...)";
- assembly: prefix, measure-and-pop, mqual, ": constraints",
  " (denominator)".

Used by the mutator's StatVar synthesis for nodes missing a ``name``
(McfMutator.java:110-158 + the name generator), and unit-locked
against the reference's own StatVarNameGeneratorTest vectors.
"""

from __future__ import annotations

import re

from import_spark import vocabulary as V

_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z])([A-Z][a-z])")
_LETTER_NUM = re.compile(r"([a-zA-Z])([0-9])")
_NUM_LETTER = re.compile(r"([0-9])([a-zA-Z])")
_MULTI_SPACE = re.compile(r"\s+")
_MQUAL_SPLIT = re.compile(r"[,\s&]+")
_NS = re.compile(r"^[A-Za-z]+:")

_PERIOD_WORDS = {"daily", "weekly", "monthly", "quarterly", "annual"}


def format_token(token: str | None) -> str:
    """StatVarNameGenerator.formatToken (java:69-86)."""
    if not token:
        return ""
    s = _NS.sub("", token)
    s = s.replace("_", " ")
    s = _CAMEL_1.sub(r"\1 \2", s)
    s = _CAMEL_2.sub(r"\1 \2", s)
    s = _LETTER_NUM.sub(r"\1 \2", s)
    s = _NUM_LETTER.sub(r"\1 \2", s)
    s = _MULTI_SPACE.sub(" ", s).strip()
    return " ".join(w[0].upper() + w[1:] for w in s.split(" ") if w)


def _is_generic_pop(pop: str) -> bool:
    return not pop or pop.lower() == "thing"


def _first(pvs: dict[str, list[str]], prop: str) -> str:
    vals = pvs.get(prop) or []
    return vals[0] if vals else ""


def generate_statvar_name(pvs: dict[str, list[str]]) -> str:
    """pvs: prop → list of values (value ORDER preserved as given).

    Faithful to generateName (java:93-109) + its five helpers."""
    stat_type = _first(pvs, "statType")
    measured_property = _first(pvs, "measuredProperty")
    population_type = _first(pvs, "populationType")
    mdenom = _first(pvs, "measurementDenominator")

    # prefix (java:111-127)
    prefix_list: list[str] = []
    st = _NS.sub("", stat_type)
    if st and st.lower() != "measuredvalue":
        if len(st) > 5 and st.lower().endswith("value"):
            st = st[:-5]
        fst = format_token(st)
        if fst:
            prefix_list.append(fst)

    # measurement qualifiers (java:129-154); period parts promote to prefix
    mqual_list: list[str] = []
    parts: list[str] = []
    for q in pvs.get("measurementQualifier") or []:
        for part in _MQUAL_SPLIT.split(q):
            if not part:
                continue
            if part.lower() in _PERIOD_WORDS:
                prefix_list.append(format_token(part))
            else:
                parts.append(format_token(part))
    if parts:
        mqual_list.append("(" + " & ".join(parts) + ")")

    # measure x population (java:156-184)
    fm = format_token(measured_property)
    fp = format_token(population_type)
    measure_and_pop = fm
    if fp and not _is_generic_pop(population_type) and not _is_generic_pop(fp):
        if not measure_and_pop:
            measure_and_pop = fp
        elif (
            measure_and_pop.lower() != fp.lower()
            and fp.lower() not in measure_and_pop.lower()
            and measure_and_pop.lower() not in fp.lower()
        ):
            measure_and_pop = measure_and_pop + " Of " + fp
        elif measure_and_pop.lower() in fp.lower() and measure_and_pop.lower() != fp.lower():
            measure_and_pop = fp

    # constraints (java:186-212): sorted props, all values, bool cases
    constraint_vals: list[str] = []
    for raw_prop in sorted(pvs.keys()):
        prop = _NS.sub("", raw_prop)
        if prop in V.NON_CONSTRAINT_STAT_VAR_PROPS:
            continue
        for val in pvs.get(raw_prop) or []:
            if val.lower() == "true":
                constraint_vals.append(format_token(prop))
            elif val.lower() == "false":
                constraint_vals.append(format_token(prop) + " (False)")
            else:
                fv = format_token(val)
                if fv:
                    constraint_vals.append(fv)

    # denominator (java:214-231)
    mdenom_list: list[str] = []
    if mdenom:
        if mdenom.lower() in ("count_person", "person"):
            mdenom_list.append("(Per capita)")
        else:
            denom_parts = [format_token(p) for p in mdenom.split("_") if p.strip()]
            mdenom_list.append("(As fraction of " + " ".join(denom_parts) + ")")

    # assembly (java:233-266)
    parts_out: list[str] = []
    if prefix_list:
        parts_out.append(" ".join(prefix_list))
    if measure_and_pop:
        parts_out.append(measure_and_pop)
    if mqual_list:
        parts_out.append(" ".join(mqual_list))
    base = " ".join(parts_out)
    if constraint_vals:
        base = base + ": " + ", ".join(constraint_vals) if base else ", ".join(constraint_vals)
    if mdenom_list:
        base = base + " " + " ".join(mdenom_list) if base else " ".join(mdenom_list)
    return base.strip()
