"""Complex-value parsing: Quantity / QuantityRange / GeoCoordinates.

Re-expresses ComplexValueParser.java:23-344 (reference): bracketed
values ``[<unit> <val>]``, ``[<unit> <start> <end>]`` (either end may
be ``-`` for open ranges), and ``[LatLong <lat> <lng>]`` (unit may come
first or last; lat/lng accept N/S/E/W suffixes; E5 rounding for the
dcid, ComplexValueParser.java:287-344).

Pure deterministic Python — used inside vectorized pandas UDFs and by
the oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from import_spark.functions.values import is_number, split_and_strip

LAT_AND_LONG = "LatLong"
GEO_DCID_PREFIX = "latLong"


@dataclass
class ComplexValue:
    dcid: str
    name: str
    type_of: str  # Quantity | QuantityRange | GeoCoordinates
    # child-node property/values (long form), e.g. value/startValue/endValue/
    # unit/latitude/longitude — each (prop, value_type, value)
    pvs: list[tuple[str, str, str]] = field(default_factory=list)


def _parse_latlng(lat_str: str, lng_str: str) -> tuple[str, str] | None:
    ls = lat_str
    if ls.upper().endswith("N"):
        ls = ls[:-1]
    elif ls.upper().endswith("S"):
        ls = "-" + ls[:-1]
    try:
        lat = float(ls)
    except ValueError:
        return None
    if lat < -90.0 or lat > 90.0:
        return None
    gs = lng_str
    if gs.upper().endswith("E"):
        gs = gs[:-1]
    elif gs.upper().endswith("W"):
        gs = "-" + gs[:-1]
    try:
        lng = float(gs)
    except ValueError:
        return None
    if lng < -180.0 or lng > 180.0:
        return None
    # E5 resolution, round-half-away-from-zero like Java Math.round on the
    # scaled value (Math.round rounds half-up toward +inf).
    import math

    lat_e5 = math.floor(1e5 * lat + 0.5)
    lng_e5 = math.floor(1e5 * lng + 0.5)
    dcid = f"{GEO_DCID_PREFIX}/{lat_e5}_{lng_e5}"
    name = f"{lat_e5 / 1e5:.5f},{lng_e5 / 1e5:.5f}"
    return dcid, name


def parse_complex_value(value: str) -> ComplexValue | None:
    """Parse a bracketed complex value; None on any malformation."""
    if not (value.startswith("[") and value.endswith("]")):
        return None
    fields_ = split_and_strip(value[1:-1], delimiter=" ", strip_enclosing_quotes=False)
    if fields_ is None or len(fields_) not in (2, 3):
        return None

    is_range = len(fields_) == 3
    first = fields_[0]
    # Unit position: number-or-dash first means unit is last.
    if first and (first[0] == "-" or first[0].isdigit()):
        unit = fields_[-1]
        vals = fields_[:-1]
    else:
        unit = fields_[0]
        vals = fields_[1:]
    # Strip any namespace prefix from the unit (ComplexValueParser.java:142-147:
    # everything up to and including the first ':' is cut, so '[dcs:Years 10]'
    # behaves exactly like '[Years 10]').
    if ":" in unit:
        unit = unit.split(":", 1)[1]

    if not is_range:
        v = vals[0]
        if not is_number(v):
            return None
        return ComplexValue(
            dcid=f"{unit}{v}",
            name=f"{unit} {v}",
            type_of="Quantity",
            pvs=[("value", "NUMBER", v), ("unitOfMeasure", "RESOLVED_REF", unit)],
        )

    start, end = vals[0], vals[1]
    if unit.lower() == LAT_AND_LONG.lower():
        r = _parse_latlng(start, end)
        if r is None:
            return None
        dcid, name = r
        return ComplexValue(
            dcid=dcid,
            name=name,
            type_of="GeoCoordinates",
            pvs=[("latitude", "TEXT", start), ("longitude", "TEXT", end)],
        )

    if not (is_number(start) or start == "-"):
        return None
    if not (is_number(end) or end == "-"):
        return None
    if start == "-" and end == "-":
        return None
    if start == "-":
        dcid, name = f"{unit}Upto{end}", f"{unit} UpTo {end}"
    elif end == "-":
        dcid, name = f"{unit}{start}Onwards", f"{unit} {start} Onwards"
    else:
        dcid, name = f"{unit}{start}To{end}", f"{unit} {start} To {end}"
    return ComplexValue(
        dcid=dcid,
        name=name,
        type_of="QuantityRange",
        pvs=[
            ("startValue", "TEXT" if start == "-" else "NUMBER", start),
            ("endValue", "TEXT" if end == "-" else "NUMBER", end),
            ("unit", "RESOLVED_REF", unit),
        ],
    )
