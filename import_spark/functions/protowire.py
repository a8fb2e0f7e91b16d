"""Hand-rolled protobuf wire-format codec for the reference's
optimized-graph interchange messages.

The container ships no protobuf runtime, but the wire format itself is
public and tiny (varint tags, length-delimited submessages, 64-bit
doubles — https://protobuf.dev/programming-guides/encoding/), so the
three messages the reference exchanges over TFRecord are encoded /
decoded here directly:

- ``McfOptimizedGraph``      (reference ``util/src/main/proto/Mcf.proto:134-138``)
- ``McfStatVarObsSeries``    (``Mcf.proto:100-131``)
- ``McfGraph.PropertyValues``(``Mcf.proto:40-58``) — the free-PV payload
  each StatVarObs may carry.

Determinism: optional fields are emitted in ascending field order and
map entries sorted by key, so equal logical messages produce equal
bytes (protobuf leaves map order unspecified; sorting is a valid
serialization and makes the Spark sink reproducible).

Only the features these messages use are implemented: wire types 0
(varint), 1 (fixed64 double) and 2 (length-delimited). That is the
complete footprint of Mcf.proto's interchange subset.
"""

from __future__ import annotations

import struct
from typing import Iterator

# ValueType enum (Mcf.proto:71-96)
VT_TEXT = 1
VT_NUMBER = 2
VT_UNRESOLVED_REF = 3
VT_RESOLVED_REF = 4
VT_COMPLEX_VALUE = 5

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2


# ---------------------------------------------------------------- low level


def encode_varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64  # two's-complement, as protobuf does for int fields
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def _tag(field: int, wire_type: int) -> bytes:
    return encode_varint((field << 3) | wire_type)


def field_string(field: int, value: str) -> bytes:
    data = value.encode("utf-8")
    return _tag(field, _WT_LEN) + encode_varint(len(data)) + data


def field_bytes(field: int, data: bytes) -> bytes:
    return _tag(field, _WT_LEN) + encode_varint(len(data)) + data


def field_double(field: int, value: float) -> bytes:
    return _tag(field, _WT_FIXED64) + struct.pack("<d", value)


def field_varint(field: int, value: int) -> bytes:
    return _tag(field, _WT_VARINT) + encode_varint(value)


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_number, wire_type, raw_value) for each field in a
    message body. LEN fields yield bytes; VARINT ints; FIXED64 the raw
    8 bytes (caller unpacks)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = decode_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == _WT_VARINT:
            val, pos = decode_varint(buf, pos)
        elif wt == _WT_FIXED64:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == _WT_LEN:
            ln, pos = decode_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


# ------------------------------------------------------------- McfGraph PVs


def encode_typed_value(vtype: int, value: str) -> bytes:
    """McfGraph.TypedValue (Mcf.proto:24-31): type=1 varint, value=2 str."""
    return field_varint(1, vtype) + field_string(2, value)


def encode_property_values(pvs: dict[str, list[tuple[int, str]]]) -> bytes:
    """McfGraph.PropertyValues (Mcf.proto:40-58): map<string, Values>
    pvs = 1. A map entry is a nested message {key=1, value=2}; Values
    wraps repeated TypedValue at field 1."""
    out = bytearray()
    for prop in sorted(pvs):
        values_msg = b"".join(
            field_bytes(1, encode_typed_value(t, v)) for t, v in pvs[prop]
        )
        entry = field_string(1, prop) + field_bytes(2, values_msg)
        out += field_bytes(1, entry)
    return bytes(out)


def decode_property_values(buf: bytes) -> dict[str, list[tuple[int, str]]]:
    pvs: dict[str, list[tuple[int, str]]] = {}
    for field, _wt, entry in iter_fields(buf):
        if field != 1:
            continue
        prop, typed = "", []
        for ef, _ew, ev in iter_fields(entry):
            if ef == 1:
                prop = ev.decode("utf-8")
            elif ef == 2:
                for vf, _vw, tv in iter_fields(ev):
                    if vf != 1:
                        continue
                    vtype, val = 0, ""
                    for tf, _tw, tvv in iter_fields(tv):
                        if tf == 1:
                            vtype = tvv
                        elif tf == 2:
                            val = tvv.decode("utf-8")
                    typed.append((vtype, val))
        pvs[prop] = typed
    return pvs


# ------------------------------------------------------ McfStatVarObsSeries

# Key field numbers (Mcf.proto:119-127), in emit order.
_KEY_FIELDS = (
    "observation_about",
    "variable_measured",
    "measurement_method",
    "observation_period",
    "scaling_factor",
    "unit",
    "provenance_url",
)


def encode_series_key(key: dict[str, str | None]) -> bytes:
    """McfStatVarObsSeries.Key: required 1-2, optionals 3-7 skipped when
    empty (GraphUtils.java:301-322 sets them conditionally)."""
    out = bytearray()
    for i, name in enumerate(_KEY_FIELDS, start=1):
        v = key.get(name)
        if v:
            out += field_string(i, v)
        elif i <= 2:
            raise ValueError(f"series key requires {name}")
    return bytes(out)


def decode_series_key(buf: bytes) -> dict[str, str]:
    key = {}
    for field, _wt, val in iter_fields(buf):
        if 1 <= field <= 7:
            key[_KEY_FIELDS[field - 1]] = val.decode("utf-8")
    return key


def encode_stat_var_obs(
    date: str,
    dcid: str,
    number: float | None = None,
    text: str | None = None,
    local_node_id: str | None = None,
    pvs: dict[str, list[tuple[int, str]]] | None = None,
) -> bytes:
    """McfStatVarObsSeries.StatVarObs (Mcf.proto:101-117). oneof val:
    number=2 (double) wins when set, else text=3 — mirroring
    GraphUtils.java:332-337's parse-as-double-else-text. local_node_id
    omitted when it equals dcid (GraphUtils.java:329-331)."""
    out = bytearray(field_string(1, date))
    if number is not None:
        out += field_double(2, float(number))
    elif text is not None:
        out += field_string(3, text)
    if pvs:
        out += field_bytes(4, encode_property_values(pvs))
    out += field_string(5, dcid)
    if local_node_id and local_node_id != dcid:
        out += field_string(6, local_node_id)
    return bytes(out)


def decode_stat_var_obs(buf: bytes) -> dict:
    obs = {
        "date": "",
        "dcid": "",
        "number": None,
        "text": None,
        "local_node_id": None,
        "pvs": {},
    }
    for field, _wt, val in iter_fields(buf):
        if field == 1:
            obs["date"] = val.decode("utf-8")
        elif field == 2:
            obs["number"] = struct.unpack("<d", val)[0]
        elif field == 3:
            obs["text"] = val.decode("utf-8")
        elif field == 4:
            obs["pvs"] = decode_property_values(val)
        elif field == 5:
            obs["dcid"] = val.decode("utf-8")
        elif field == 6:
            obs["local_node_id"] = val.decode("utf-8")
    return obs


def encode_sv_obs_series(key: dict[str, str | None], obs_list: list[bytes]) -> bytes:
    """McfStatVarObsSeries: key=1, repeated sv_obs_list=2."""
    out = bytearray(field_bytes(1, encode_series_key(key)))
    for obs in obs_list:
        out += field_bytes(2, obs)
    return bytes(out)


def encode_optimized_graph(series: bytes) -> bytes:
    """McfOptimizedGraph: oneof record { sv_obs_series = 1 }."""
    return field_bytes(1, series)


def decode_optimized_graph(buf: bytes) -> tuple[dict[str, str], list[dict]]:
    """→ (key, [obs...]) of the wrapped McfStatVarObsSeries."""
    key: dict[str, str] = {}
    obs: list[dict] = []
    for field, _wt, series in iter_fields(buf):
        if field != 1:
            continue
        for sf, _sw, sval in iter_fields(series):
            if sf == 1:
                key = decode_series_key(sval)
            elif sf == 2:
                obs.append(decode_stat_var_obs(sval))
    return key, obs
