"""P13 — lat/lng → S2 cell id, pure-math port (no s2 library in env).

Re-expresses simple/util/resolvers.py:32-66 (s2sphere
CellId.from_lat_lng().parent(level) → ``s2CellId/0x...`` dcid). The
algorithm is the public S2 geometry cell-id construction
(s2geometry.io quadrilateralized-spherical-cube): lat/lng → unit XYZ →
cube face + (u,v) → quadratic (s,t) → 30-bit (i,j) → Hilbert-curve
position via the standard 4-bit lookup tables → 64-bit id; levels
below 30 truncate to the containing parent cell.

Bit-validated against the reference's own example
(resolvers.py:33 — 38.7#-119.4 @ level 10 → 0x80982b0000000000).

Vectorized in numpy end-to-end so the pandas-UDF wrapper processes
whole Arrow batches; the per-4-bit Hilbert loop is 8 table lookups on
arrays, not per-row Python.
"""

from __future__ import annotations

import numpy as np

_LOOKUP_BITS = 4
_SWAP_MASK = 1
_INVERT_MASK = 2
_POS_TO_IJ = (
    (0, 1, 3, 2),
    (0, 2, 3, 1),
    (3, 2, 0, 1),
    (3, 1, 0, 2),
)
_POS_TO_ORIENTATION = (_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK)

_lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
_lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)


def _init_lookup_cell(level, i, j, orig_orientation, pos, orientation):
    if level == _LOOKUP_BITS:
        ij = (i << _LOOKUP_BITS) + j
        _lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = _POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup_cell(
            level,
            i + (r[index] >> 1),
            j + (r[index] & 1),
            orig_orientation,
            pos + index,
            orientation ^ _POS_TO_ORIENTATION[index],
        )


for _orient in (0, _SWAP_MASK, _INVERT_MASK, _SWAP_MASK | _INVERT_MASK):
    _init_lookup_cell(0, 0, 0, _orient, 0, _orient)


def _xyz_to_face_uv(x, y, z):
    """Unit-sphere XYZ arrays → (face, u, v) arrays."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)
    # np.select evaluates every branch; non-selected divisions by the
    # non-major axis can hit 0 — scoped-silence those spurious warnings
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,  # face 5
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,  # face 5
        )
    return face, u, v


def _uv_to_st(u):
    """S2's quadratic projection (S2Coords ST_from_UV)."""
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_ij(s):
    return np.clip((np.floor(s * (1 << 30))).astype(np.int64), 0, (1 << 30) - 1)


def s2_cell_id_batch(lat_deg, lng_deg, level: int = 30) -> np.ndarray:
    """Vectorized lat/lng (degrees) → uint64 S2 cell ids at ``level``."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    x = cos_lat * np.cos(lng)
    y = cos_lat * np.sin(lng)
    z = np.sin(lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u)).astype(np.uint64)
    j = _st_to_ij(_uv_to_st(v)).astype(np.uint64)

    n = face.astype(np.uint64) << np.uint64(60)
    bits = (face.astype(np.uint64) & np.uint64(_SWAP_MASK)).copy()
    mask = np.uint64((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        shift = np.uint64(k * _LOOKUP_BITS)
        bits += ((i >> shift) & mask) << np.uint64(_LOOKUP_BITS + 2)
        bits += ((j >> shift) & mask) << np.uint64(2)
        bits = _lookup_pos[bits]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * _LOOKUP_BITS)
        bits &= np.uint64(_SWAP_MASK | _INVERT_MASK)
    cell = n * np.uint64(2) + np.uint64(1)  # level-30 leaf id
    if level < 30:
        lsb = np.uint64(1) << np.uint64(2 * (30 - level))
        cell = (cell & (~(lsb - np.uint64(1)))) | lsb
    return cell


def s2_cell_id(lat: float, lng: float, level: int = 30) -> int:
    return int(s2_cell_id_batch(np.array([lat]), np.array([lng]), level)[0])


def s2_cell_dcid(lat: float, lng: float, level: int = 30) -> str:
    """``s2CellId/0x...`` dcid (resolvers.py:60-66 format, 16 hex digits)."""
    return "s2CellId/{0:#0{1}x}".format(s2_cell_id(lat, lng, level), 18)


def s2_cell_level(cell_id: int) -> int:
    """Level of a valid cell id (position of the trailing lsb)."""
    lsb = cell_id & (~cell_id + 1)
    return 30 - (lsb.bit_length() - 1) // 2


def pandas_s2_cell_dcid(lat, lng, level: int = 30):
    """pandas-Series wrapper for use in vectorized UDFs."""
    import pandas as pd

    ids = s2_cell_id_batch(lat.values, lng.values, level)
    return pd.Series(["s2CellId/{0:#0{1}x}".format(int(c), 18) for c in ids], index=lat.index)
