"""StatVarGroups cache blob vs the reference's own goldens
(simple/tests/stats/svg_cache_test.py + test_data/cache fixtures).

The textproto goldens' top-level entry order is the protobuf map's
internal hash order — explicitly unspecified by the wire format — so
the comparison canonicalizes both sides to a sorted multiset of
``stat_var_groups { ... }`` blocks; every block (key, field order,
repeated order, values) must match exactly.
"""

import json
import os

import pandas as pd
import pytest

from import_spark.operators.svg_cache import (
    base64_decode_and_gunzip,
    build_svg_cache,
    gzip_and_base64_encode,
    stat_var_groups_bytes,
    svg_cache_blob,
    svg_cache_from_triples,
    to_textproto,
    SvgNode,
)

CACHE_DATA = "/root/reference/simple/tests/stats/test_data/cache"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CACHE_DATA), reason="reference cache fixtures not present"
)


def _rows(path):
    pdf = pd.read_csv(path, keep_default_na=False)
    return list(
        pdf[["subject_id", "predicate", "object_id", "object_value"]].itertuples(
            index=False, name=None
        )
    )


def _blocks(text):
    """Split a textproto into top-level blocks for order-insensitive
    comparison."""
    blocks, cur = [], []
    for line in text.splitlines():
        cur.append(line)
        if line == "}":
            blocks.append("\n".join(cur))
            cur = []
    assert not cur, f"trailing unterminated block: {cur}"
    return sorted(blocks)


@pytest.mark.parametrize(
    "name", ["svg_cache_basic", "svg_cache_with_specialized_names"]
)
def test_svg_cache_textproto_golden(name):
    d = os.path.join(CACHE_DATA, "input", name)
    spec_path = os.path.join(d, "specialized_names.json")
    spec = json.load(open(spec_path)) if os.path.exists(spec_path) else {}
    nodes = build_svg_cache(
        _rows(os.path.join(d, "svg_triples.csv")),
        _rows(os.path.join(d, "sv_triples.csv")),
        spec,
    )
    got = to_textproto(nodes)
    with open(
        os.path.join(CACHE_DATA, "expected", name, "svg_cache.textproto")
    ) as f:
        want = f.read()
    assert _blocks(got) == _blocks(want)


def test_encode_decode_byte_exact():
    """svg_cache_test.test_encode_decode: the single-entry proto
    {svg1: {absolute_name: SVG1}} must serialize + gzip(mtime=0) +
    base64 to the exact reference string."""
    nodes = {"svg1": SvgNode(absolute_name="SVG1")}
    data = stat_var_groups_bytes(nodes)
    expected = "H4sIAAAAAAAC/+Pi42IpLks3FGLjYgkOczcEAFH0/f4QAAAA"
    assert gzip_and_base64_encode(data) == expected
    assert base64_decode_and_gunzip(expected) == data
    key, blob = svg_cache_blob(nodes)
    assert key == "StatVarGroups" and blob == expected


def test_svg_cache_from_triples_spark(spark):
    """The Spark surface: one mixed triple table split by subject type
    (runner-shaped, svg_cache.py:36-45) folds to the same nodes as the
    direct row fold."""
    d = os.path.join(CACHE_DATA, "input", "svg_cache_basic")
    svg = pd.read_csv(os.path.join(d, "svg_triples.csv"), keep_default_na=False)
    sv = pd.read_csv(os.path.join(d, "sv_triples.csv"), keep_default_na=False)
    pdf = pd.concat([svg, sv], ignore_index=True)
    pdf["_idx"] = range(len(pdf))
    t = spark.createDataFrame(pdf)
    nodes = svg_cache_from_triples(t, order_col="_idx")
    want = build_svg_cache(
        list(svg[["subject_id", "predicate", "object_id", "object_value"]].itertuples(index=False, name=None)),
        list(sv[["subject_id", "predicate", "object_id", "object_value"]].itertuples(index=False, name=None)),
    )
    assert to_textproto(nodes) == to_textproto(want)


def test_snapshot_at_member_of_time():
    """protobuf repeated-append copies: a name triple AFTER memberOf
    must not mutate the already-attached child."""
    svg_rows = [("g1", "typeOf", "StatVarGroup", "")]
    sv_rows = [
        ("sv1", "name", "", "early"),
        ("sv1", "memberOf", "g1", ""),
        ("sv1", "name", "", "late"),
    ]
    nodes = build_svg_cache(svg_rows, sv_rows)
    attached = nodes["g1"].child_stat_vars[0]
    assert attached.display_name == "early"
    assert attached.search_names == ["early"]
