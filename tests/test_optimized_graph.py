"""Optimized-graph proto interchange: wire-format golden bytes
(hand-assembled from the public protobuf encoding spec) + Spark
series-group → TFRecord → decode roundtrip.

Reference semantics: util/src/main/proto/Mcf.proto:100-138,
util/.../GraphUtils.java:287-360 (assemble), :217-277 (flatten).
"""

from __future__ import annotations

import struct

import pytest

from import_spark.functions import protowire as pw


def _le_double(v: float) -> bytes:
    return struct.pack("<d", v)


class TestWireGolden:
    def test_varint_spec_vectors(self):
        # From the protobuf encoding doc: 1 → 0x01, 150 → 0x96 0x01.
        assert pw.encode_varint(1) == b"\x01"
        assert pw.encode_varint(150) == b"\x96\x01"
        assert pw.decode_varint(b"\x96\x01", 0) == (150, 2)

    def test_stat_var_obs_golden_bytes(self):
        # StatVarObs{date:"2020", number:39.5, dcid:"dc/o/abc"}
        got = pw.encode_stat_var_obs(date="2020", dcid="dc/o/abc", number=39.5)
        want = (
            b"\x0a\x042020"          # field 1 (date), LEN 4
            + b"\x11" + _le_double(39.5)  # field 2 (number), I64
            + b"\x2a\x08dc/o/abc"    # field 5 (dcid), LEN 8
        )
        assert got == want

    def test_text_oneof_and_local_node_id(self):
        got = pw.encode_stat_var_obs(
            date="2021", dcid="dc/o/x", text="NA", local_node_id="SVO_row_7"
        )
        want = (
            b"\x0a\x042021"
            + b"\x1a\x02NA"          # field 3 (text)
            + b"\x2a\x06dc/o/x"
            + b"\x32\x09SVO_row_7"   # field 6 (local_node_id)
        )
        assert got == want

    def test_series_and_graph_nesting(self):
        key = {"observation_about": "geoId/06", "variable_measured": "Count_Person"}
        key_bytes = pw.encode_series_key(key)
        assert key_bytes == b"\x0a\x08geoId/06" + b"\x12\x0cCount_Person"
        obs = pw.encode_stat_var_obs(date="2020", dcid="d", number=1.0)
        series = pw.encode_sv_obs_series(key, [obs])
        want_series = (
            b"\x0a" + bytes([len(key_bytes)]) + key_bytes
            + b"\x12" + bytes([len(obs)]) + obs
        )
        assert series == want_series
        graph = pw.encode_optimized_graph(series)
        assert graph == b"\x0a" + bytes([len(series)]) + series

    def test_key_optionals_skipped_and_required_enforced(self):
        key = {
            "observation_about": "a",
            "variable_measured": "v",
            "unit": "USD",  # field 6
        }
        assert pw.encode_series_key(key) == b"\x0a\x01a\x12\x01v\x32\x03USD"
        with pytest.raises(ValueError):
            pw.encode_series_key({"observation_about": "a"})

    def test_property_values_map_roundtrip_sorted(self):
        pvs = {"b": [(pw.VT_TEXT, "x")], "a": [(pw.VT_RESOLVED_REF, "dc/y")]}
        buf = pw.encode_property_values(pvs)
        # deterministic: keys emitted sorted
        assert buf == pw.encode_property_values(dict(reversed(list(pvs.items()))))
        assert pw.decode_property_values(buf) == {
            "a": [(pw.VT_RESOLVED_REF, "dc/y")],
            "b": [(pw.VT_TEXT, "x")],
        }

    def test_decode_optimized_graph(self):
        key = {"observation_about": "geoId/06", "variable_measured": "Count_Person",
               "unit": "USD"}
        obs = [
            pw.encode_stat_var_obs(date="2020", dcid="o1", number=7.25),
            pw.encode_stat_var_obs(date="2021", dcid="o2", text="--",
                                   local_node_id="n/E1/bad_id_style"),
        ]
        k, lst = pw.decode_optimized_graph(
            pw.encode_optimized_graph(pw.encode_sv_obs_series(key, obs))
        )
        assert k == key
        assert [o["date"] for o in lst] == ["2020", "2021"]
        assert lst[0]["number"] == 7.25 and lst[0]["text"] is None
        assert lst[1]["text"] == "--" and lst[1]["number"] is None
        assert lst[1]["local_node_id"] == "n/E1/bad_id_style"


class TestSparkRoundtrip:
    def test_export_read_roundtrip(self, spark, tmp_path):
        rows = [
            # one series, two dates; numeric values
            ("geoId/06", "Count_Person", None, None, None, None, "http://x",
             "2020", "39.5", "dc/o/1", "dc/o/1", None),
            ("geoId/06", "Count_Person", None, None, None, None, "http://x",
             "2021", "39.2", "dc/o/2", "SomeTable/E1/R2", None),
            # second series: text value + free PV + keyString dropped
            ("geoId/07", "Count_Farm", "CensusACS", "P1Y", None, "Acre", None,
             "2020", "NA", "dc/o/3", "localFarmNode", {"memberOf": "dc/g/x",
                                                        "keyString": "drop-me"}),
        ]
        obs = spark.createDataFrame(
            rows,
            "observation_about string, variable_measured string,"
            " measurement_method string, observation_period string,"
            " scaling_factor string, unit string, provenance_url string,"
            " date string, value string, dcid string, local_node_id string,"
            " pvs map<string,string>",
        )
        from import_spark.operators.optimized_graph import (
            export_optimized_graph,
            read_optimized_graph,
        )

        out = str(tmp_path / "opt_graph")
        export_optimized_graph(obs, out)
        back = read_optimized_graph(spark, out)
        got = {
            (r.observation_about, r.variable_measured, r.date, r.value,
             r.dcid, r.local_node_id, r.unit,
             tuple(sorted(r.pvs.items())) if r.pvs else None)
            for r in back.collect()
        }
        want = {
            ("geoId/06", "Count_Person", "2020", "39.5", "dc/o/1", "dc/o/1",
             None, None),
            # generated-pattern local id elided → reads back as dcid
            ("geoId/06", "Count_Person", "2021", "39.2", "dc/o/2", "dc/o/2",
             None, None),
            ("geoId/07", "Count_Farm", "2020", "NA", "dc/o/3", "localFarmNode",
             "Acre", (("memberOf", "dc/g/x"),)),
        }
        assert got == want
        # numbers survive exactly; text rows carry null value_number
        nums = {r.dcid: r.value_number for r in back.collect()}
        assert nums["dc/o/1"] == 39.5 and nums["dc/o/3"] is None
        # one TFRecord payload per series
        from import_spark.sources.tfrecord import read_tfrecords

        assert read_tfrecords(spark, out).count() == 2

    def test_series_payload_bytes_deterministic(self, spark):
        from import_spark.operators.optimized_graph import to_optimized_graph

        rows = [("p", "v", None, None, None, None, None, d, str(i), f"o{i}")
                for i, d in enumerate(["2020", "2018", "2019"])]
        schema = ("observation_about string, variable_measured string,"
                  " measurement_method string, observation_period string,"
                  " scaling_factor string, unit string, provenance_url string,"
                  " date string, value string, dcid string")
        a = to_optimized_graph(spark.createDataFrame(rows, schema)).collect()
        b = to_optimized_graph(
            spark.createDataFrame(list(reversed(rows)), schema).repartition(7)
        ).collect()
        assert len(a) == len(b) == 1
        assert bytes(a[0].payload) == bytes(b[0].payload)
        # dates come back sorted (reference sorts series by date)
        k, lst = pw.decode_optimized_graph(bytes(a[0].payload))
        assert [o["date"] for o in lst] == ["2018", "2019", "2020"]
