"""DcidGenerator key-construction semantics (C2/C3/C5/C6)."""

from import_spark.functions.dcids import (
    place_dcid,
    statvar_dcid,
    statvar_key_string,
    svobs_dcid,
    svobs_key_string,
)


def test_svobs_key_order_and_required():
    # ordered props, required through `value` (DcidGenerator.java:74-83)
    pvs = {
        "observationAbout": "geoId/06",
        "variableMeasured": "Count_Person",
        "observationDate": "2020",
        "value": "123",
    }
    assert (
        svobs_key_string(pvs)
        == "observationAbout=geoId/06variableMeasured=Count_PersonobservationDate=2020value=123"
    )
    assert svobs_dcid(pvs).startswith("dc/o/")
    # optional props appended in fixed order
    pvs2 = dict(pvs, unit="USDollar", measurementMethod="M")
    assert svobs_key_string(pvs2).endswith("value=123unit=USDollarmeasurementMethod=M")
    # missing required → None
    assert svobs_key_string({"observationAbout": "x"}) is None
    # unresolved local ref blocks assignment (DcidGenerator.java:200-205)
    assert svobs_key_string(dict(pvs, observationAbout="l:E1")) is None


def test_statvar_key_sorted_constraints():
    pvs = {
        "typeOf": "StatisticalVariable",
        "populationType": "Person",
        "measuredProperty": "count",
        "statType": "measuredValue",
        "age": "[Years 10 20]",  # complex → its dcid (DcidGenerator.java:160-170)
        "name": "ignored",  # non-constraint, excluded
    }
    key = statvar_key_string(pvs)
    assert key == (
        "age=Years10To20measuredProperty=countpopulationType=Person"
        "statType=measuredValuetypeOf=StatisticalVariable"
    )
    assert statvar_dcid(pvs).startswith("dc/")
    assert statvar_key_string({"age": "1"}) is None  # no typeOf → None


def test_place_dcid_priority():
    # priority order + iso prefix mapping (DcidGenerator.java:213-229)
    assert place_dcid({"isoCode": "US", "wikidataId": "Q30"}) == "iso/US"
    assert place_dcid({"wikidataId": "Q30"}) == "wikidataId/Q30"
    assert place_dcid({"geoId": "06", "isoCode": "US"}) == "geoId/06"
    assert place_dcid({}) is None
