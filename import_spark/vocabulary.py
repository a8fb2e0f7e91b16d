"""Controlled vocabulary driving value/reference semantics.

A minimal re-expression of the reference's vocabulary tables
(util/.../Vocabulary.java:21-307): which value prefixes denote global
vs local references, which properties *expect* references, the ordered
priority list of resolvable external-id properties, and the property
sets that feed content-hash dcids.
"""

from __future__ import annotations

# --- value prefixes (Vocabulary.java:181-197,339-346) ---
DCID_PREFIX = "dcid:"
DC_SCHEMA_PREFIX = "dcs:"
SCHEMA_ORG_PREFIX = "schema:"
INTERNAL_REF_PREFIX = "l:"
GLOBAL_REF_PREFIXES = (DCID_PREFIX, DC_SCHEMA_PREFIX, SCHEMA_ORG_PREFIX)

# --- properties ---
TYPE_OF = "typeOf"
DCID = "dcid"
NAME = "name"
PROVENANCE = "provenance"

# StatVarObservation key properties in dcid order (DcidGenerator.java:74-83).
OBSERVATION_ABOUT = "observationAbout"
VARIABLE_MEASURED = "variableMeasured"
OBSERVATION_DATE = "observationDate"
GENERIC_VALUE = "value"
OBSERVATION_PERIOD = "observationPeriod"
UNIT = "unit"
MEASUREMENT_METHOD = "measurementMethod"
SCALING_FACTOR = "scalingFactor"

ORDERED_SVOBS_KEY_PROPS = [
    OBSERVATION_ABOUT,
    VARIABLE_MEASURED,
    OBSERVATION_DATE,
    GENERIC_VALUE,
    OBSERVATION_PERIOD,
    UNIT,
    MEASUREMENT_METHOD,
    SCALING_FACTOR,
]
LAST_REQUIRED_SVOBS_PROP_INDEX = ORDERED_SVOBS_KEY_PROPS.index(GENERIC_VALUE)

# StatVar fixed props included in the content hash (DcidGenerator.java:64-70).
FIXED_STAT_VAR_PROPS = {
    TYPE_OF,
    "populationType",
    "measuredProperty",
    "statType",
    "measurementQualifier",
    "measurementDenominator",
}
# Props excluded from StatVar constraint hashing — the full reference set
# (Vocabulary.java:244-285 NON_CONSTRAINT_STAT_VAR_PROPERTIES).
NON_CONSTRAINT_STAT_VAR_PROPS = {
    # Basic properties
    TYPE_OF,
    DCID,
    PROVENANCE,
    "isPublic",
    "localCuratorLevelId",
    "url",
    "memberOf",
    NAME,
    "label",
    "description",
    "descriptionUrl",
    "alternateName",
    "utteranceTemplate",
    "source",
    "footnote",
    "keyString",
    "resMCFFile",
    # StatPop / StatVar properties (current + past)
    "populationType",
    "populationGroup",
    "location",
    "childhoodLocation",
    "constraintProperties",
    "measuredProperty",
    "statType",
    "measurementDenominator",
    "measurementQualifier",
    "censusACSTableId",
    MEASUREMENT_METHOD,
    SCALING_FACTOR,
    UNIT,
    "isNormalizable",
    "denominatorForNormalization",
    "observationProperties",
    # Generated properties
    "definition",
    "linkedMember",
    "linkedMemberOf",
}

# Schema reference properties (Vocabulary.java:308-318).
SCHEMA_REFERENCE_PROPS = {
    TYPE_OF,
    "subClassOf",
    "subPropertyOf",
    "rangeIncludes",
    "domainIncludes",
    "specializationOf",
    "memberOf",
}
# Properties whose values are expected to be references (Vocabulary.java:319-337).
REFERENCE_PROPS = SCHEMA_REFERENCE_PROPS | {
    "location",
    VARIABLE_MEASURED,
    OBSERVATION_ABOUT,
    "observedNode",
    "containedInPlace",
    "containedIn",
    "populationType",
    "measuredProperty",
    "populationGroup",
    "constraintProperties",
    MEASUREMENT_METHOD,
    "measurementDenominator",
    "measurementQualifier",
    "statType",
    UNIT,
    "observationProperties",
}

# Ordered priority of resolvable/assignable external-id properties
# (Vocabulary.java:291-307). When an entity carries several, the first
# one in this list wins.
PLACE_RESOLVABLE_AND_ASSIGNABLE_IDS = [
    "unDataCode",
    "geoId",
    "isoCode",
    "nutsCode",
    "wikidataId",
    "geoNamesId",
    "istatId",
    "austrianMunicipalityKey",
    "indianCensusAreaCode2011",
    "indianCensusAreaCode2001",
    "lgdCode",
    "udiseCode",
    "fipsAlphaCode",
    "countryAlphaCode",
    "countryNumericCode",
]
ID_PROP_PRIORITY = {p: i for i, p in enumerate(PLACE_RESOLVABLE_AND_ASSIGNABLE_IDS)}

# dcid prefix per external-id property (DcidGenerator.forPlace,
# DcidGenerator.java:213-229: prefix is the prop name, except
# isoCode→iso and nutsCode→nuts).
def place_dcid_prefix(prop: str) -> str:
    if prop == "isoCode":
        return "iso"
    if prop == "nutsCode":
        return "nuts"
    return prop


# dcid namespaces (DcidGenerator.java:24-27).
DC_NAMESPACE = "dc/"
SVOBS_NAMESPACE = "dc/o/"
POP_NAMESPACE = "dc/p/"

# dcid sanity rules (McfChecker.java:33-49,579-603).
MAX_DCID_LENGTH = 256


def is_global_reference(val: str) -> bool:
    return val.startswith(GLOBAL_REF_PREFIXES)


def is_internal_reference(val: str) -> bool:
    return val.startswith(INTERNAL_REF_PREFIX)


def is_reference_property(prop: str) -> bool:
    return prop in REFERENCE_PROPS
