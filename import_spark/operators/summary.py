"""A12 — SV / place-series summary reports (reference
SummaryReportGenerator.java:30-223, CSVReportWriter.java:31-56,
PlaceSeriesSummary.java, StatChecker.java:131-171,275-281).

Two aggregates over a flat StatVarObservation relation:

- **StatVar summary** (one row per variableMeasured): observation
  count, distinct-place count, min/max value, distinct dates (count +
  first/last), distinct measurementMethods/units/scalingFactors/
  observationPeriods — the exact column set of the reference's
  ``summary_report.csv``.
- **Place series summary** (one row per (place, variable, facet)):
  the date-ordered series values — PlaceSeriesSummary's
  ``seriesDates/seriesValues`` pairing.

Plus ``svobs_from_triples`` to pivot the engine's long-form statement
table into that flat relation (one groupBy on subject), and a writer
emitting ``summary_report.csv`` + ``summary_report.json`` (charts are
presentation-layer and out of scope — the data series in the JSON is
what the reference's SVG charts plot).

Everything is plain groupBy/collect_set aggregation: map-side partial
aggregation keeps the shuffle proportional to group count, and the
summaries are metadata-sized regardless of observation count.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUMMARY_REPORT_CSV = "summary_report.csv"
SUMMARY_REPORT_JSON = "summary_report.json"

_OPTIONAL = ["measurementMethod", "unit", "scalingFactor", "observationPeriod"]


def svobs_from_triples(triples: DataFrame) -> DataFrame:
    """Long-form statements (subj/pred/obj or node_id/prop/value) →
    flat SVObs relation. One conditional-agg groupBy per subject."""
    cols = triples.columns
    s, p, o = (
        ("subj", "pred", "obj") if "subj" in cols else ("node_id", "prop", "value")
    )
    want = ["typeOf", "variableMeasured", "observationAbout", "observationDate", "value"] + _OPTIONAL
    rows = triples.filter(F.col(p).isin(*want))

    def fst(prop):
        return F.min(F.when(F.col(p) == prop, F.col(o))).alias(prop)

    flat = rows.groupBy(F.col(s).alias("svobs_id")).agg(
        *[fst(x) for x in want]
    )
    return (
        flat.filter(F.col("typeOf") == "StatVarObservation")
        .drop("typeOf")
        # try_cast: non-numeric observation values (quarantined upstream
        # or deliberately textual) become NULL instead of an ANSI error
        .withColumn("value", F.expr("try_cast(value AS double)"))
    )


def statvar_summary(svobs: DataFrame) -> DataFrame:
    """Per-SV rollup — the summary_report.csv record
    (CSVReportWriter.java:40-52)."""
    cols = set(svobs.columns)
    opt = [
        F.sort_array(F.collect_set(c)).alias(f"{c}s")
        if c in cols
        else F.array().cast("array<string>").alias(f"{c}s")
        for c in _OPTIONAL
    ]
    return svobs.groupBy(F.col("variableMeasured").alias("stat_var")).agg(
        F.countDistinct("observationAbout").alias("num_places"),
        F.count("*").alias("num_observations"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("observationDate").alias("num_dates"),
        F.min("observationDate").alias("min_date"),
        F.max("observationDate").alias("max_date"),
        *opt,
    )


def place_series_summary(svobs: DataFrame) -> DataFrame:
    """Per-(place, variable[, facet]) date-ordered series
    (PlaceSeriesSummary.java seriesDates/seriesValues)."""
    cols = set(svobs.columns)
    facet = [c for c in _OPTIONAL if c in cols]
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col("observationDate").alias("date"), F.col("value")))
    )
    return (
        svobs.groupBy(
            F.col("observationAbout").alias("place"),
            F.col("variableMeasured").alias("stat_var"),
            *facet,
        )
        .agg(pairs.alias("series"))
        .select(
            "place",
            "stat_var",
            *facet,
            F.transform("series", lambda x: x["date"]).alias("series_dates"),
            F.transform("series", lambda x: x["value"]).alias("series_values"),
        )
    )


# CSVReportWriter.ReportHeaders (CSVReportWriter.java:16-29) — exact
# enum names, including the lower-case `observationPeriods` oddity
_CSV_HEADERS = [
    "StatVar", "NumPlaces", "NumObservations", "MinValue", "MaxValue",
    "NumObservationsDates", "MinDate", "MaxDate", "MeasurementMethods",
    "Units", "ScalingFactors", "observationPeriods",
]


def _jdouble(v) -> str:
    """Java Double.toString twin for the summary's min/max cells —
    locked to CSVReportWriterTest's vectors (10.0, 5.0, NaN); values a
    string-valued obs column carries pass through untouched."""
    if v is None:
        return "NaN"
    try:
        f = float(v)
    except (TypeError, ValueError):
        return str(v)
    if f != f:
        return "NaN"
    if f == int(f) and abs(f) < 1e7:
        return f"{int(f)}.0"
    return repr(f)


def _jcsv(field: str) -> str:
    """commons-csv CSVFormat.DEFAULT quoting: quote only fields that
    carry a comma, quote, CR or LF; embedded quotes double."""
    if any(c in field for c in ',"\r\n'):
        return '"' + field.replace('"', '""') + '"'
    return field


def summary_csv(rows: list[dict]) -> str:
    """The summary_report.csv byte format (CSVReportWriter.java:31-58,
    bit-exact vs CSVReportWriterTest.EXPECTED_FILESTREAM): \\r\\n
    records, Java double rendering for min/max, ``[a, b]``
    Set.toString lists (order pinned by statvar_summary's sort_array —
    the reference's Set order is unspecified), empty date bounds as
    empty strings."""
    jset = lambda xs: "[" + ", ".join(xs or []) + "]"  # noqa: E731
    out = [",".join(_CSV_HEADERS)]
    for r in rows:
        out.append(
            ",".join(
                _jcsv(str(x))
                for x in [
                    r["stat_var"], r["num_places"], r["num_observations"],
                    _jdouble(r["min_value"]), _jdouble(r["max_value"]),
                    r["num_dates"],
                    (r["min_date"] or "") if r["num_dates"] else "",
                    (r["max_date"] or "") if r["num_dates"] else "",
                    jset(r["measurementMethods"]), jset(r["units"]),
                    jset(r["scalingFactors"]), jset(r["observationPeriods"]),
                ]
            )
        )
    return "\r\n".join(out) + "\r\n"


def write_summary_report(
    svobs: DataFrame, out_dir: str, max_series: int = 10_000
) -> dict:
    """summary_report.csv (SV rollup) + summary_report.json (rollup +
    capped place series) — SummaryReportGenerator.generateReportSummary."""
    os.makedirs(out_dir, exist_ok=True)
    sv = statvar_summary(svobs)
    rows = [r.asDict() for r in sv.orderBy("stat_var").collect()]
    with open(os.path.join(out_dir, SUMMARY_REPORT_CSV), "w", newline="") as f:
        f.write(summary_csv(rows))
    series = [
        r.asDict()
        for r in place_series_summary(svobs).orderBy("place", "stat_var").limit(max_series).collect()
    ]
    report = {"statVarSummary": rows, "placeSeriesSummary": series}
    with open(os.path.join(out_dir, SUMMARY_REPORT_JSON), "w") as f:
        json.dump(report, f, indent=1, default=str)
    write_summary_html(report, out_dir)
    return report


SUMMARY_REPORT_HTML = "summary_report.html"


def _svg_sparkline(values: list[float], width: int = 360, height: int = 80) -> str:
    """Inline SVG polyline for a value series — the self-contained
    stand-in for the reference's per-series charts (SummaryReport.ftl
    renders charts client-side; this keeps the artifact dependency-free)."""
    vals = [v for v in values if v is not None]
    if len(vals) < 2:
        return ""
    lo, hi = min(vals), max(vals)
    span = (hi - lo) or 1.0
    pts = " ".join(
        f"{round(i * width / (len(vals) - 1), 1)},{round(height - (v - lo) / span * (height - 8) - 4, 1)}"
        for i, v in enumerate(vals)
    )
    return (
        f'<svg width="{width}" height="{height}" role="img">'
        f'<polyline fill="none" stroke="#1a73e8" stroke-width="1.5" points="{pts}"/></svg>'
    )


def _esc(x) -> str:
    return (
        str(x)
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def write_summary_html(
    report: dict, out_dir: str, level_summary: dict | None = None
) -> str:
    """``summary_report.html`` — the reference's
    SummaryReportGenerator.java:33,195-211 artifact (SummaryReport.ftl
    structure: TOC, counters by level, StatVar summary table, per-place
    series sections with charts), rendered as self-contained static
    HTML with inline-SVG series charts instead of CDN-loaded
    client-side libraries."""
    os.makedirs(out_dir, exist_ok=True)
    parts = [
        "<html><head><title>Summary Report</title><style>",
        "table,td,th{border:1px solid black;border-collapse:collapse;padding:5px;}",
        "td,th{max-width:25rem;word-wrap:break-word;vertical-align:top;}",
        "tbody tr:hover{background-color:#ccc;}",
        "</style></head><body>",
        '<a name="top"></a><h1>Summary Report</h1>',
        "<h3>Table of Contents</h3><ul>",
        '<li><a href="#counters">Counters</a></li>',
        '<li><a href="#sv-summary">StatVar Summary</a></li>',
        '<li><a href="#place-series">Place Series Summaries</a></li>',
        "</ul>",
        '<h2 id="counters">Counters</h2>',
    ]
    for level in sorted((level_summary or {}).keys()):
        counters = (level_summary or {})[level].get("counters", {})
        parts.append(f"<h4>{_esc(level)}</h4><table><tr><th>Counter</th><th>Count</th></tr>")
        for k in sorted(counters):
            parts.append(f"<tr><td>{_esc(k)}</td><td>{_esc(counters[k])}</td></tr>")
        parts.append("</table>")
    parts.append('<h2 id="sv-summary">StatVar Summary</h2><table><tr>')
    sv_cols = [
        ("stat_var", "StatVar"), ("num_places", "NumPlaces"),
        ("num_observations", "NumObservations"), ("min_value", "MinValue"),
        ("max_value", "MaxValue"), ("num_dates", "NumUniqueDates"),
        ("min_date", "MinDate"), ("max_date", "MaxDate"),
        ("measurementMethods", "MeasurementMethods"), ("units", "Units"),
        ("scalingFactors", "ScalingFactors"), ("observationPeriods", "ObservationPeriods"),
    ]
    parts.append("".join(f"<th>{h}</th>" for _, h in sv_cols) + "</tr>")
    for r in report.get("statVarSummary", []):
        parts.append(
            "<tr>" + "".join(f"<td>{_esc(r.get(c, ''))}</td>" for c, _ in sv_cols) + "</tr>"
        )
    parts.append("</table>")
    parts.append('<h2 id="place-series">Place Series Summaries</h2>')
    for s in report.get("placeSeriesSummary", []):
        title = f"{s.get('place', '')} — {s.get('stat_var', '')}"
        dates = s.get("series_dates") or []
        values = s.get("series_values") or []
        parts.append(f"<details><summary>{_esc(title)}</summary>")
        try:
            parts.append(_svg_sparkline([float(v) for v in values]))
        except (TypeError, ValueError):
            pass
        parts.append("<table><tr><th>Date</th><th>Value</th></tr>")
        for d, v in zip(dates, values):
            parts.append(f"<tr><td>{_esc(d)}</td><td>{_esc(v)}</td></tr>")
        parts.append("</table></details>")
    parts.append('<a href="#top">Go to Top</a></body></html>')
    path = os.path.join(out_dir, SUMMARY_REPORT_HTML)
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path
