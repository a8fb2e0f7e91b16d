"""import_spark — a from-scratch, PySpark-native knowledge-graph construction engine.

Re-expresses the capabilities of datacommonsorg/import (reference at
/root/reference, cited per-module as file:line) as idiomatic Spark
DataFrame transforms:

- ``functions``  — scalar value semantics (typed-value parse, complex
  values, dates, dcid hashing) as native column expressions or
  vectorized pandas UDFs. Mirrors util/.../McfParser.java,
  ComplexValueParser.java, StringUtil.java, DcidGenerator.java.
- ``sources``    — MCF/TMCF/CSV/transcript readers and the synthetic
  transcript generator. Mirrors util/.../parser/ and PipelineUtils.java.
- ``operators``  — extract / link / resolve / canonicalize / merge /
  stats / differ plus training-data ops (dedup, similarity, text).
- ``plans``      — the end-to-end KG-construction pipeline (extract →
  link → resolve → canonicalize → materialize) with per-stage metrics
  and checkpoint/resume. Mirrors pipeline/.../GraphIngestionPipeline.java.
"""

__version__ = "0.1.0"
