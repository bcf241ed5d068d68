"""cybersecurity_miw_spark — a PySpark-native log-analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of
soprasteria/cybersecurity-miw (single-machine C++ MapReduce log
summarizer) as an idiomatic Spark DataFrame engine:

* a declarative JSON "log format" compiles to a pure-built-in DataFrame
  pipeline: tokenize -> project/derive -> match-filter -> groupBy/agg ->
  order -> sink (reference: miw/log_format.cc, miw/log_record.cc,
  miw/mr_job.cc);
* the Metis multicore MapReduce engine underneath the reference
  (metis/) is replaced wholesale by Catalyst + Tungsten — no custom
  scheduling, partitioning, combining, or sorting code;
* beyond the reference surface: large-scale training-data-pipeline
  operators (dedup, similarity search, text analysis, multimodal
  plumbing) built on the same DataFrame-first principles.

No row-at-a-time Python UDFs anywhere in the hot path: tokenization is
`regexp_extract_all`, derivations are built-in date/string/url
functions, aggregation is native hash aggregation.
"""

from cybersecurity_miw_spark.plans.logdef import Field, LogDef, MatchSpec
from cybersecurity_miw_spark.plans.compiler import compile_pipeline
from cybersecurity_miw_spark.job import MiwJob

__all__ = ["Field", "LogDef", "MatchSpec", "compile_pipeline", "MiwJob"]
__version__ = "0.1.0"
