"""Scalar column helpers — all JVM-side built-ins, no Python UDFs."""

from cybersecurity_miw_spark.functions.strings import (
    strip_quotes,
    chomp,
    contains_any,
    token_pattern,
)
from cybersecurity_miw_spark.functions.datetime import (
    strptime_to_java,
    parse_date,
    bucket_date,
    bucket_time,
)
from cybersecurity_miw_spark.functions.url import url_template
from cybersecurity_miw_spark.functions.net import dns_wire_to_name

__all__ = [
    "strip_quotes",
    "chomp",
    "contains_any",
    "token_pattern",
    "strptime_to_java",
    "parse_date",
    "bucket_date",
    "bucket_time",
    "url_template",
    "dns_wire_to_name",
]
