"""URL parsing + re-templating.

The reference parses a URL token into scheme/host/port/path/query/
fragment and substitutes the pieces into a ``url_format`` template like
"%scheme://%host%port%path" (reference: miw/log_format.cc:473-500;
template default miw/log_definition.proto:54). Spark's built-in
``parse_url`` supplies every component; ``%port`` renders as ":<port>"
only when a port is present (miw/log_format.cc:491-493).

Rows whose token has an empty scheme, or that contain "://[" (IPv6
literal the reference's parser chokes on), pass through unchanged
(miw/log_format.cc:481-484).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_PART_RE = re.compile(r"%(scheme|host|port|path|query|fragment)")


def _component(raw: Column, part: str) -> Column:
    if part == "scheme":
        return F.coalesce(F.parse_url(raw, F.lit("PROTOCOL")), F.lit(""))
    if part == "port":
        # ":<port>" only if present
        p = F.regexp_extract(raw, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:(\d+)", 1)
        return F.when(p == "", F.lit("")).otherwise(F.concat(F.lit(":"), p))
    name = {"host": "HOST", "path": "PATH", "query": "QUERY", "fragment": "REF"}[part]
    out = F.coalesce(F.parse_url(raw, F.lit(name)), F.lit(""))
    if part == "query":
        return F.when(out == "", out).otherwise(F.concat(F.lit("?"), out))
    if part == "fragment":
        return F.when(out == "", out).otherwise(F.concat(F.lit("#"), out))
    return out


def url_template(raw: Column, template: str) -> Column:
    """Rebuild a URL column according to a %scheme/%host/... template."""
    pieces: list[Column] = []
    pos = 0
    for m in _PART_RE.finditer(template):
        if m.start() > pos:
            pieces.append(F.lit(template[pos : m.start()]))
        pieces.append(_component(raw, m.group(1)))
        pos = m.end()
    if pos < len(template):
        pieces.append(F.lit(template[pos:]))
    composed = F.concat(*pieces) if pieces else F.lit(template)
    skip = (_component(raw, "scheme") == "") | raw.contains("://[")
    return F.when(skip, raw).otherwise(composed)
