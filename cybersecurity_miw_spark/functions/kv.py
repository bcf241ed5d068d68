"""Key-value payload parsers (the reference's "preprocessing" hooks
that extend a row's schema at parse time, miw/log_format.cc:540-555).

In Spark the dynamic-schema extension becomes a MapType column —
downstream code reads ``col["key"]`` or explodes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def evtx_kv(tok: Column) -> Column:
    """'...-> k1=v1 k2=v2' → map<k,v>
    (reference pre_process_evtxcsv, miw/log_format.cc:606-644).

    Documented divergence: the reference's split-on-'=' walk drops the
    character immediately before each subsequent '=' (it expects
    "key =value" payloads with a sacrificial char before '='); this
    parser reads the canonical "k=v k=v" shape exactly, which is the
    intent the format docs describe."""
    payload = F.trim(F.regexp_extract(tok, r"->\s*(.*)$", 1))
    return F.when(payload == "", None).otherwise(
        F.str_to_map(payload, F.lit(" +"), F.lit("="))
    )


def evtx2_kv(tok: Column) -> Column:
    """'[k1: v1] [k2: v2]' → map<k,v>
    (reference pre_process_evtxcsv2, miw/log_format.cc:646-678).

    Documented divergence: the reference splits on '[' alone, so an
    unterminated '[k: v' still yields a pair and ':'-bearing text
    OUTSIDE brackets fabricates a field from its first ':' split; this
    parser extracts only well-formed '[k: v]' blocks (the payload
    shape the evtx formats document)."""
    pairs = F.regexp_extract_all(tok, F.lit(r"\[([^:\]]+):\s*([^\]]*)\]"), 0)
    entries = F.transform(
        pairs,
        lambda p: F.struct(
            F.regexp_extract(p, r"\[([^:]+):", 1).alias("key"),
            F.trim(F.regexp_extract(p, r":\s*([^\]]*)\]", 1)).alias("value"),
        ),
    )
    return F.when(F.size(entries) > 0, F.map_from_entries(entries))
