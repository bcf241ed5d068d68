"""Network-ish decoders.

``dns_wire_to_name`` decodes the Microsoft-DNS debug-log name encoding
"(3)www(6)google(3)com(0)" into "www.google.com". The reference scans
the token's tail for the wire-format name and rebuilds it label by
label (reference: miw/log_format.cc:680-716, invoked on the token tail
at :550-554). Here it is a regexp_replace chain — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dns_wire_to_name(col: Column) -> Column:
    # take the portion starting at the first "(<len>)" marker
    wire = F.regexp_extract(col, r"(\(\d+\).*)$", 1)
    # each "(N)" is a label separator; the trailing "(0)" is the root
    dotted = F.regexp_replace(wire, r"\(\d+\)", ".")
    cleaned = F.regexp_replace(F.regexp_replace(dotted, r"^\.", ""), r"\.+$", "")
    return F.when(wire == "", col).otherwise(cleaned)
