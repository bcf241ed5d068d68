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


def ip4_to_long(col: Column) -> Column:
    """Dotted-quad IPv4 → unsigned 32-bit value in a long. Strictly
    validated: exactly four 0-255 decimal octets (no leading-garbage,
    no hex, no IPv6) — anything else → NULL. Pure JVM split/cast
    arithmetic, codegen-friendly; the building block for CIDR
    containment and range joins against blocklists."""
    octet = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
    valid = F.regexp_extract(
        col, rf"^{octet}\.{octet}\.{octet}\.{octet}$", 0
    ) != ""
    parts = F.split(col, r"\.")
    val = (
        F.element_at(parts, 1).cast("long") * 16777216
        + F.element_at(parts, 2).cast("long") * 65536
        + F.element_at(parts, 3).cast("long") * 256
        + F.element_at(parts, 4).cast("long")
    )
    return F.when(valid, val)


def long_to_ip4(col: Column) -> Column:
    """Inverse of :func:`ip4_to_long` for in-range values; NULL
    outside [0, 2^32)."""
    ok = (col >= 0) & (col < 4294967296)
    dotted = F.concat_ws(
        ".",
        (col / 16777216).cast("long") % 256,
        (col / 65536).cast("long") % 256,
        (col / 256).cast("long") % 256,
        col % 256,
    )
    return F.when(ok, dotted)


def cidr_contains(cidr: str, ip_col: Column) -> Column:
    """True when ``ip_col`` (dotted-quad string) falls inside the
    STATIC ``cidr`` block ("10.0.0.0/8"). The mask math happens once
    in Python (the cidr is configuration, not data); the per-row work
    is one ip4_to_long + a compare against two literals — a narrow
    filter that pushes into the scan stage. Invalid IPs → false
    (NULL-safe). Raises on a malformed cidr string."""
    import re as _re

    m = _re.fullmatch(r"(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})/(\d{1,2})", cidr)
    if not m:
        raise ValueError(f"malformed CIDR: {cidr!r}")
    o = [int(x) for x in m.group(1, 2, 3, 4)]
    bits = int(m.group(5))
    if max(o) > 255 or bits > 32:
        raise ValueError(f"malformed CIDR: {cidr!r}")
    base = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
    mask = 0 if bits == 0 else (~((1 << (32 - bits)) - 1)) & 0xFFFFFFFF
    lo = base & mask
    hi = lo | (~mask & 0xFFFFFFFF)
    v = ip4_to_long(ip_col)
    return F.coalesce((v >= lo) & (v <= hi), F.lit(False))


def cidr_match_any(cidrs: list[str], ip_col: Column) -> Column:
    """Membership in ANY of a blocklist of CIDR blocks — an OR chain
    of literal range compares over ONE shared ip4_to_long (Catalyst
    collapses the common subexpression). For blocklists beyond a few
    hundred entries, switch to the range-join shape: convert blocks
    to [lo, hi] rows and use operators/timeseries.range_join on the
    integer ip instead of a per-row OR chain."""
    if not cidrs:
        return F.lit(False)
    test = cidr_contains(cidrs[0], ip_col)
    for c in cidrs[1:]:
        test = test | cidr_contains(c, ip_col)
    return test
