"""Column-name quoting: reference formats carry field names with
dots (`H.323 message`, firewall_checkpoint.json) which Spark would
otherwise parse as struct access."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """F.col that treats the whole name literally (backtick-quoted)."""
    return F.col("`" + name.replace("`", "``") + "`")


def staged_expr(col: Column) -> Column:
    """Identity wrapper that marks an expensive expression
    nondeterministic so Catalyst keeps it staged: CollapseProject will
    not inline it into every downstream use site, and predicate
    pushdown will not substitute it into filters below the projection.
    Without this, a filter over the tokenize projection re-evaluates
    the full ``regexp_extract_all`` per row (2x the dominant per-byte
    parse cost at scale). The ``when(length(uuid()) > 0, …)`` shell is
    constant-true but, unlike ``rand() > -1`` shells, survives Spark
    4's range-based constant folding; the per-row uuid cost is
    negligible next to the wrapped expression."""
    return F.when(F.length(F.uuid()) > 0, col)
