"""Column-name quoting: reference formats carry field names with
dots (`H.323 message`, firewall_checkpoint.json) which Spark would
otherwise parse as struct access."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qcol(name: str) -> Column:
    """F.col that treats the whole name literally (backtick-quoted)."""
    return F.col("`" + name.replace("`", "``") + "`")
