"""Logical-plan layer: the JSON log-format model and its compiler to a
Spark DataFrame pipeline."""
