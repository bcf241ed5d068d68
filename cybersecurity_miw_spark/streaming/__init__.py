"""Structured-Streaming analogs of the reference's incremental modes."""
