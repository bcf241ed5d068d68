"""Input sources (text logs, in-memory buffers, parquet tables) and
output sinks (json-lines / csv / console top-K / memory)."""
