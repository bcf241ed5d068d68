"""DataFrame-level operators: projection/derivation, predicates,
aggregation, plus the large-scale data-pipeline extensions (dedup,
similarity, text stats, multimodal plumbing)."""
