"""DataFrame-level operators: spatial joins, tiling, extraction, kNN,
prefix scans, skew handling, dedup/similarity/text analysis."""
