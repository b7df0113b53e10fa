"""Sources: parquet table loading, deterministic spans-document synthesis,
and lineage manifests for resumable partitioned writes."""
