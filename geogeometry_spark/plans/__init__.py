"""End-to-end pipelines and session configuration."""
