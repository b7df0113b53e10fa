from .pipeline import stream_flagship, SPANS_SCHEMA  # noqa: F401
