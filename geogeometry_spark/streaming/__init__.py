from .pipeline import stream_flagship, SPANS_SCHEMA  # noqa: F401
from .stateful import (  # noqa: F401
    EVENTS_SCHEMA,
    stream_dedup_first_seen,
    stream_tile_heatmap,
)
