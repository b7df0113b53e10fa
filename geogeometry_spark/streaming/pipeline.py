"""Structured Streaming wrapper over the flagship stages.

The reference has no streams (SURVEY.md §2.12); the engine-side
requirement is *resumable incremental processing*: new document files
land in a directory / Iceberg table, and each micro-batch runs the same
stateless flagship stages (extract -> encode -> broadcast PIP join ->
tiles).  Spark's checkpoint tracks consumed input files, so a rerun
resumes exactly where the last one stopped — the streaming twin of
sources.lineage's manifest-based batch resume.

All flagship stages are stateless row transforms, so they run on a
streaming DataFrame unchanged — same code path, batch and stream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def stream_flagship(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    keep_spans: bool = True,
    max_length: int = 6,
    zooms: list[int] | None = None,
    available_now: bool = True,
):
    """Incrementally process span-document parquet files landing in
    ``input_dir``; returns the started StreamingQuery.

    ``available_now=True`` drains everything currently unprocessed and
    stops (the batch-resume usage); False runs continuously.
    """
    from pyspark.sql import functions as F

    from ..functions import columns as C
    from ..operators.extract import extract_coordinates
    from ..operators.pip_join import pip_join
    from ..operators.tiling import assign_tiles

    docs = spark.readStream.schema(SPANS_SCHEMA).parquet(input_dir)
    pts = extract_coordinates(docs, keep_spans=keep_spans)
    pts = pts.withColumn(
        "cell_id", C.geohash_interleaved(F.col("lat"), F.col("lon"), 12)
    )
    inside = pip_join(pts, max_length=max_length)
    out = assign_tiles(inside, zooms=zooms or [8, 12, 16, 22])

    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
