"""Structured Streaming flagship: incremental processing + checkpoint
resume (the streaming twin of the lineage manifest test)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def spans_batches(spark, tmp_path):
    from geogeometry_spark.sources.tables import documents_with_spans

    docs = documents_with_spans(spark, "/root/testdata/sf0.001")
    b1 = docs.where(F.col("doc_id").cast("long") % 2 == 0)
    b2 = docs.where(F.col("doc_id").cast("long") % 2 == 1)
    inp = tmp_path / "input"
    b1.write.mode("append").parquet(str(inp))
    return inp, b1, b2


def _run_drain(spark, inp, tmp_path):
    from geogeometry_spark.streaming import stream_flagship

    q = stream_flagship(
        spark,
        str(inp),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(tmp_path / "out"))


def test_streaming_matches_batch_and_resumes(spark, tmp_path, spans_batches):
    from geogeometry_spark.plans.flagship import flagship

    inp, b1, b2 = spans_batches

    out1 = _run_drain(spark, inp, tmp_path)
    expected1 = flagship(spark, "/root/testdata/sf0.001", docs=b1).count()
    assert out1.count() == expected1

    # second batch lands; a new availableNow run processes ONLY new files
    b2.write.mode("append").parquet(str(inp))
    out2 = _run_drain(spark, inp, tmp_path)
    expected_total = flagship(
        spark, "/root/testdata/sf0.001"
    ).count()
    assert out2.count() == expected_total

    # a third run with nothing new is a no-op (checkpoint resume)
    out3 = _run_drain(spark, inp, tmp_path)
    assert out3.count() == expected_total

    # span sequences survive the streaming path untouched
    row = out2.select("doc_id", "spans").limit(1).collect()[0]
    assert row["spans"][0]["kind"] == "text"
