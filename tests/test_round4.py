"""Round-4 changes: ann_join auto-broadcast, overlay slim-bbox prune,
bucket-drop observability, CC convergence warning, s2 probe-key opt-out,
video decoder flag, Arrow resize_features."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geogeometry_spark.operators import dedup, similarity
from geogeometry_spark.sources import tables as src

SF = "/root/testdata/sf0.001"


def test_ann_join_auto_broadcasts_small_query_relation(spark):
    """VERDICT r3 item 2: with NO hint, the bounded size probe must
    detect a small query relation and plan a BroadcastHashJoin — no
    exchange of the vector-carrying corpus — while broadcast_queries=
    False forces the shuffle join; results identical either way."""
    emb = src.load_table(spark, SF, "embeddings")
    qs = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qvec_id"),
        F.col("embedding").alias("qembedding"),
    )
    auto = similarity.ann_join(emb, qs, k=5, n_planes=8, probe_hamming=1)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    forced = similarity.ann_join(
        emb, qs, k=5, n_planes=8, probe_hamming=1, broadcast_queries=False
    )
    key = lambda r: (r.qvec_id, r.rank, r.vec_id)  # noqa: E731
    assert sorted(map(key, auto.collect())) == sorted(
        map(key, forced.collect())
    )


def test_ann_join_auto_declines_broadcast_for_huge_fanout(spark):
    """The auto probe must NOT broadcast when rows x fan-out exceeds the
    budget: with the budget monkeypatched to 1 row even a 3-row query
    relation must take the shuffle path (no broadcast hint on probes).
    Results must still be correct."""
    emb = src.load_table(spark, SF, "embeddings")
    qs = emb.where(F.col("vec_id") % 300 == 0).select(
        F.col("vec_id").alias("qvec_id"),
        F.col("embedding").alias("qembedding"),
    )
    orig = similarity._AUTO_BROADCAST_PROBE_ROWS
    similarity._AUTO_BROADCAST_PROBE_ROWS = 1
    try:
        out = similarity.ann_join(emb, qs, k=3, n_planes=8, probe_hamming=0)
        ranks = {(r.qvec_id, r.rank) for r in out.collect()}
    finally:
        similarity._AUTO_BROADCAST_PROBE_ROWS = orig
    # every query still answers (the plan choice is a perf decision,
    # never a correctness one)
    assert len({q for q, _ in ranks}) == qs.count()


def test_minhash_bucket_drop_metric_observed(spark):
    """ADVICE r3: capping wide buckets must be OBSERVABLE.  Four
    identical docs + cap 2 -> every band bucket is width 4 and dropped;
    the in-plan Observation reports the dropped rows and the width seen,
    with no extra job."""
    from pyspark.sql import Observation

    docs = spark.createDataFrame(
        [(str(i), "the same boilerplate text body") for i in range(4)]
        + [("x1", "another shared text pair here"),
           ("x2", "another shared text pair here")],
        "doc_id string, text string",
    )
    obs = Observation()
    out = dedup.minhash_candidates(
        docs, num_hashes=8, bands=2, max_bucket_width=2, observation=obs
    )
    # the width-4 boilerplate bucket is dropped; the width-2 pair stays
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {("x1", "x2")}
    m = obs.get
    assert m["max_bucket_width_seen"] == 4
    assert m["rows_in_dropped_buckets"] == 8  # 4 docs x 2 bands
    # uncapped control: the boilerplate pairs exist, so the cap (not
    # the hashing) removed them
    assert (
        dedup.minhash_candidates(
            docs, num_hashes=8, bands=2, max_bucket_width=None
        ).count()
        == 7
    )


def test_winnow_stopgram_drop_metric_observed(spark):
    from pyspark.sql import Observation

    from geogeometry_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(str(i), "common shared boilerplate gram stream " * 3)
         for i in range(5)]
        + [("100", "unique matching pair of winnow documents " * 3),
           ("101", "unique matching pair of winnow documents " * 3)],
        "doc_id string, text string",
    )
    obs = Observation()
    out = text_ops.winnow_candidates(
        docs, k=8, w=4, max_bucket_width=2, observation=obs
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(100, 101)}
    m = obs.get
    assert m["max_bucket_width_seen"] == 5
    assert m["rows_in_dropped_buckets"] > 0


def test_connected_components_warns_when_unconverged(spark):
    """ADVICE r3: exiting via max_rounds without checksum convergence
    must warn loudly (unconverged labels can split components)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    with pytest.warns(RuntimeWarning, match="fixed point not reached"):
        dedup.connected_components(edges, max_rounds=1)


def test_connected_components_no_warning_when_converged(spark, recwarn):
    import warnings

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        out = dedup.connected_components(edges)
    comp = {r["node"]: r["component"] for r in out.collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_s2_probe_key_cell_col_false_ignores_stale_column(spark):
    """ADVICE r3: cell_col=False must force the lat/lon encode path so a
    stale/foreign s2_30 column cannot silently poison the join."""
    from geogeometry_spark.operators.s2_join import s2_radius_join

    pts = src.with_true_coords(
        src.load_table(spark, SF, "documents").select("doc_id")
    ).select("doc_id", "lat", "lon")
    truth = {
        r["doc_id"]
        for r in s2_radius_join(pts, 52.52, 13.405, 5000.0).collect()
    }
    assert truth  # Berlin cluster: non-empty
    poisoned = pts.withColumn("s2_30", F.lit(0).cast("long"))
    # auto-detect trusts the stale column -> wrong (empty) result ...
    auto = {
        r["doc_id"]
        for r in s2_radius_join(poisoned, 52.52, 13.405, 5000.0).collect()
    }
    assert auto == set()
    # ... the opt-out restores the correct rows
    forced = {
        r["doc_id"]
        for r in s2_radius_join(
            poisoned, 52.52, 13.405, 5000.0, cell_col=False
        ).collect()
    }
    assert forced == truth


def test_video_decoder_dispatch_both_branches(spark):
    """VERDICT r3 item 6: video decode is feature-flagged like image
    decode — stub deterministic, pyav branch real-or-fail-fast."""
    from geogeometry_spark.operators import multimodal as mm
    from geogeometry_spark.sources.tables import documents_with_spans

    docs = documents_with_spans(spark, SF)
    media = mm.media_spans(docs).limit(8)

    stub = mm.sample_frames(media, every_n=8, total_frames=16).collect()
    auto = mm.sample_frames(
        media, every_n=8, total_frames=16, decoder="auto"
    ).collect()
    assert len(stub) == 8 * 2

    if not mm.HAS_PYAV:
        assert sorted(map(str, stub)) == sorted(map(str, auto))
        with pytest.raises(Exception, match="NotImplementedError|pyav"):
            mm.sample_frames(media, decoder="pyav").collect()
        with pytest.raises(NotImplementedError, match="pyav"):
            mm.decode_video(b"\x00\x00\x00\x18ftyp", 4, decoder="pyav")
    else:  # pragma: no cover - sandbox has no codecs
        out = mm.decode_video(bytes(stub[0]["frame"]), 4, decoder="pyav")
        assert out.shape == (4, 16)


def test_resize_features_arrow_kernel_semantics(spark):
    """VERDICT r3 item 7: resize is an Arrow kernel now.  Mean-pool
    semantics preserved (left-fold FP order), ragged lengths grouped,
    n < out_dim yields NULL elements instead of an ANSI error."""
    rows = [
        ("a", [float(i) for i in range(8)]),        # step 2
        ("b", [float(i) * 0.5 for i in range(12)]),  # step 3
        ("c", [1.0, 2.0]),                           # n < out_dim
    ]
    df = spark.createDataFrame(rows, "doc_id string, feature array<float>")
    from geogeometry_spark.operators.multimodal import resize_features

    got = {
        r["doc_id"]: r["feature_small"]
        for r in resize_features(df, out_dim=4).collect()
    }
    for doc, feat in rows[:2]:
        f = np.asarray(feat, dtype=np.float32).astype(np.float64)
        step = len(f) // 4
        exp = f[: 4 * step].reshape(4, step).sum(axis=1) / step
        assert np.allclose(got[doc], exp, atol=1e-12)
    assert got["c"] == [None, None, None, None]
    # no interpreted higher-order functions in the plan (house rule)
    plan = (
        resize_features(df, out_dim=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "aggregate(" not in plan and "transform(" not in plan


def test_overlay_bbox_prune_runs_on_slim_relations(spark):
    """VERDICT r3 item 3: the bbox prune must join SLIM (id, box)
    relations; ring payloads attach only to bbox survivors.  Checked
    structurally: polygon_boxes_df output carries no rings column, and
    the overlay result is unchanged vs the brute-force kernel."""
    from geogeometry_spark.kernels.intersect import intersects
    from geogeometry_spark.operators.s2_join import (
        polygon_boxes_df,
        s2_overlay_join,
    )

    boxes = polygon_boxes_df(
        spark.createDataFrame(
            [("p", [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]])],
            "polygon_id string, rings array<array<array<double>>>",
        ),
        "id_a",
        "_boxa",
    )
    assert boxes.columns == ["id_a", "_boxa"]

    rng = np.random.default_rng(7)

    def sq(cx, cy, h):
        return [[
            [cx - h, cy - h], [cx + h, cy - h], [cx + h, cy + h],
            [cx - h, cy + h], [cx - h, cy - h],
        ]]

    a_rows = [
        (f"a{i}", sq(13.3 + rng.uniform(-0.2, 0.2),
                     52.5 + rng.uniform(-0.2, 0.2), 0.01))
        for i in range(60)
    ]
    b_rows = [
        (f"b{i}", sq(13.3 + rng.uniform(-0.2, 0.2),
                     52.5 + rng.uniform(-0.2, 0.2), 0.05))
        for i in range(15)
    ]
    schema = "polygon_id string, rings array<array<array<double>>>"
    a_df = spark.createDataFrame(a_rows, schema)
    b_df = spark.createDataFrame(b_rows, schema)
    got = {
        (r["id_a"], r["id_b"])
        for r in s2_overlay_join(a_df, b_df, level=13).collect()
    }
    exp = set()
    for ida, ra in a_rows:
        ga = {"type": "Polygon", "coordinates": ra}
        for idb, rb in b_rows:
            gb = {"type": "Polygon", "coordinates": rb}
            if intersects(ga, gb):
                exp.add((ida, idb))
    assert got == exp
