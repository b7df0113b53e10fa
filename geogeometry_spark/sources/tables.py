"""Table loading + deterministic spans-document synthesis.

The sandbox `documents` table is (doc_id, text, lang, source, n_chars)
(TESTDATA.md).  The engine's input contract (BASELINE.json input_hint) is
an interleaved-span table (doc_id, spans: array<struct<kind, text,
media_ref, offset>>).  ``documents_with_spans`` derives that shape
deterministically from doc_id with pure integer arithmetic + string
concat, so the DuckDB oracle can reproduce the embedded ground-truth
coordinates without regex (FIXTURES.md §1: "the spans-shaped table is
derived/synthesized at test time").

Derivation (all BIGINT arithmetic, identical in Spark SQL and DuckDB):

    base_lat_milli = (doc_id * 7919)   % 170001 - 85000    # [-85, 85] step .001
    base_lon_milli = (doc_id * 104729) % 350001 - 175000   # [-175, 175]
    hot            = doc_id % 5 == 0                       # 20% Berlin hot-spot
    lat_milli      = hot ? 52450 + (doc_id * 31) % 120 : base_lat_milli
    lon_milli      = hot ? 13350 + (doc_id * 37) % 80  : base_lon_milli
    has_coord      = doc_id % 10 < 6                       # ~60% of docs
    decoy          = doc_id % 10 == 6                      # must NOT parse

The hot-spot band [52.45, 52.57] x [13.35, 13.43] lies inside the Berlin
fixture polygons, driving both PIP-join selectivity and spatial skew
(salting tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load an input table.

    ``sf_dir`` is normally a parquet directory (the sandbox layout);
    when it is a catalog prefix of the form ``table:<catalog.db>`` the
    table resolves through the session catalog instead — the production
    path for Iceberg (`spark.read.table("catalog.db.name")` picks up
    hidden partitioning, snapshot isolation, and metadata-level pruning
    with zero engine changes; no Iceberg jars ship in this sandbox, so
    the parquet path is what tests exercise)."""
    if sf_dir.startswith("table:"):
        return spark.read.table(f"{sf_dir[len('table:'):]}.{name}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# --- deterministic coordinate derivation (Spark Columns) -----------------

def lat_milli_col():
    base = (F.col("doc_id") * 7919) % 170001 - 85000
    hot = 52450 + (F.col("doc_id") * 31) % 120
    return F.when(F.col("doc_id") % 5 == 0, hot).otherwise(base)


def lon_milli_col():
    base = (F.col("doc_id") * 104729) % 350001 - 175000
    hot = 13350 + (F.col("doc_id") * 37) % 80
    return F.when(F.col("doc_id") % 5 == 0, hot).otherwise(base)


def with_true_coords(df: DataFrame) -> DataFrame:
    """Ground-truth lat/lon columns (the values embedded into span text)."""
    return df.withColumn("lat", lat_milli_col() / F.lit(1000.0)).withColumn(
        "lon", lon_milli_col() / F.lit(1000.0)
    )


# --- mirrored DuckDB SQL fragments ----------------------------------------

LAT_MILLI_SQL = (
    "(CASE WHEN doc_id % 5 = 0 THEN 52450 + (doc_id * 31) % 120 "
    "ELSE (doc_id * 7919) % 170001 - 85000 END)"
)
LON_MILLI_SQL = (
    "(CASE WHEN doc_id % 5 = 0 THEN 13350 + (doc_id * 37) % 80 "
    "ELSE (doc_id * 104729) % 350001 - 175000 END)"
)
LAT_SQL = f"({LAT_MILLI_SQL} / 1000.0)"
LON_SQL = f"({LON_MILLI_SQL} / 1000.0)"
HAS_COORD_SQL = "(doc_id % 10 < 6)"


def _fmt_milli(milli):
    """milli-degrees -> exact 3-decimal string via integer math (no printf
    rounding-mode ambiguity between engines)."""
    a = F.abs(milli)
    return F.concat(
        F.when(milli < 0, F.lit("-")).otherwise(F.lit("")),
        (a / 1000).cast("bigint").cast("string"),
        F.lit("."),
        F.lpad((a % 1000).cast("string"), 3, "0"),
    )


def amplified_documents(
    spark: SparkSession, sf_dir: str, factor: int
) -> DataFrame:
    """Replicate the documents table ``factor``x with fresh doc_ids
    (id' = id + n_docs * k) — deterministic scale amplification for
    benchmarking (the sandbox documents table is only 5k rows at sf0.1;
    the production target is 10^12 docs)."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    return (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(n))
        .drop("rep")
        .repartition(int(spark.sparkContext.defaultParallelism) * 2)
    )


def synthetic_fixes(
    spark: SparkSession,
    n_users: int,
    fixes_per_user: int,
    metro: bool = False,
) -> DataFrame:
    """Deterministic trajectory fix stream at bench scale — the same
    moving/parked arithmetic as the contract's events-derived stream
    (contract._traj_points), generated from spark.range so trajectory/
    clustering operators can be measured at 5M+ fixes without external
    data.  Each user emits one fix per 1800 s (plus a per-row skew so
    ties are rare), phase-shifted parking, +/-0.02 deg jitter while
    moving.  Columns: event_id, user_id, ts_sec, lat, lon."""
    n = n_users * fixes_per_user
    base = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % n_users).alias("user_id"),
        (
            F.lit(1704067200)
            + (F.col("id") / n_users).cast("long") * F.lit(1800)
            + (F.col("id") % 997)
        ).alias("ts_sec"),
    )
    uid, eid, ts = F.col("user_id"), F.col("event_id"), F.col("ts_sec")
    if metro:
        # 1 x 2 degree Berlin-ish box (the contract's co-location
        # fixture shape): home ranges overlap, so contact pairs exist
        base_lat = F.lit(52.0) + ((uid * 7919) % 1001) / F.lit(1000.0)
        base_lon = F.lit(13.0) + ((uid * 104729) % 2001) / F.lit(1000.0)
    else:
        base_lat = ((uid * 7919) % 170001 - 85000) / F.lit(1000.0)
        base_lon = ((uid * 104729) % 350001 - 175000) / F.lit(1000.0)
    moving = ((ts + uid * 977) % 14400) < 10800
    jlat = ((eid * 31 + uid * 17) % 4001 - 2000).cast("double") / F.lit(1e5)
    jlon = ((eid * 37 + uid * 23) % 4001 - 2000).cast("double") / F.lit(1e5)
    zero = F.lit(0.0)
    return base.withColumns(
        {
            "lat": base_lat + F.when(moving, jlat).otherwise(zero),
            "lon": base_lon + F.when(moving, jlon).otherwise(zero),
        }
    )


def documents_with_spans(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """The interleaved text+media spans table (BASELINE.json input_hint):
    (doc_id: string, spans: array<struct<kind, text, media_ref, offset>>).

    Spans per doc: [prose+coordinate text span, media span, decoy text
    span (10% of docs)].  All construction is native Column work — the
    synthesis itself never leaves the JVM.
    """
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    lat_m = lat_milli_col()
    lon_m = lon_milli_col()
    has_coord = F.col("doc_id") % 10 < 6
    decoy = F.col("doc_id") % 10 == 6

    text0 = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.when(
            has_coord,
            F.concat(
                F.lit(" near "), _fmt_milli(lat_m), F.lit(", "), _fmt_milli(lon_m),
                F.lit(" today"),
            ),
        ).otherwise(F.lit(" nowhere in particular")),
    )
    media_ref = F.concat(
        F.lit("media://"),
        F.lpad(((F.col("doc_id") * 2654435761) % 4294967296).cast("string"), 16, "0"),
    )
    span0 = F.struct(
        F.lit("text").alias("kind"),
        text0.alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    )
    span1 = F.struct(
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        media_ref.alias("media_ref"),
        F.length(text0).cast("int").alias("offset"),
    )
    decoy_text = F.lit("ignore 91, 0 and 1000,1000 and 52.5a, 13.4")
    span2 = F.struct(
        F.lit("text").alias("kind"),
        decoy_text.alias("text"),
        F.lit("").alias("media_ref"),
        (F.length(text0) + 1).cast("int").alias("offset"),
    )
    spans = F.when(decoy, F.array(span0, span1, span2)).otherwise(
        F.array(span0, span1)
    )
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), spans.alias("spans")
    )


def synthetic_road_graph(
    spark: SparkSession,
    side: int,
    skips: tuple[int, ...] = (8, 64),
    base_lat: float = 30.0,
    base_lon: float = 10.0,
    step_deg: float = 0.005,
) -> DataFrame:
    """Deterministic road network at bench scale for the routing
    family (operators/routing.py): a ``side`` x ``side`` geodesic
    lattice (4-neighborhood, both directions) plus skip-K "highway"
    edges along each row and column for every K in ``skips``, both
    directions, at 0.95x the geodesic cost per meter so optimal paths
    climb the hierarchy.  With skips (8, 64) any offset within a side
    of 512 decomposes into <= 7+7+7 hops per axis, so the frontier
    Bellman-Ford fixed point lands within ~50 rounds regardless of
    lattice size — the bounded-diameter shape real highway hierarchies
    give continental road graphs.

    Local street costs carry a per-edge congestion factor
    1 + ((src+dst) % 5) * 0.02.  All weights are mm-quantized BIGINTs
    (exact integer sums — the routing doctrine).  Columns:
    src, dst, w_mm.  Node id = row * side + col.
    """

    def _lat(n):
        return F.lit(base_lat) + F.floor(n / F.lit(float(side))).cast(
            "double"
        ) * F.lit(step_deg)

    def _lon(n):
        return F.lit(base_lon) + (n % side).cast("double") * F.lit(step_deg)

    from ..functions import columns as C

    def _weighted(und: DataFrame, cost_factor) -> DataFrame:
        bidir = und.union(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        hav = C.haversine(
            _lat(F.col("src")), _lon(F.col("src")),
            _lat(F.col("dst")), _lon(F.col("dst")),
        )
        return bidir.select(
            "src",
            "dst",
            F.round(hav * cost_factor * F.lit(1000.0))
            .cast("long")
            .alias("w_mm"),
        )

    n = F.col("id")
    row, col = n / F.lit(float(side)), n % side
    congestion = (
        F.lit(1.0) + ((F.col("src") + F.col("dst")) % 5).cast("double")
        * F.lit(0.02)
    )
    parts = []
    for k in (1,) + tuple(skips):
        horiz = spark.range(side * side).where(col < side - k).select(
            n.cast("int").alias("src"), (n + k).cast("int").alias("dst")
        )
        vert = spark.range(side * (side - k)).select(
            n.cast("int").alias("src"),
            (n + k * side).cast("int").alias("dst"),
        )
        factor = congestion if k == 1 else F.lit(0.95)
        parts.append(_weighted(horiz.union(vert), factor))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# SQL twin of the text0 span for oracle checks that need the raw text
TEXT0_SQL = (
    "(substr(text, 1, 40) || CASE WHEN doc_id % 10 < 6 THEN "
    "' near ' || "
    f"(CASE WHEN {LAT_MILLI_SQL} < 0 THEN '-' ELSE '' END) || "
    f"CAST(abs({LAT_MILLI_SQL}) // 1000 AS VARCHAR) || '.' || "
    f"lpad(CAST(abs({LAT_MILLI_SQL}) % 1000 AS VARCHAR), 3, '0') || "
    "', ' || "
    f"(CASE WHEN {LON_MILLI_SQL} < 0 THEN '-' ELSE '' END) || "
    f"CAST(abs({LON_MILLI_SQL}) // 1000 AS VARCHAR) || '.' || "
    f"lpad(CAST(abs({LON_MILLI_SQL}) % 1000 AS VARCHAR), 3, '0') || "
    "' today' ELSE ' nowhere in particular' END)"
)
