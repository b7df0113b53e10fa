"""Deduplication operators over the documents table.

- exact: hash-groupBy on md5(text) — one shuffle of (hash, id) pairs
  only (partial agg), never the text bodies.
- minhash LSH: shingle -> k minhashes -> band buckets -> bucket join.
  All hashing is Spark-native (xxhash64 with per-permutation seeds), so
  the signature computation is whole-stage codegen over an exploded
  shingle list, and candidate pairs come from an equi-join on
  (band, band_hash) — no O(n^2) anywhere.
- simhash: 64-bit sign-aggregated token hashes; near-dup = small
  Hamming distance within same band buckets.
- n-gram Jaccard: exact verification for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n_dups, keeper_id)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every exact-duplicate group."""
    w_keeper = (
        docs.select(F.md5(F.col(text_col)).alias("_h"), F.col(id_col).alias("_id"))
        .groupBy("_h")
        .agg(F.min("_id").alias("_keeper"))
    )
    return (
        docs.withColumn("_h", F.md5(F.col(text_col)))
        .join(w_keeper, "_h")
        .where(F.col(id_col) == F.col("_keeper"))
        .drop("_h", "_keeper")
    )


def _shingles(text_col: str, n: int) -> F.Column:
    """Word n-gram shingles as an array column (native)."""
    toks = F.split(F.col(text_col), " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def _seeded_hash(col: F.Column, seed: int, token_hash: str) -> F.Column:
    if token_hash == "xxhash64":
        return F.xxhash64(col, F.lit(seed))
    if token_hash == "md5_60":
        # 60-bit hash DuckDB reproduces exactly:
        # ('0x' || substr(md5(seed || '#' || s), 1, 15))::BIGINT
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}#"), col)), 1, 15), 16, 10
        ).cast("long")
    raise ValueError(f"unknown token_hash={token_hash!r}")


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """(id, h0..h{num_hashes-1}) — hj = min over shingles of
    hash(shingle, seed=j).

    Shape: explode shingles -> hash-aggregate per doc.  The min() per
    permutation is a map-side partial aggregation (the shuffle carries
    num_hashes longs per doc, never the shingles), and each hash is
    evaluated on the exploded rows once — inlining num_hashes array
    folds into one projection blows up codegen instead.

    token_hash: 'xxhash64' (default, fastest) or 'md5_60' (DuckDB-
    reproducible; used by the oracle-checked contract query)."""
    ex = docs.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_n)).alias("sh")
    )
    aggs = [
        F.min(_seeded_hash(F.col("sh"), j, token_hash)).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


_metric_seq = __import__("itertools").count()


def _capped_with_metric(
    banded_w: DataFrame, cap: int, name: str, observation=None
) -> tuple[DataFrame, DataFrame]:
    """Drop rows whose bucket width ``_w`` exceeds ``cap``, attaching an
    in-plan CollectMetrics node over the PRE-filter rows so the recall
    loss is observable without an extra job (ADVICE r3): metrics
    ``rows_in_dropped_buckets`` (rows discarded) and
    ``max_bucket_width_seen``.  ``observation`` may be a
    ``pyspark.sql.Observation`` (in-process read via ``.get``); else a
    unique ``<name>_<n>`` string registers the metric for the UI /
    QueryExecutionListener.

    Returns (observed, plain): two row-identical capped relations.  A
    CollectMetrics node must appear exactly ONCE in a query, but every
    caller SELF-JOINS the capped relation — joining the observed side
    to itself duplicates the node and Spark rejects the plan, so the
    self-join's other side must use the metric-free twin.

    Caveat (measured, Spark 4.1): when the DOWNSTREAM query collapses
    to an empty relation, AQE's empty-relation propagation replaces the
    observed subtree and ``Observation.get`` fails with a schema-less
    row — so the metric is unavailable in exactly the every-bucket-
    dropped corner (disable AQE for that forensic rerun).  Any
    non-empty result reads fine."""
    metrics = (
        F.sum(
            F.when(F.col("_w") > cap, F.lit(1)).otherwise(F.lit(0))
        ).alias("rows_in_dropped_buckets"),
        F.max("_w").alias("max_bucket_width_seen"),
    )
    obs = observation if observation is not None else (
        f"{name}_{next(_metric_seq)}"
    )
    keep = F.col("_w") <= cap
    observed = banded_w.observe(obs, *metrics).where(keep).drop("_w")
    plain = banded_w.where(keep).drop("_w")
    return observed, plain


def minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    token_hash: str = "xxhash64",
    max_bucket_width: int | None = 256,
    observation=None,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b, n_shared_bands).

    rows/doc after explode = bands (constant), and DISTINCT band-hash
    values distribute uniformly — but bucket WIDTH does not: identical
    or near-identical documents share whole signatures, so a cluster of
    m duplicates lands m rows in one (band, band_hash) bucket and the
    self-join emits m*(m-1)/2 pairs out of a single reducer.  On a web
    corpus with ~10^6 copies of boilerplate that is ~10^12 pairs from
    one task — a scale-killer.  Two defenses, both required at scale:

    1. **Run :func:`dedup_exact` first** (mandatory pre-pass): byte
       -identical docs — the dominant duplicate mass in practice — are
       collapsed by a plain hash-groupBy before LSH ever runs.
    2. ``max_bucket_width`` (default 256): buckets wider than the cap
       are dropped entirely (standard LSH practice).  A bucket that
       wide after exact-dedup means a template cluster whose members
       are already known near-dups of each other — enumerating its
       pairs adds no information and O(width^2) cost.  The cap bounds
       any bucket's output at ~32k pairs.  Width is counted with a
       window partitioned by (band, band_hash) — one shuffle on the
       same key the self-join uses, so the exchange is reused, and the
       widest bucket materializes m rows in a task, never m^2.
       ``None`` disables the guard (small, pre-deduped inputs only).

    The drop is OBSERVABLE (ADVICE r3): the plan carries an ``observe``
    metric (CollectMetrics — computed during the caller's own action,
    zero extra job at any scale) reporting
    ``rows_in_dropped_buckets`` and ``max_bucket_width_seen``.  Pass a
    ``pyspark.sql.Observation`` as ``observation`` to read it in-process
    (``obs.get`` after the first action); with the default ``None`` the
    metric is registered under a unique ``minhash_bucket_drops_<n>``
    name, visible in the Spark UI / QueryExecutionListener.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        docs, text_col, id_col, num_hashes, shingle_n, token_hash
    )

    def band_hash(b: int) -> F.Column:
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        if token_hash == "xxhash64":
            return F.xxhash64(*cols)
        return F.conv(
            F.substring(F.md5(F.concat_ws(",", *cols)), 1, 15), 16, 10
        ).cast("long")

    banded = sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*[band_hash(b) for b in range(bands)])).alias(
            "band", "band_hash"
        ),
    )
    banded_r = banded
    if max_bucket_width is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "band_hash")
        banded, banded_r = _capped_with_metric(
            banded.withColumn("_w", F.count(F.lit(1)).over(w)),
            max_bucket_width,
            "minhash_bucket_drops",
            observation,
        )
    left = banded.alias("a")
    right = banded_r.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def minhash_candidates_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_width: int | None = 256,
) -> str:
    """DuckDB twin of ``minhash_candidates(token_hash='md5_60')``,
    including the bucket-width cap."""
    rows_per_band = num_hashes // bands
    toks = f"string_split({text_col}, ' ')"
    shingles = (
        f"list_distinct(list_transform("
        f"range(0, greatest(len({toks}) - {shingle_n}, 0) + 1), "
        f"i -> array_to_string({toks}[i + 1 : i + {shingle_n}], ' ')))"
    )
    mins = ", ".join(
        f"min(('0x' || substr(md5('{j}#' || sh), 1, 15))::BIGINT) AS h{j}"
        for j in range(num_hashes)
    )
    def band_hash(b: int) -> str:
        concat = " || ',' || ".join(
            f"CAST(h{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        return f"('0x' || substr(md5({concat}), 1, 15))::BIGINT"

    band_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {b} AS band, {band_hash(b)} AS band_hash FROM sigs"
        for b in range(bands)
    )
    if max_bucket_width is None:
        guarded = "banded0"
    else:
        guarded = (
            f"(SELECT {id_col}, band, band_hash FROM ("
            f"SELECT *, count(*) OVER (PARTITION BY band, band_hash) AS w "
            f"FROM banded0) WHERE w <= {max_bucket_width})"
        )
    return (
        f"WITH sh AS (SELECT {id_col}, unnest({shingles}) AS sh FROM {table}), "
        f"sigs AS (SELECT {id_col}, {mins} FROM sh GROUP BY {id_col}), "
        f"banded0 AS ({band_rows}), "
        f"banded AS (SELECT * FROM {guarded}) "
        f"SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, "
        f"count(*) AS n_shared_bands "
        f"FROM banded a JOIN banded b ON a.band = b.band "
        f"AND a.band_hash = b.band_hash AND a.{id_col} < b.{id_col} "
        f"GROUP BY a.{id_col}, b.{id_col}"
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity for candidate pairs (verification stage).
    Shingle sets are re-derived per side and intersected natively."""
    sh = docs.select(
        F.col(id_col), _shingles(text_col, shingle_n).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
    )


def _bit_value(b: int, bits: int) -> int:
    # bit 63 of a signed long is the sign bit
    return -(1 << 63) if (bits == 64 and b == 63) else (1 << b)


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_hash: str = "xxhash64",
    bits: int = 64,
) -> DataFrame:
    """SimHash over whitespace tokens in ONE pass: explode tokens, hash
    each token once, then a single groupBy(id) with ``bits`` conditional
    sums (±1 votes per bit).  The sums are map-side partial aggregations
    — the shuffle carries ``bits`` longs per doc, and each token is
    hashed exactly once (vs. the r1 version's 64 interpreted
    ``F.aggregate`` folds that re-walked the token array per bit;
    kept as :func:`simhash_fold` for the parity test and bench).

    token_hash:
      - ``xxhash64`` (default): fastest, 64-bit.
      - ``md5_60``: 60-bit token hash parsed from the first 15 hex chars
        of md5 — bit-for-bit reproducible in DuckDB
        (``('0x' || substr(md5(t),1,15))::BIGINT``), used by the
        oracle-checked contract query.
    """
    tok = F.col("_tok")
    if token_hash == "xxhash64":
        h = F.xxhash64(tok)
    elif token_hash == "md5_60":
        h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
        bits = min(bits, 60)
    else:
        raise ValueError(f"unknown token_hash={token_hash!r}")
    # NULL-text docs are excluded (nothing to hash) — this also matches
    # the SQL twin, where unnest(string_split(NULL)) yields no rows
    ex = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.explode_outer(F.split(F.col(text_col), " ")).alias("_tok"),
    ).select(
        id_col, F.when(tok.isNotNull(), h).alias("_h")
    )
    vote = lambda b: F.sum(  # noqa: E731
        F.when(F.col("_h").isNull(), 0)
        .when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1)
        .otherwise(-1)
    )
    agg = ex.groupBy(id_col).agg(
        *[vote(b).alias(f"_v{b}") for b in range(bits)]
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim.bitwiseOR(
            F.when(F.col(f"_v{b}") > 0, F.lit(_bit_value(b, bits)))
            .otherwise(F.lit(0))
            .cast("long")
        )
    return agg.select(F.col(id_col), sim.alias("simhash"))


def simhash_oracle_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
) -> str:
    """DuckDB twin of ``simhash(token_hash='md5_60')``."""
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    combine = " | ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({_bit_value(b, bits)} AS BIGINT) ELSE 0 END)"
        for b in range(bits)
    )
    return (
        f"WITH tok AS (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t "
        f"FROM {table}), "
        f"h AS (SELECT {id_col}, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok), "
        f"votes AS (SELECT {id_col}, {votes} FROM h GROUP BY {id_col}) "
        f"SELECT {id_col}, {combine} AS simhash FROM votes"
    )


def simhash_fold(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """r1 implementation — 64 ``F.aggregate`` folds over the token
    array (interpreted higher-order functions, O(64·tokens) per row).
    Retained only as the parity/bench twin of :func:`simhash`."""
    toks = F.split(F.col(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_terms = []
    for b in range(64):
        votes = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit_terms.append(
            F.when(votes > 0, F.lit(1 << b if b < 63 else -(1 << 63))).otherwise(
                F.lit(0)
            )
        )
    sim = bit_terms[0]
    for t in bit_terms[1:]:
        sim = sim.bitwiseOR(t)
    return docs.select(F.col(id_col), sim.alias("simhash"))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Distributed connected components over an undirected pair graph —
    the final stage of a near-dup pipeline: candidate PAIRS (from
    :func:`minhash_candidates` / the SimHash bucket join /
    ``embedding_near_dup_pairs``) become duplicate GROUPS, so one
    canonical document per group can be kept.

    Alternating large-star / small-star (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond"): each round is a
    min-aggregation by node plus an equi-join back on the same key —
    both map-side-combinable and AQE-skew-safe.  A boilerplate cluster
    of m duplicates is one hot node whose incident edges aggregate with
    partial min; no stage ever materializes m^2 rows (the pair
    *generation* cap lives upstream in ``minhash_candidates``).  Round
    count is O(log n) by the paper's potential argument, and the edge
    relation is ``localCheckpoint``-ed per round so neither the plan
    nor the lineage grows with iterations.

    Returns (node, component) — one row per node appearing in ≥1 pair;
    component = MIN node id in the component (lexicographic for string
    ids), so labels are deterministic and join-stable across retries.
    """
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    nodes = edges.select(F.col("u").alias("node")).union(
        edges.select("v")
    ).distinct().localCheckpoint()
    if edges.isEmpty():
        return nodes.withColumn("component", F.col("node"))

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _large_star(e: DataFrame) -> DataFrame:
        nbrs = _sym(e)
        m = nbrs.groupBy("u").agg(F.min("v").alias("_mv")).select(
            "u", F.least(F.col("u"), F.col("_mv")).alias("m")
        )
        # the trailing .distinct() is LOAD-BEARING on dense graphs: a
        # node with d smaller neighbors emits d (v, m) rows that mostly
        # coincide; without the dedup they multiply through small_star's
        # attach join and compound per round (measured: grid_dbscan_5m
        # 24.5 s -> 176 s when this distinct was dropped)
        return (
            nbrs.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # orient every edge big -> small, then attach each node's
        # small neighbors (and itself) to the minimum
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = o.groupBy("u").agg(F.min("v").alias("m"))
        attach = o.join(m, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_edge = m.select(F.col("u"), F.col("m").alias("v"))
        return (
            attach.union(self_edge)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    from pyspark.sql import Observation

    def _is_star_forest(e: DataFrame) -> bool:
        # exact terminal-state probe: a distinct big->small edge set is
        # a star forest iff every node is EITHER a source exactly once
        # with no in-edges (a leaf) OR target-only (a root).  One
        # tagged-endpoint aggregation + short-circuiting isEmpty.
        ends = e.select(
            F.col("u").alias("node"), F.lit(1).alias("as_u")
        ).union(e.select(F.col("v"), F.lit(0)))
        viol = (
            ends.groupBy("node")
            .agg(F.sum("as_u").alias("nu"), F.count(F.lit(1)).alias("nt"))
            .where(
                (F.col("nu") > 1)
                | ((F.col("nu") > 0) & (F.col("nt") > F.col("nu")))
            )
        )
        return viol.isEmpty()

    edges = edges.localCheckpoint()
    prev = None
    converged = False
    for _ in range(max_rounds):
        # Fixed-point detection without a per-round checksum JOB: the
        # old loop ran a separate collect() per round to checksum the
        # edge set; both that checksum (count + order-independent
        # bit_xor — overflow-free under ANSI mode, where sum(xxhash64)
        # throws) and an approx_count_distinct(u) heuristic now ride
        # the eager-checkpoint job for free via Observation.  When the
        # heuristic says sources are ~unique (necessary at the star-
        # forest terminal state, Kiveris et al. 2014), one exact probe
        # job confirms and breaks at the converged round itself — one
        # round EARLIER than checksum equality, which by construction
        # needs an extra round to see "output == input".  Checksum
        # equality remains the exact fallback (approx_count_distinct
        # under-counting can only delay the probe, never mis-converge).
        obs = Observation()
        new_edges = (
            _small_star(_large_star(edges))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
                F.approx_count_distinct("u").alias("andu"),
            )
            .localCheckpoint()
        )
        # the new checkpoint is EAGER, so the previous round's blocks
        # are dead the moment it returns — free them explicitly instead
        # of waiting on the ContextCleaner (lazily-GC'd round blocks
        # accumulate ~rounds x |edges| of block-manager storage, and
        # under memory pressure the async cleaner races block reads:
        # observed as 'blockmgr .../rdd_N (No such file or directory)'
        # task failures at 24M edges on a 128 GiB heap)
        old = edges
        edges = new_edges
        old.unpersist()
        m = obs.get
        cur = (m["n"], m["h"])
        # probe only when the count is stable (necessary at a fixed
        # point) AND sources look ~unique — otherwise the probe job
        # would run every round on near-star graphs and eat its savings
        if cur == prev or (
            prev is not None
            and m["n"] == prev[0]
            and m["andu"] >= 0.9 * m["n"]
            and _is_star_forest(edges)
        ):
            converged = True
            break
        prev = cur
    if not converged:
        # unconverged labels can SPLIT components silently (ADVICE r3)
        # — surface it loudly; O(log n) rounds means 50 covers any
        # realistic graph, so reaching here signals a real problem
        import warnings

        warnings.warn(
            f"connected_components: edge fixed point not "
            f"reached within max_rounds={max_rounds}; labels may split "
            f"components. Increase max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged: star forest oriented big -> small; a node's label is
    # the min over its outgoing targets (roots label themselves)
    labels = edges.groupBy("u").agg(F.min("v").alias("component"))
    return (
        nodes.join(labels, nodes["node"] == labels["u"], "left")
        .select(
            "node",
            F.coalesce(F.col("component"), F.col("node")).alias("component"),
        )
    )
