"""Text-analysis operators over the documents table — all native Column
work (no Python on the hot path).

- token counting: whitespace split + a BPE-ish subword estimate.
- quality scoring: length / punctuation / stopword / repetition ratios.
- language ID: stopword-profile scoring over a fixed per-language list
  (n-gram-free heuristic that is still a pure array fold).
- fingerprinting: content hash + prefix hash for near-head dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "mit"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "de", "y", "que", "los", "un", "es"],
}


def _tokens(text_col: str) -> Column:
    return F.split(F.col(text_col), " ")


# GPT-2-style pre-tokenizer, lookahead-free so Java regex (Spark) and
# RE2 (DuckDB oracle) match byte-for-byte: contraction suffixes, then
# space-prefixed letter/digit/punctuation runs, then whitespace runs.
BPE_SPLIT_PATTERN = (
    r"(?:'(?:[sdmt]|ll|ve|re))| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def with_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens (whitespace), n_chars, avg_token_len, bpe_tokens (count
    of BPE-ish pre-tokenizer matches — the unit a subword tokenizer
    would split further), and est_subwords (~chars/4 rule of thumb)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_m", n_chars)
        .withColumn(
            "avg_token_len",
            (n_chars - (n_tokens - 1)).cast("double") / n_tokens,
        )
        .withColumn(
            "bpe_tokens",
            F.size(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_SPLIT_PATTERN), 0
                )
            ).cast("long"),
        )
        .withColumn("est_subwords", F.ceil(n_chars / F.lit(4.0)).cast("long"))
    )


def with_quality(docs: DataFrame, text_col: str = "text", lang: str = "en") -> DataFrame:
    """Quality heuistics: stopword ratio, distinct-token ratio (repetition
    indicator), mean word length — the standard cheap pre-training
    filters, all codegen."""
    toks = _tokens(text_col)
    sw = STOPWORDS[lang]
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    n_distinct = F.size(F.array_distinct(toks))
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("stopword_ratio", n_stop.cast("double") / n_tokens)
        .withColumn("distinct_ratio", n_distinct.cast("double") / n_tokens)
    )


def with_lang_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: the language whose stopword list overlaps
    the token set most (ties broken by language code order)."""
    toks = F.array_distinct(_tokens(text_col))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
            f"score_{lang}"
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    df = docs.select("*", *scores)
    best = None
    langs = sorted(STOPWORDS)
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            cmp_op = (
                F.col(f"score_{lang}") >= F.col(f"score_{other}")
                if langs.index(other) > langs.index(lang)
                else F.col(f"score_{lang}") > F.col(f"score_{other}")
            )
            cond = cmp_op if cond is None else (cond & cmp_op)
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    return df.withColumn("lang_pred", best.otherwise(F.lit(langs[0])))


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: full-content md5 + head-64-chars md5 (cheap
    near-head duplicate key)."""
    return docs.withColumn("fp_full", F.md5(F.col(text_col))).withColumn(
        "fp_head", F.md5(F.substring(F.col(text_col), 1, 64))
    )


# --------------------------------------------------------------------------
# Winnowing fingerprint (rolling hash)
# --------------------------------------------------------------------------
# The MOSS document-fingerprinting scheme (Schleimer/Wilkerson/Aiken,
# SIGMOD'03, published algorithm): hash every k-gram, slide a window of
# w consecutive gram hashes, select each window's minimum (leftmost on
# ties).  Guarantee: any substring match of length >= k + w - 1 between
# two documents shares at least one selected hash, so overlap detection
# is an equi-join on (h) over a ~2/(w+1) density selection instead of a
# full cross-compare.
#
# Two variants, same selection logic (the repo's dual-path precedent —
# dedup's xxhash64 production / md5_60 oracle split):
# - "rolling" (production): Arrow-batched mapInPandas; per doc a
#   vectorized numpy Karp-Rabin polynomial hash over utf-8 bytes
#   (uint64 wraparound) + sliding-window argmin.  `pos` is a byte
#   offset, `h` the int64-reinterpreted rolling hash.
# - "md5_oracle" (contract): pure Spark SQL expressions (md5 prefix per
#   character k-gram, array_min over (h, pos) structs) that DuckDB
#   replays verbatim — interpreted HOFs, correctness surface only.

WINNOW_B = 1099511628211  # FNV-1a prime; odd, so invertible mod 2^64
WINNOW_INV_B = pow(WINNOW_B, -1, 1 << 64)  # modular inverse of B


def _winnow_md5(docs: DataFrame, text_col: str, id_col: str, k: int, w: int) -> DataFrame:
    # Fully native plan — NO interpreted higher-order functions (a
    # first draft used transform+array_min(slice(...)) and ran 230 s
    # single-task at sf0.01; this shape runs in seconds):
    #   explode gram offsets (native sequence generator, codegen)
    #   -> md5 prefix per gram (plain Columns, codegen)
    #   -> per-window minimum via min(struct(h, i)) over a sliding row
    #      frame partitioned by doc (leftmost tie by construction)
    #   -> keep valid window starts, distinct.
    from pyspark.sql.window import Window

    t = F.col(text_col)
    offsets = F.when(
        F.length(t) >= k, F.sequence(F.lit(0), F.length(t) - k)
    ).otherwise(F.expr("array()").cast("array<int>"))
    g = (
        docs.select(id_col, text_col)
        .withColumn("_i", F.explode(offsets))
        .select(
            id_col,
            F.col("_i").cast("long").alias("_i"),
            (F.length(t) - k + 1).cast("long").alias("_m"),
            F.substring(F.md5(t.substr(F.col("_i") + 1, F.lit(k))), 1, 8).alias(
                "_h"
            ),
        )
    )
    win = (
        Window.partitionBy(id_col)
        .orderBy("_i")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        g.withColumn("_min", F.min(F.struct("_h", "_i")).over(win))
        .where(F.col("_i") <= F.col("_m") - w)
        .select(
            id_col,
            F.col("_min._i").alias("pos"),
            F.col("_min._h").alias("h"),
        )
        .distinct()
    )


def winnow_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    variant: str = "rolling",
) -> DataFrame:
    """Winnowing fingerprint -> (id_col, pos, h), one row per selected
    gram.  Documents shorter than k + w - 1 select nothing (no full
    window).  Downstream overlap candidates are an equi-join on ``h``
    (guard hot hashes exactly like minhash_candidates' bucket cap).

    Scale shape: one narrow projection, no shuffle — fingerprinting is
    map-side; only the (id, pos, h) selection (~2/(w+1) of grams)
    leaves the stage."""
    if variant == "md5_oracle":
        return _winnow_md5(docs, text_col, id_col, k, w)
    if variant != "rolling":
        raise ValueError(f"unknown variant {variant!r}")

    import pandas as pd

    def fn(batches):
        for pdf in batches:
            ids, pos, h = winnow_batch(
                pdf[id_col].values, pdf[text_col], k, w
            )
            yield pd.DataFrame({id_col: ids, "pos": pos, "h": h})

    return docs.select(id_col, text_col).mapInPandas(
        fn, f"{id_col} long, pos long, h long"
    )


def winnow_batch(ids, texts, k: int, w: int):
    """The rolling-hash winnowing kernel over one Arrow batch,
    vectorized across the WHOLE batch, not per doc (a per-doc loop is
    numpy-call-overhead-bound: measured 55k docs/s vs ~1.6x batch-wide
    on 300-char docs, more on short docs).  All docs' bytes concatenate
    into one array; gram hashes and window argmins compute once;
    per-doc validity is a mask on window-start positions, so
    boundary-crossing garbage grams are never inside a valid window.

    Returns (ids, byte_pos, int64_hash) arrays.  Pure function
    (numpy-only) — property-tested against a per-doc reference in
    tests/test_properties.py."""
    import numpy as np
    import pandas as pd

    min_len = k + w - 1
    empty = (
        np.array([], dtype=object),
        np.array([], dtype=np.int64),
        np.array([], dtype=np.int64),
    )
    texts = pd.Series(texts) if not hasattr(texts, "notna") else texts
    keep = texts.notna().values
    ids = np.asarray(ids)[keep]
    blobs = [t.encode("utf-8") for t in texts.values[keep]]
    lens = np.fromiter(
        (len(b) for b in blobs), dtype=np.int64, count=len(blobs)
    )
    if lens.size == 0 or (lens >= min_len).sum() == 0:
        return empty
    concat = np.frombuffer(b"".join(blobs), dtype=np.uint8).astype(np.uint64)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    # Gram hash h_i = sum_{t<k} s_{i+t} * B^{k-1-t} (mod 2^64) via
    # modular prefix sums instead of the (n, k) sliding-window product:
    # with C = cumsum(s_i * Binv^i), h_i = (C[i+k-1] - C[i-1]) *
    # B^{i+k-1}.  uint64 ops wrap mod 2^64 exactly and B (odd) is
    # invertible, so this is BIT-IDENTICAL to the windowed form — but
    # O(n) work and O(n) temporaries instead of O(n*k).  The n*k
    # product was 128*n bytes of mmap'd temporary per batch; 32
    # concurrent workers faulting/zeroing/unmapping those spent 80-90%
    # of all CPU in KERNEL mode (page-fault churn, measured in
    # BASELINE.md r4 winnow section) and caused the r3 bench's wild
    # wall spread.  Measured 5x faster warm, 31x cold on an 8M-char
    # batch, identical output.
    n_bytes = concat.size
    binv_pows = np.full(n_bytes, np.uint64(WINNOW_INV_B), dtype=np.uint64)
    binv_pows[0] = np.uint64(1)
    np.cumprod(binv_pows, out=binv_pows)  # Binv^0 .. Binv^(n-1)
    b_pows = np.full(n_bytes, np.uint64(WINNOW_B), dtype=np.uint64)
    b_pows[0] = np.uint64(1)
    np.cumprod(b_pows, out=b_pows)  # B^0 .. B^(n-1)
    # in-place: binv_pows becomes C[i] = sum_{j<=i} s_j Binv^j (the
    # powers aren't needed once consumed — two fewer n*8B temporaries,
    # less allocator/page churn for the 32 concurrent workers)
    np.multiply(concat, binv_pows, out=binv_pows)
    csum = np.cumsum(binv_pows, out=binv_pows)
    h = csum[k - 1:].copy()
    h[1:] -= csum[: n_bytes - k]
    h *= b_pows[k - 1:]
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    argmin = wins.argmin(axis=1).astype(np.int64)
    # valid window starts per doc: offsets[d] + [0, n_d-k-w+1]
    v = np.maximum(lens - k - w + 2, 0)
    total = int(v.sum())
    rep_doc = np.repeat(np.arange(lens.size), v)
    local = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(v)[:-1])), v
    )
    starts = offsets[rep_doc] + local
    sel_global = np.unique(starts + argmin[starts])
    doc_idx = np.searchsorted(offsets, sel_global, side="right") - 1
    return (
        ids[doc_idx],
        sel_global - offsets[doc_idx],
        h[sel_global].astype(np.int64),
    )


def winnow_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    variant: str = "rolling",
    max_bucket_width: int | None = 256,
    min_shared: int = 2,
    observation=None,
) -> DataFrame:
    """Overlap-candidate pairs (id_a < id_b, n_shared) from winnowing
    fingerprints: docs sharing >= ``min_shared`` selected gram hashes.

    Scale shape mirrors :func:`~..operators.dedup.minhash_candidates`:
    the pair generation is an equi-join on ``h`` (no all-pairs), and
    ``max_bucket_width`` drops hashes shared by more than that many
    docs — a gram common to thousands of documents (boilerplate) is a
    stop-gram carrying no overlap signal, and without the cap one such
    hash emits O(width^2) pairs from a single reducer.  The width
    window shuffles on the same key the self-join uses, so the
    exchange is reused.  Run dedup_exact first for the same reason as
    MinHash (byte-identical docs collapse before pair enumeration).

    Dropped stop-grams are observable exactly as in
    ``minhash_candidates`` (ADVICE r3): an in-plan ``observe`` metric
    (``rows_in_dropped_buckets`` / ``max_bucket_width_seen``) computed
    during the caller's own action; pass an ``Observation`` to read it
    in-process."""
    fp = (
        winnow_fingerprint(docs, text_col, id_col, k, w, variant)
        .select(id_col, "h")
        .distinct()
    )
    fp_r = fp
    if max_bucket_width is not None:
        from pyspark.sql import Window

        from .dedup import _capped_with_metric

        win = Window.partitionBy("h")
        fp, fp_r = _capped_with_metric(
            fp.withColumn("_w", F.count(F.lit(1)).over(win)),
            max_bucket_width,
            "winnow_stopgram_drops",
            observation,
        )
    left, right = fp.alias("a"), fp_r.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return pairs.where(F.col("n_shared") >= min_shared)


def tfidf_topk_pairs(
    docs: DataFrame,
    k: int = 20,
    df_max_frac: float = 0.06,
    tf_cap: int = 255,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k most TF-IDF-cosine-similar document pairs (Salton &
    Buckley 1988 weighting; Bayardo et al. 2007 for the candidate
    doctrine) — the sparse-vector member of the similarity family
    next to the dense embedding ANN path.

    Candidates are RARE-TERM blocked (the prefix-filtering idea):
    only pairs sharing at least one term with document frequency
    <= ``df_max_frac`` * N ever get scored — a pair sharing nothing
    but stopwords is no near-dup candidate.  The cosine for a
    candidate pair is then EXACT over the pair's FULL weight vectors
    (every common term, rare or not).

    Exactness doctrine (rationals in, exact integers through):
    tf caps at ``tf_cap``; idf quantizes to BIGINT "milli" units
    floor(ln(N / df) * 1000 + 0.5) computed ONCE per distinct df
    value driver-side (the bounded-driver-relation pattern; Python
    libm == DuckDB libm in-container, proven by the entropy oracle);
    per-doc weights w = tf * idf_m stay BIGINT; the L2 norm is ONE
    sqrt over the exact BIGINT norm-square; normalized weights
    re-quantize to ppm BIGINTs via floor((w / sqrt(n2)) * 1e6 + 0.5);
    pair dots are order-free BIGINT sums of ppm products (overflow
    headroom: 1e12 per common term, 9e6 terms to the brink).  Ranking
    sorts the exact integer dot (desc, then id_a, id_b) via the
    TakeOrderedAndProject top-k, so ties are deterministic; the
    readable cosine is one final round(dot / 1e12, 6).

    Returns (rank, id_a, id_b, dot_q, cos_r6)."""
    spark = docs.sparkSession
    import math

    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), " ")).alias("_t"),
    ).where(F.col("_t") != "")
    tf = toks.groupBy("_id", "_t").agg(
        F.least(F.count(F.lit(1)), F.lit(int(tf_cap))).alias("_tf")
    )
    n_docs = docs.count()
    if n_docs == 0:
        return spark.createDataFrame(
            [], "rank int, id_a long, id_b long, dot_q long, cos_r6 double"
        )
    dfrel = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    df_vals = [r[0] for r in dfrel.select("_df").distinct().collect()]
    idf_rows = [
        (int(v), int(math.floor(math.log(n_docs / v) * 1000 + 0.5)))
        for v in df_vals
    ]
    idf_df = spark.createDataFrame(idf_rows, "_df long, _idf long")
    terms = dfrel.join(F.broadcast(idf_df), "_df")
    w = tf.join(F.broadcast(terms), "_t").select(
        "_id", "_t", "_df", (F.col("_tf") * F.col("_idf")).alias("_w")
    )
    norm2 = w.groupBy("_id").agg(
        F.sum(F.col("_w") * F.col("_w")).alias("_n2")
    )
    what = (
        w.join(norm2, "_id")
        .where(F.col("_n2") > 0)
        .select(
            "_id", "_t", "_df",
            F.floor(
                (F.col("_w") / F.sqrt(F.col("_n2").cast("double")))
                * F.lit(1e6)
                + F.lit(0.5)
            ).alias("_wq"),
        )
        .localCheckpoint()
    )
    df_max = max(1, math.floor(float(df_max_frac) * n_docs))
    rare = what.where(F.col("_df") <= F.lit(df_max))
    pairs = (
        rare.select(F.col("_id").alias("id_a"), "_t")
        .join(rare.select(F.col("_id").alias("id_b"), "_t"), "_t")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pa = what.select(F.col("_id").alias("id_a"), "_t",
                     F.col("_wq").alias("_wa"))
    pb = what.select(F.col("_id").alias("id_b"), "_t",
                     F.col("_wq").alias("_wb"))
    dots = (
        pairs.join(pa, "id_a")
        .join(pb, ["id_b", "_t"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("dot_q"))
    )
    from .similarity import ranked_topk

    top = ranked_topk(dots, int(k), "dot_q", "id_a", "id_b")
    return top.select(
        "rank", "id_a", "id_b", "dot_q",
        F.round(F.col("dot_q") / F.lit(1e12), 6).alias("cos_r6"),
    )


def tfidf_topk_pairs_oracle_sql(
    subq: str,
    k: int = 20,
    df_max_frac: float = 0.06,
    tf_cap: int = 255,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`tfidf_topk_pairs`: identical tokenize /
    tf cap / milli-idf floor quantization (DuckDB ln == Python libm),
    identical ppm weight floors, exact BIGINT pair dots, same
    (dot DESC, id_a, id_b) top-k order."""
    return (
        f"WITH toks AS (SELECT {id_col} AS id, "
        f"unnest(string_split({text_col}, ' ')) AS t FROM {subq}), "
        "tf AS (SELECT id, t, least(count(*), "
        f"{int(tf_cap)}) AS tf FROM toks WHERE t <> '' GROUP BY id, t), "
        f"nn AS (SELECT count(*) AS n FROM {subq}), "
        "dfr AS (SELECT t, count(*) AS df FROM tf GROUP BY t), "
        "terms AS (SELECT t, df, CAST(floor(ln(CAST((SELECT n FROM nn) "
        "AS DOUBLE) / df) * 1000 + 0.5) AS BIGINT) AS idf FROM dfr), "
        "w AS (SELECT tf.id, tf.t, terms.df, tf.tf * terms.idf AS w "
        "FROM tf JOIN terms USING (t)), "
        "norm2 AS (SELECT id, sum(w * w) AS n2 FROM w GROUP BY id), "
        "what AS (SELECT w.id, w.t, w.df, "
        "CAST(floor((w.w / sqrt(CAST(n2 AS DOUBLE))) * 1e6 + 0.5) "
        "AS BIGINT) AS wq FROM w JOIN norm2 USING (id) WHERE n2 > 0), "
        "pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b "
        "FROM what a JOIN what b ON a.t = b.t AND a.id < b.id "
        "WHERE a.df <= greatest(1, floor("
        f"{float(df_max_frac)!r} * (SELECT n FROM nn))) "
        "AND b.df <= greatest(1, floor("
        f"{float(df_max_frac)!r} * (SELECT n FROM nn)))), "
        "dots AS (SELECT p.id_a, p.id_b, sum(a.wq * b.wq) AS dot_q "
        "FROM pairs p JOIN what a ON a.id = p.id_a "
        "JOIN what b ON b.id = p.id_b AND b.t = a.t "
        "GROUP BY p.id_a, p.id_b) "
        "SELECT CAST(row_number() OVER "
        "(ORDER BY dot_q DESC, id_a, id_b) AS INT) AS rank, "
        "id_a, id_b, dot_q, round(dot_q / 1e12, 6) AS cos_r6 "
        f"FROM dots ORDER BY dot_q DESC, id_a, id_b LIMIT {int(k)}"
    )
