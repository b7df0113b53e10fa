"""Contract queries: training-data pipeline operators - dedup (exact/MinHash/SimHash), text stats, winnowing, TF-IDF, ANN similarity, and multimodal media.

Split from the flat contract module by family (VERDICT r4 item 3);
query semantics, oracles, and registry order are unchanged.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

# --------------------------------------------------------------------------
# training-data pipeline: dedup / text / similarity / multimodal
# --------------------------------------------------------------------------

def q_dedup_head(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    heads = docs.select(
        F.md5(F.substring(F.col("text"), 1, 16)).alias("head_md5"), "doc_id"
    )
    return (
        heads.groupBy("head_md5")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper_id"))
        .where(F.col("n_dups") > 1)
    )


O_DEDUP_HEAD = (
    "SELECT md5(substr(text, 1, 16)) AS head_md5, count(*) AS n_dups, "
    "min(doc_id) AS keeper_id FROM documents GROUP BY 1 HAVING count(*) > 1"
)


def q_dedup_exact(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(docs)


O_DEDUP_EXACT = (
    "SELECT md5(text) AS text_md5, count(*) AS n_dups, min(doc_id) AS keeper_id "
    "FROM documents GROUP BY 1 HAVING count(*) > 1"
)


def q_tfidf_sim(spark, sf_dir):
    """Top-20 TF-IDF-cosine document pairs (operators/text.py
    tfidf_topk_pairs): rare-term-blocked candidates, milli-idf /
    ppm-weight floor quantization so pair dots are exact BIGINT sums,
    deterministic (dot DESC, id_a, id_b) TakeOrderedAndProject
    top-k."""
    return text.tfidf_topk_pairs(
        src.load_table(spark, sf_dir, "documents"), k=20
    )


def _tfidf_sim_oracle() -> str:
    return text.tfidf_topk_pairs_oracle_sql("documents", k=20)


def q_token_stats(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_token_stats(docs).select(
        "doc_id",
        "n_tokens",
        "n_chars_m",
        "avg_token_len",
        "bpe_tokens",
        "est_subwords",
    )


O_TOKEN_STATS = (
    "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
    "length(text) AS n_chars_m, "
    "CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)"
    " / len(string_split(text, ' ')) AS avg_token_len, "
    "CAST(len(regexp_extract_all(text, '"
    + text.BPE_SPLIT_PATTERN.replace("'", "''")
    + "')) AS BIGINT) AS bpe_tokens, "
    "CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_subwords FROM documents"
)


def q_text_quality(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_quality(docs).select(
        "doc_id", "n_tokens", "stopword_ratio", "distinct_ratio"
    )


_SW = ", ".join(f"'{w}'" for w in text.STOPWORDS["en"])
O_TEXT_QUALITY = (
    "SELECT doc_id, len(toks) AS n_tokens, "
    f"CAST(len(list_filter(toks, t -> t IN ({_SW}))) AS DOUBLE) / len(toks)"
    " AS stopword_ratio, "
    "CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS distinct_ratio "
    "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)"
)


def q_lang_id(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_lang_score(docs).select(
        "doc_id", "lang_pred", "score_de", "score_en", "score_es", "score_fr"
    )


def _lang_oracle() -> str:
    langs = sorted(text.STOPWORDS)
    score_exprs = {
        lang: (
            "len(list_intersect(list_distinct(string_split(text, ' ')), "
            f"[{', '.join(repr(w) for w in text.STOPWORDS[lang])}]))"
        )
        for lang in langs
    }
    sub = "SELECT doc_id, " + ", ".join(
        f"{e} AS score_{lang}" for lang, e in score_exprs.items()
    ) + " FROM documents"
    case = "CASE "
    for i, lang in enumerate(langs):
        conds = [f"score_{lang} >= score_{o}" for o in langs[i + 1 :]]
        if conds:
            case += f"WHEN {' AND '.join(conds)} THEN '{lang}' "
        else:
            case += f"ELSE '{lang}' END"
    return (
        f"SELECT doc_id, {case} AS lang_pred, score_de, score_en, score_es, "
        f"score_fr FROM ({sub})"
    )


def q_fingerprint(spark, sf_dir):
    docs = src.load_table(spark, sf_dir, "documents")
    return text.with_fingerprint(docs).select("doc_id", "fp_full", "fp_head")


O_FINGERPRINT = (
    "SELECT doc_id, md5(text) AS fp_full, md5(substr(text, 1, 64)) AS fp_head "
    "FROM documents"
)


def q_winnow(spark, sf_dir):
    """Winnowing fingerprint selection (operators/text.py
    winnow_fingerprint, md5_oracle variant — the DuckDB-replayable twin
    of the production rolling-hash path; identical window-min selection
    semantics, pinned equal on selection positions by pytest)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return text.winnow_fingerprint(docs, k=8, w=4, variant="md5_oracle")


def _winnow_oracle(k: int = 8, w: int = 4) -> str:
    return f"""
WITH grams AS (
  SELECT doc_id, CAST(gs.i AS BIGINT) AS i,
         substr(md5(substr(text, CAST(gs.i AS INT) + 1, {k})), 1, 8) AS h
  FROM documents,
       LATERAL (SELECT unnest(range(0, length(text) - {k} + 1)) AS i) gs
),
wins AS (
  SELECT doc_id, CAST(ws.s AS BIGINT) AS s
  FROM documents,
       LATERAL (SELECT unnest(range(0, length(text) - {k} - {w} + 2)) AS s) ws
),
ranked AS (
  SELECT w.doc_id, w.s, g.i AS pos, g.h,
         ROW_NUMBER() OVER (
           PARTITION BY w.doc_id, w.s ORDER BY g.h, g.i
         ) AS rn
  FROM wins w
  JOIN grams g ON g.doc_id = w.doc_id AND g.i BETWEEN w.s AND w.s + {w} - 1
)
SELECT DISTINCT doc_id, pos, h FROM ranked WHERE rn = 1
"""


def q_winnow_pairs(spark, sf_dir):
    """Overlap-candidate pairs from winnowing fingerprints
    (operators/text.py winnow_candidates, md5_oracle variant): equi-join
    on selected hashes, hot-hash cap, n_shared >= 4.  k=16 grams: the
    synthetic corpus shares vocabulary so short grams match everywhere
    (k=8 pairs ~80% of all doc pairs); 16-char grams select genuine
    shared passages (47 pairs at sf0.01)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return text.winnow_candidates(
        docs, k=16, w=8, variant="md5_oracle",
        max_bucket_width=256, min_shared=4,
    )


def _winnow_pairs_oracle(
    k: int = 16, w: int = 8, max_width: int = 256, min_shared: int = 4
) -> str:
    sel = _winnow_oracle(k, w)
    return f"""
WITH fp AS (
  SELECT DISTINCT doc_id, h FROM ({sel})
),
guarded AS (
  SELECT doc_id, h FROM (
    SELECT doc_id, h, COUNT(*) OVER (PARTITION BY h) AS _w FROM fp
  ) WHERE _w <= {max_width}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
FROM guarded a JOIN guarded b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
"""


def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        src.load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    return [float(x) for x in row["embedding"]]


def q_ann_brute(spark, sf_dir):
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.brute_force_topk(emb, _query_vec(spark, sf_dir), k=10)
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


O_ANN_BRUTE = (
    "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
    "scored AS (SELECT vec_id, "
    " list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"
    "    * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))))"
    " AS cos_sim FROM embeddings, q) "
    "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
    "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank "
    "FROM scored) WHERE rank <= 10"
)


def q_embed_quantize(spark, sf_dir):
    """int8 scalar quantization (operators/similarity.py
    quantize_embeddings), exploded to scalar rows for robust hashing.
    Quantization rule floor(v/scale + 0.5) is chosen because numpy,
    Spark SQL, and DuckDB all express it identically (round() differs:
    half-even vs half-away)."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_embeddings(emb)
    return q.select(
        "vec_id", "scale", F.posexplode("qvec").alias("dim", "q")
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "q", "scale")


O_EMBED_QUANTIZE = """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127
           AS scale
  FROM embeddings
)
SELECT vec_id, CAST(gs.i AS BIGINT) AS dim,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(floor(CAST(embedding[CAST(gs.i AS INT) + 1] AS DOUBLE)
                            / scale + 0.5) AS INT)
       END AS q,
       scale
FROM s, LATERAL (SELECT unnest(range(0, len(embedding))) AS i) gs
"""


def q_ann_quant(spark, sf_dir):
    """Brute-force top-10 over the int8-quantized store, scored by
    dequantized cosine (quantized_topk) — the oracle re-derives the
    quantization AND the dequantized left-fold score in SQL."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_embeddings(emb)
    out = similarity.quantized_topk(q, _query_vec(spark, sf_dir), k=10)
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


O_ANN_QUANT = (
    "WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
    "s AS (SELECT vec_id, embedding, "
    " list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale"
    " FROM embeddings), "
    "deq AS (SELECT vec_id, list_transform(embedding, x -> "
    " CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE) "
    " ELSE floor(CAST(x AS DOUBLE) / scale + 0.5) * scale END) AS d FROM s), "
    "scored AS (SELECT vec_id, "
    " list_sum(list_transform(range(1, 65), i -> d[i] * CAST(qe[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> d[i] * d[i])))"
    "    * sqrt(list_sum(list_transform(range(1, 65), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))))"
    " AS cos_sim FROM deq, qv) "
    "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
    "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank "
    "FROM scored) WHERE rank <= 10"
)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN top-10 — now hash-checked: the hyperplanes are
    deterministic constants (similarity.lsh_planes), so the oracle
    recomputes every bucket in SQL and expresses the multi-probe set as
    bit_count(xor(bucket, query_bucket)) <= probe_hamming."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.ann_topk(emb, _query_vec(spark, sf_dir), k=10)
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


_COS_64 = (
    "list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))))"
)


def _ann_lsh_oracle() -> str:
    planes = similarity.lsh_planes(8, 64, 42)
    bucket = similarity.hyperplane_bucket_sql("embedding", planes)
    qbucket = similarity.hyperplane_bucket_sql("qe", planes)
    cos = _COS_64.format(a="c.embedding", b="q.qe")
    return (
        "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
        f"b AS (SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings), "
        f"qb AS (SELECT {qbucket} AS qbucket FROM q), "
        "cand AS (SELECT b.vec_id, b.embedding FROM b, qb "
        "WHERE bit_count(xor(b.bucket, qb.qbucket)) <= 2), "
        f"scored AS (SELECT c.vec_id, {cos} AS cos_sim FROM cand c, q) "
        "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
        "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER ("
        "ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank FROM scored) "
        "WHERE rank <= 10"
    )


def q_embed_near_dups(spark, sf_dir):
    """Embedding near-dup pairs at threshold via LSH bucket self-join +
    exact cosine verify (similarity.embedding_near_dup_pairs — the
    scale path of the brute-force embed_pairs_topk; no O(n^2) stage).
    Sandbox embeddings are random, so a low threshold keeps the checked
    result non-trivial."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.embedding_near_dup_pairs(emb, threshold=0.3)
    return out.select(
        "id_a", "id_b", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


def _embed_near_dups_oracle() -> str:
    planes = similarity.lsh_planes(8, 64, 42)
    bucket = similarity.hyperplane_bucket_sql("embedding", planes)
    cos = _COS_64.format(a="a.embedding", b="c.embedding")
    return (
        f"WITH b AS (SELECT vec_id, embedding, {bucket} AS bucket "
        "FROM embeddings) "
        f"SELECT id_a, id_b, round(cos_sim, 9) AS cos_r9 FROM ("
        f"SELECT a.vec_id AS id_a, c.vec_id AS id_b, {cos} AS cos_sim "
        "FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id) "
        "WHERE cos_sim >= 0.3"
    )


def q_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard over candidate pairs (docs sharing a
    16-char head hash) — the verification stage after LSH."""
    docs = src.load_table(spark, sf_dir, "documents")
    heads = docs.select(
        F.md5(F.substring(F.col("text"), 1, 16)).alias("h"), "doc_id"
    )
    pairs = (
        heads.alias("a")
        .join(heads.alias("b"), "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    out = dedup.ngram_jaccard(docs, pairs)
    return out.select(
        "id_a", "id_b", F.round(F.col("jaccard"), 9).alias("jaccard_r9")
    )


O_NGRAM_JACCARD = """
WITH sh AS (
  SELECT doc_id, md5(substr(text, 1, 16)) AS h,
    list_distinct(list_transform(
      range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
      i -> array_to_string(string_split(text, ' ')[i + 1 : i + 3], ' ')
    )) AS sh
  FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / len(list_distinct(a.sh || b.sh)), 9) AS jaccard_r9
FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
"""


def q_embed_pairs_topk(spark, sf_dir):
    """Embedding-cosine near-dup: exact top-20 most-similar pairs
    (brute-force O(n^2) verification twin of the LSH path — sandbox
    embeddings carry no planted dups, so top-k replaces a threshold)."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = similarity.cosine(F.col("ea"), F.col("eb"))
    scored = pairs.select("id_a", "id_b", cos.alias("cos_sim"))
    return similarity.ranked_topk(scored, 20, "cos_sim", "id_a", "id_b").select(
        "rank", "id_a", "id_b", F.round("cos_sim", 9).alias("cos_r9")
    )


O_EMBED_PAIRS = """
WITH scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(range(1, 65),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
    AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT rank, id_a, id_b, round(cos_sim, 9) AS cos_r9 FROM (
  SELECT id_a, id_b, cos_sim,
    CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, id_a ASC, id_b ASC) AS INT)
    AS rank FROM scored) WHERE rank <= 20
"""


def q_ann_ivf(spark, sf_dir):
    """IVF ANN: seeded k-means coarse quantizer + exact cosine inside
    nprobe lists (the second scale path besides hyperplane LSH).  The
    contract query trains on the md5-ordered sample so the oracle
    builder can re-derive the identical sample (and therefore identical
    centroids/probes) without Spark; production default stays xxhash64
    ordering."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    out = similarity.ivf_topk(
        emb,
        _query_vec(spark, sf_dir),
        k=10,
        n_clusters=16,
        nprobe=6,
        sample_hash="md5_60",
    )
    return out.select(
        "rank", "vec_id", F.round(F.col("cos_sim"), 9).alias("cos_r9")
    )


def _ann_ivf_oracle() -> str | None:
    """Re-derives the training sample (md5-ordered, identical to the
    Spark query's), runs the same driver-side k-means, and bakes the
    centroids into SQL: per-row list assignment = argmax of normalized
    dot over the 16 centroid constants, candidate filter on the probed
    lists, cosine top-10.  Returns None (rows-only fallback) when the
    sf0.01 embeddings parquet isn't where the sandbox puts it.

    COUPLING: the baked constants are only valid for the table the SQL
    will be run against — the driver contract pins the oracle gate to
    sf=0.01, and SPARK_GRAFT_SF_DIR overrides the path for local runs
    at other scales (tools/check_correctness.py sets it)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    import duckdb
    import numpy as np

    con = duckdb.connect()
    sample = con.execute(
        f"SELECT embedding FROM '{path}' ORDER BY "
        "('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT "
        "LIMIT 4096"
    ).fetchall()
    qrow = con.execute(
        f"SELECT embedding FROM '{path}' WHERE vec_id = 0"
    ).fetchone()
    con.close()
    vecs = np.array([list(r[0]) for r in sample], dtype=np.float64)
    cent = similarity._kmeans(vecs, min(16, len(vecs)), 42)
    probes = similarity.ivf_probes(cent, [float(x) for x in qrow[0]], 6)

    def dot_norm(c: np.ndarray) -> str:
        lst = ", ".join(repr(float(x)) for x in c)
        return (
            "list_sum(list_transform(range(1, 65), "
            f"j -> (CAST(embedding[j] AS DOUBLE) / nrm) * ([{lst}]::DOUBLE[])[j]))"
        )

    dl = ", ".join(dot_norm(c) for c in cent)
    probe_list = ", ".join(str(p) for p in probes)
    cos = _COS_64.format(a="c.embedding", b="q.qe")
    return (
        "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0), "
        "n AS (SELECT vec_id, embedding, sqrt(list_sum(list_transform("
        "range(1, 65), j -> CAST(embedding[j] AS DOUBLE) "
        "* CAST(embedding[j] AS DOUBLE)))) AS nrm FROM embeddings), "
        f"dls AS (SELECT vec_id, embedding, [{dl}] AS dl FROM n), "
        "assigned AS (SELECT vec_id, embedding, "
        "(list_position(dl, list_max(dl)) - 1) AS ivf_list FROM dls), "
        f"cand AS (SELECT vec_id, embedding FROM assigned "
        f"WHERE ivf_list IN ({probe_list})), "
        f"scored AS (SELECT c.vec_id, {cos} AS cos_sim FROM cand c, q) "
        "SELECT rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
        "SELECT vec_id, cos_sim, CAST(ROW_NUMBER() OVER ("
        "ORDER BY cos_sim DESC, vec_id ASC) AS INT) AS rank FROM scored) "
        "WHERE rank <= 10"
    )


def q_ann_join(spark, sf_dir):
    """ANN top-k JOIN: every 50th vector is a QUERY (a relation, not a
    driver-side constant — the bulk twin of ann_lsh): multi-probe
    hyperplane buckets both sides, one equi-join, Arrow cosine, window
    top-5 per query.  The oracle replays buckets + probes in SQL
    (bit_count(xor) <= hamming) and ranks per query."""
    emb = src.load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qvec_id"),
        F.col("embedding").alias("qembedding"),
    )
    out = similarity.ann_join(emb, qs, k=5, n_planes=8, probe_hamming=1)
    return out.select(
        "qvec_id", "rank", "vec_id",
        F.round(F.col("cos_sim"), 9).alias("cos_r9"),
    )


def _ann_join_oracle() -> str:
    planes = similarity.lsh_planes(8, 64, 42)
    bucket = similarity.hyperplane_bucket_sql("embedding", planes)
    qbucket = similarity.hyperplane_bucket_sql("qe", planes)
    cos = _COS_64.format(a="c.embedding", b="c.qe")
    return (
        f"WITH q AS (SELECT vec_id AS qvec_id, embedding AS qe, "
        f"{qbucket} AS qb FROM embeddings WHERE vec_id % 50 = 0), "
        f"b AS (SELECT vec_id, embedding, {bucket} AS bucket "
        "FROM embeddings), "
        "cand AS (SELECT q.qvec_id, q.qe, b.vec_id, b.embedding "
        "FROM q JOIN b ON bit_count(xor(q.qb, b.bucket)) <= 1), "
        f"scored AS (SELECT qvec_id, vec_id, {cos} AS cos_sim "
        "FROM cand c) "
        "SELECT qvec_id, rank, vec_id, round(cos_sim, 9) AS cos_r9 FROM ("
        "SELECT qvec_id, vec_id, cos_sim, CAST(ROW_NUMBER() OVER ("
        "PARTITION BY qvec_id ORDER BY cos_sim DESC, vec_id ASC) AS INT) "
        "AS rank FROM scored) WHERE rank <= 5"
    )


def q_minhash_candidates(spark, sf_dir):
    """LSH candidate pairs with the md5_60 token hash so DuckDB can
    replay the full shingle -> minhash -> band -> bucket-join pipeline
    (production default stays xxhash64 — same plan shape, cheaper hash;
    pytest covers both paths)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return dedup.minhash_candidates(
        docs, num_hashes=16, bands=4, token_hash="md5_60"
    )


def q_simhash(spark, sf_dir):
    """One-pass SimHash (explode -> 60 conditional-sum bit votes).  The
    md5_60 token hash is bit-for-bit reproducible in DuckDB, so this
    query is oracle-checked; production defaults to xxhash64 (same vote
    logic, cheaper hash — parity pytest covers both)."""
    docs = src.load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, token_hash="md5_60")


def q_pipeline_near_dup(spark, sf_dir):
    """END-TO-END training-data dedup pipeline as ONE composed query —
    the shape a 100 TB corpus job actually runs: exact dedup (hash
    groupBy keeper) -> quality gate (native token count) -> MinHash LSH
    candidates (banded bucket join, hot-bucket cap) -> exact n-gram
    Jaccard verification of the candidate pairs.  Every stage is an
    existing operator; this query pins their COMPOSITION with a single
    DuckDB oracle."""
    docs = src.load_table(spark, sf_dir, "documents")
    survivors = dedup.dedup_exact(docs).where(
        F.size(F.split(F.col("text"), " ")) >= 8
    )
    cands = dedup.minhash_candidates(
        survivors, num_hashes=16, bands=4, token_hash="md5_60"
    )
    verified = dedup.ngram_jaccard(survivors, cands.select("id_a", "id_b"))
    return (
        cands.join(verified, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            F.round(F.col("jaccard"), 9).alias("jaccard_r9"),
        )
    )


def _pipeline_near_dup_oracle() -> str:
    """Composes the stage oracles: exact-dedup + quality CTE feeds the
    (parenthesized, WITH-bearing) minhash twin as its source table; the
    Jaccard twin re-derives shingles from the same survivors."""
    minhash = dedup.minhash_candidates_oracle_sql(table="base")
    toks = "string_split(text, ' ')"
    shingles = (
        "list_distinct(list_transform("
        f"range(0, greatest(len({toks}) - 3, 0) + 1), "
        f"i -> array_to_string({toks}[i + 1 : i + 3], ' ')))"
    )
    return (
        "WITH base AS ("
        " SELECT d.doc_id, d.text FROM documents d"
        " JOIN (SELECT md5(text) AS h, min(doc_id) AS keeper"
        "       FROM documents GROUP BY md5(text)) k"
        "   ON md5(d.text) = k.h AND d.doc_id = k.keeper"
        f" WHERE len({toks}) >= 8), "
        f"cand AS (SELECT * FROM ({minhash})), "
        f"sh AS (SELECT doc_id, {shingles} AS sh FROM base) "
        "SELECT c.id_a, c.id_b, c.n_shared_bands, "
        "round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)"
        " / len(list_distinct(a.sh || b.sh)), 9) AS jaccard_r9 "
        "FROM cand c JOIN sh a ON c.id_a = a.doc_id "
        "JOIN sh b ON c.id_b = b.doc_id"
    )


def q_dedup_groups(spark, sf_dir):
    """Near-dup GROUPS: minhash LSH candidate pairs -> distributed
    connected components (alternating large-star/small-star, Kiveris
    et al. 2014) -> every document labeled with its duplicate-group id
    (min doc_id in the component; singletons label themselves).  The
    stage a real corpus dedup runs AFTER pair generation, so keepers
    are chosen per GROUP, not per pair (pairs alone under-delete:
    a-b + b-c near-dups keep both a and c unless the chain is
    closed)."""
    docs = src.load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidates(
        docs, num_hashes=16, bands=4, token_hash="md5_60"
    ).select("id_a", "id_b")
    comp = dedup.connected_components(pairs)
    return (
        docs.select("doc_id")
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("group_id"),
        )
    )


def _dedup_groups_oracle() -> str:
    """Transitive closure by recursive CTE over the minhash-pair twin;
    component label = min reachable node — the same fixed point the
    alternating large-star/small-star rounds converge to."""
    minhash = dedup.minhash_candidates_oracle_sql()
    return (
        f"WITH RECURSIVE pairs AS MATERIALIZED (SELECT id_a, id_b FROM ({minhash})), "
        "edges AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM pairs "
        "UNION SELECT id_b, id_a FROM pairs), "
        "reach(u, v) AS (SELECT u, v FROM edges "
        "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), "
        "labels AS (SELECT u AS node, least(u, min(v)) AS grp "
        "FROM reach GROUP BY u) "
        "SELECT d.doc_id, coalesce(l.grp, d.doc_id) AS group_id "
        "FROM documents d LEFT JOIN labels l ON d.doc_id = l.node"
    )


def q_media_features(spark, sf_dir):
    docs = src.documents_with_spans(spark, sf_dir)
    return extract_media_features(media_spans(docs)).select(
        "doc_id", "media_ref", "width", "height", F.size("feature").alias("dim")
    )


def q_frame_sample(spark, sf_dir):
    """Video frame sampling plumbing (mapInPandas UDTF shape, stub
    decode): 4 frames per media span at a 4-frame stride, 25 fps
    timestamps."""
    from ..operators.multimodal import sample_frames

    docs = src.documents_with_spans(spark, sf_dir)
    frames = sample_frames(media_spans(docs), every_n=4, total_frames=16)
    return frames.select(
        "doc_id", "media_ref", "frame_idx", "ts_ms",
        F.size("frame").alias("frame_dim"),
    )


O_FRAME_SAMPLE = (
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "'media://' || lpad(CAST((doc_id * 2654435761) % 4294967296 AS VARCHAR), 16, '0')"
    " AS media_ref, CAST(f AS INT) AS frame_idx, CAST(f * 40 AS INT) AS ts_ms, "
    "16 AS frame_dim FROM documents, (SELECT unnest([0, 4, 8, 12]) AS f)"
)


O_MEDIA = (
    "SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "'media://' || lpad(CAST((doc_id * 2654435761) % 4294967296 AS VARCHAR), 16, '0')"
    " AS media_ref, 8 AS width, 8 AS height, 8 AS dim FROM documents"
)
