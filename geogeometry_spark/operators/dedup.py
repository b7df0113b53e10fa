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


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, h0..h{num_hashes-1}) — hj = min over shingles of
    xxhash64(shingle, seed=j).

    Shape: explode shingles -> hash-aggregate per doc.  The min() per
    permutation is a map-side partial aggregation (the shuffle carries
    num_hashes longs per doc, never the shingles), and each xxhash64 is
    evaluated on the exploded rows once — inlining num_hashes array
    folds into one projection blows up codegen instead."""
    ex = docs.select(
        F.col(id_col), F.explode(_shingles(text_col, shingle_n)).alias("sh")
    )
    aggs = [
        F.min(F.xxhash64(F.col("sh"), F.lit(j))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b, n_shared_bands).

    rows/doc after explode = bands (constant); the join key
    (band, band_hash) distributes uniformly by construction (hash
    values), so the self-join shuffle is skew-free."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col(f"h{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
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
    ex = docs.select(
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
