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
