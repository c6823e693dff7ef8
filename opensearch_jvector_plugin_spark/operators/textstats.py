"""Text analysis operators: token counting, quality scoring, language-ID
heuristic, document fingerprinting. All built-in DataFrame expressions
(JVM-side), each with an exact ANSI-SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_col


FP_PRIME = 1_000_000_007
FP_MULT = 131

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "mit", "von", "auf"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "pour", "dans"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break priority


def token_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_ws_tokens, n_bpe_ish): index-tokenizer
    count, whitespace count, and a BPE-ish count (letter runs + single
    digits + punctuation marks each count as one piece)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        F.size(tokenize_col(text_col)).cast("long").alias("n_tokens"),
        F.size(F.filter(F.split(t, r"\s+"), lambda x: x != "")).cast("long").alias(
            "n_ws_tokens"
        ),
        F.size(
            F.regexp_extract_all(
                F.lower(t), F.lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), 0
            )
        ).cast("long").alias("n_bpe_ish"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
    quality): a deterministic composite quality heuristic for corpus
    filtering (length band + low punctuation + stopword presence)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize_col(text_col)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(t).cast("double")
    n_punct = F.size(
        F.regexp_extract_all(F.lower(t), F.lit("[^a-z0-9\\s]"), 0)
    ).cast("double")
    sw = STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda x: x.isin(sw))).cast("double")
    alpha_chars = F.size(
        F.regexp_extract_all(F.lower(t), F.lit("[a-z0-9]"), 0)
    ).cast("double")

    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    mean_len = F.when(n_tok > 0, alpha_chars / n_tok).otherwise(F.lit(0.0))
    length_ok = F.when((n_tok >= 20) & (n_tok <= 1000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    quality = (
        F.lit(0.4) * length_ok
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def lang_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, lang_pred, lang_score): stopword-ratio language heuristic
    over four small word lists; ties resolve in LANG_ORDER priority."""
    toks = tokenize_col(text_col)
    n_tok = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    scores = {
        lang: F.size(F.filter(toks, lambda x: x.isin(words))).cast("double")
        / n_tok
        for lang, words in STOPWORDS.items()
    }
    best_score = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    pred = F.lit("unknown")
    for lang in reversed(LANG_ORDER):
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    pred = F.when(best_score > 0, pred).otherwise(F.lit("unknown"))
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        pred.alias("lang_pred"),
        F.round(best_score, 6).alias("lang_score"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, fingerprint): order-sensitive polynomial rolling hash over
    the token stream — fp = fold(tokens, 0, (acc, t) ->
    (acc*131 + h(t)) % 1e9+7) with the portable md5-derived token hash.
    Detects exact token-sequence duplicates independent of whitespace,
    punctuation, and casing noise."""
    tok_hashes = F.transform(
        tokenize_col(text_col),
        lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
        % F.lit(FP_PRIME),
    )
    fp = F.aggregate(
        tok_hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_MULT + h) % F.lit(FP_PRIME),
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"), fp.alias("fingerprint")
    )
