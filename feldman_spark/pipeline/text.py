"""Text-analysis operators for training-data pipelines.

Beyond-reference capability: token counting, quality scoring, n-gram
language identification and document fingerprinting — all pure column
expressions (JVM-side, whole-stage-codegen friendly), no UDFs, so they
cost one pass over the corpus.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "token_count",
    "bpe_token_count",
    "quality_features",
    "quality_score",
    "lang_scores",
    "lang_id",
    "fingerprint",
    "STOPWORDS",
]

# tiny per-language stopword lists (function-word n-gram heuristic)
STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
    "zh": ["的", "是", "了", "在", "和", "有", "我"],
}


def token_count(text: Column) -> Column:
    """Whitespace tokenization count (empty text → 0)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("bigint")


# GPT-2-style pre-tokenization classes: a run of letters, a run of digits,
# or a run of other non-space symbols — each optionally preceded by one
# space. Kept to constructs whose semantics are identical in Java regex
# (Spark) and RE2/PCRE (DuckDB/Python) so the count is engine-portable.
BPE_SPLIT_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: number of ``BPE_SPLIT_PATTERN`` matches —
    the pre-merge piece count a byte-pair tokenizer would start from
    (an upper bound on, and in practice a close proxy for, the merged
    token count). Pure column expression, one pass, no UDF."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0))).cast("bigint")


def quality_features(text: Column) -> Dict[str, Column]:
    """Deterministic quality signals: length, token stats, alpha/space/
    punct character ratios, stopword ratio."""
    n_chars = F.length(text).cast("bigint")
    tokens = F.split(F.trim(text), r"\s+")
    n_tokens = token_count(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    spaces = F.length(F.regexp_replace(text, r"[^ ]", ""))
    nonspace = (n_chars - spaces).cast("double")
    stop_hits = F.size(F.filter(tokens, lambda t: F.lower(t).isin(STOPWORDS["en"])))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(nonspace / F.greatest(n_tokens, F.lit(1)).cast("double"), 4),
        "alpha_ratio": F.round(alpha / F.greatest(n_chars, F.lit(1)).cast("double"), 4),
        "stopword_ratio": F.round(
            stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double"), 4),
    }


def quality_score(text: Column) -> Column:
    """Single [0,1] quality score combining the features: rewards
    reasonable token lengths, alphabetic content, and function-word
    presence; penalizes degenerate docs. Deterministic linear blend."""
    f_ = quality_features(text)
    len_ok = F.when((f_["n_tokens"] >= 5) & (f_["n_tokens"] <= 100000), 1.0).otherwise(0.0)
    tok_ok = F.when((f_["avg_token_len"] >= 2.0) & (f_["avg_token_len"] <= 12.0), 1.0).otherwise(0.0)
    return F.round(
        0.3 * len_ok + 0.3 * tok_ok + 0.2 * f_["alpha_ratio"]
        + 0.2 * F.least(f_["stopword_ratio"] * 5, F.lit(1.0)),
        4,
    )


def lang_scores(text: Column) -> Dict[str, Column]:
    """Per-language stopword hit counts over the token stream."""
    tokens = F.split(F.lower(F.trim(text)), r"\s+")

    def hit_test(words: List[str]):  # unary-lambda factory: a second
        # (even defaulted) lambda param would be read as the element index
        return lambda t: t.isin(words)

    return {
        lang: F.size(F.filter(tokens, hit_test(words)))
        for lang, words in STOPWORDS.items()
    }


def lang_id(text: Column, default: str = "en") -> Column:
    """Predicted language = argmax of stopword hits (ties and zero hits →
    ``default``). A real deployment swaps in larger n-gram tables; the
    operator shape — argmax over per-class scores, one pass — is the same."""
    scores = lang_scores(text)
    best = None
    best_score = None
    for lang, score in scores.items():
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, score).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit(default))


def fingerprint(text: Column) -> Column:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    strip non-alphanumerics, md5. Stable under formatting noise —
    the key for exact dedup across re-crawls."""
    norm = F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", "")
    norm = F.trim(F.regexp_replace(norm, r"\s+", " "))
    return F.md5(norm)
