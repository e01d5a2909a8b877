"""Text analysis: language-ID, quality scoring, token counting, fingerprints.

All pure native column expressions (JVM-side, whole-stage codegen): these
run once per document over the entire corpus, so even an Arrow UDF would be
a measurable tax at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "que", "dans"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"],
}

_STOPWORDS_EN = _LANG_PROFILES["en"] + ["this", "with", "as", "on", "be", "are"]

#: BPE-ish tokenizer: words, numbers, or single non-space symbols
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def tokens(text: Column) -> Column:
    """Whitespace tokens (empty-string-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_REGEX), 0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or _STOPWORDS_EN)])
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    total = F.size(toks)
    return F.when(total > 0, hits / total).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality: length band + low punct + stopword presence.

    The exact formula is arbitrary (as in any corpus pipeline); what matters
    is that it is deterministic and fully native.
    """
    n_tok = token_count(text)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 5000), F.lit(1.0)).otherwise(
        F.when(n_tok > 0, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    punct_ok = 1.0 - F.least(punct_ratio(text) * 4, F.lit(1.0))
    sw_ok = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    score = F.round(0.4 * length_ok + 0.3 * punct_ok + 0.3 * sw_ok, 4)
    return F.when(n_tok == 0, F.lit(0.0)).otherwise(score)


def lang_id(text: Column) -> Column:
    """Stopword-profile language ID: argmax of per-language hit counts.

    Returns 'und' when nothing matches.
    """
    toks = F.transform(tokens(text), lambda t: F.lower(t))
    scored = []
    for lang, words in _LANG_PROFILES.items():
        sw = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scored.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """64-bit rolling content fingerprint (normalized whitespace + case)."""
    normalized = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.xxhash64(normalized)


def analyze(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
